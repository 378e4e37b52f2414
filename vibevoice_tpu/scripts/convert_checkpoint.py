"""Checkpoint conversion CLI.

Covers both reference conversion tools:
  * HF/`transformers` sharded safetensors -> native pytree checkpoint
    (the framework's load path, usable offline afterwards)
  * nnscaler-trained checkpoints: strips the `model.model.` double prefix the
    MSR parallel runtime writes (reference
    scripts/convert_nnscaler_checkpoint_to_transformers.py:53-56) before
    conversion.

Usage:
  python -m vibevoice_tpu.scripts.convert_checkpoint --input <dir> \
      --output <dir> [--streaming] [--nnscaler]
"""

from __future__ import annotations

import argparse
import json
import os


def strip_nnscaler_prefixes(sd):
    """model.model.xxx -> model.xxx (reference :53-56); also drops optimizer
    entries nnscaler checkpoints may carry."""
    out = {}
    for k, v in sd.items():
        if k.startswith("model.model."):
            k = k[len("model.") :]
        if k.startswith("optimizer") or k.endswith(".step"):
            continue
        out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--streaming", action="store_true", help="streaming 0.5B model")
    ap.add_argument("--nnscaler", action="store_true", help="input is an nnscaler checkpoint")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    from ..configs import VibeVoiceConfig, VibeVoiceStreamingConfig
    from ..utils import hf_interop as hf

    cfg_cls = VibeVoiceStreamingConfig if args.streaming else VibeVoiceConfig
    cfg = cfg_cls.from_json_file(os.path.join(args.input, "config.json"))
    sd = hf._load_state_dict(args.input)
    if args.nnscaler:
        sd = strip_nnscaler_prefixes(sd)
    if args.streaming:
        params = hf.convert_streaming_model(sd, cfg)
    else:
        params = hf.convert_full_model(sd, cfg)
    import jax.numpy as jnp

    params = hf._to_dtype(params, jnp.dtype(args.dtype))
    hf.save_native(args.output, cfg, params)
    # carry the processor config along (reference writes preprocessor_config,
    # :92-124)
    src_pp = os.path.join(args.input, "preprocessor_config.json")
    if os.path.exists(src_pp):
        with open(src_pp) as f, open(
            os.path.join(args.output, "preprocessor_config.json"), "w"
        ) as g:
            g.write(f.read())
    else:
        with open(os.path.join(args.output, "preprocessor_config.json"), "w") as g:
            json.dump({"speech_tok_compress_ratio": 3200, "db_normalize": True}, g, indent=2)
    print(f"Converted {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
