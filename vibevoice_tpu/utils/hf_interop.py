"""HF-ecosystem checkpoint interop: sharded safetensors / torch .bin ->
parameter pytrees, plus native save/load.

The reference distributes checkpoints via `save_pretrained` sharded
safetensors with `config.json` (SURVEY.md §5 checkpoint/resume). State-dict
prefixes follow VibeVoiceForConditionalGenerationInference
(reference modeling_vibevoice_inference.py:68-85) and
VibeVoiceStreamingForConditionalGenerationInference
(reference modeling_vibevoice_streaming_inference.py:93-117).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import VibeVoiceConfig, VibeVoiceStreamingConfig
from . import torch_convert as tc


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all weight files in a checkpoint dir into one flat numpy dict."""
    sd: Dict[str, np.ndarray] = {}
    files = sorted(os.listdir(path))
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        # HF sharded layout: the index's weight_map names the shard files
        with open(index) as f:
            st_files = sorted(set(json.load(f)["weight_map"].values()))
    else:
        st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [f for f in files if f.endswith(".bin") and "pytorch_model" in f]
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            try:
                sd.update(load_file(os.path.join(path, f)))
            except Exception:
                # bf16 tensors may not map to numpy directly; go through torch
                from safetensors.torch import load_file as tload

                sd.update({k: v.float().numpy() for k, v in tload(os.path.join(path, f)).items()})
    elif bin_files:
        import torch

        for f in bin_files:
            chunk = torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in chunk.items()})
    else:
        raise FileNotFoundError(f"no safetensors/bin weights found in {path}")
    return sd


def _to_dtype(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def convert_full_model(sd: Dict, cfg: VibeVoiceConfig) -> Dict:
    """State dict of VibeVoice(ForConditionalGeneration[Inference]) -> pytree."""
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    p = {
        "lm": tc.convert_qwen2(sd, cfg.decoder_config, prefix + "language_model"),
        "acoustic_tokenizer": tc.convert_acoustic_tokenizer(
            sd, cfg.acoustic_tokenizer_config, prefix + "acoustic_tokenizer"
        ),
        "semantic_tokenizer": tc.convert_semantic_tokenizer(
            sd, cfg.semantic_tokenizer_config, prefix + "semantic_tokenizer"
        ),
        "acoustic_connector": tc.convert_speech_connector(sd, prefix + "acoustic_connector"),
        "semantic_connector": tc.convert_speech_connector(sd, prefix + "semantic_connector"),
        "diffusion_head": tc.convert_diffusion_head(
            sd, cfg.diffusion_head_config, prefix + "prediction_head"
        ),
        "speech_scaling_factor": jnp.asarray(
            sd.get(prefix + "speech_scaling_factor", np.float32(1.0))
        ).reshape(()),
        "speech_bias_factor": jnp.asarray(
            sd.get(prefix + "speech_bias_factor", np.float32(0.0))
        ).reshape(()),
    }
    if not cfg.decoder_config.tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = jnp.asarray(np.asarray(sd["lm_head.weight"]))
    return p


def convert_streaming_model(sd: Dict, cfg: VibeVoiceStreamingConfig) -> Dict:
    import dataclasses

    prefix = "model." if any(k.startswith("model.language_model") for k in sd) else ""
    lower_cfg = dataclasses.replace(cfg.decoder_config, num_hidden_layers=cfg.lm_num_hidden_layers)
    upper_cfg = dataclasses.replace(
        cfg.decoder_config, num_hidden_layers=cfg.tts_backbone_num_hidden_layers
    )
    lower = tc.convert_qwen2_headless(sd, lower_cfg, prefix + "language_model")
    upper = tc.convert_qwen2_headless(sd, upper_cfg, prefix + "tts_language_model")
    return {
        "language_model": lower,
        "tts_language_model": upper,
        "tts_input_types": tc.vec(sd[prefix + "tts_input_types.weight"]),
        "tts_eos_classifier": {
            "fc1": tc._linear_params(sd, "tts_eos_classifier.fc1"),
            "fc2": tc._linear_params(sd, "tts_eos_classifier.fc2"),
        },
        "acoustic_tokenizer": tc.convert_acoustic_tokenizer(
            sd, cfg.acoustic_tokenizer_config, prefix + "acoustic_tokenizer"
        ),
        "acoustic_connector": tc.convert_speech_connector(sd, prefix + "acoustic_connector"),
        "diffusion_head": tc.convert_diffusion_head(
            sd, cfg.diffusion_head_config, prefix + "prediction_head"
        ),
        "speech_scaling_factor": jnp.asarray(
            sd.get(prefix + "speech_scaling_factor", np.float32(1.0))
        ).reshape(()),
        "speech_bias_factor": jnp.asarray(
            sd.get(prefix + "speech_bias_factor", np.float32(0.0))
        ).reshape(()),
    }


def load_checkpoint(
    path: str,
    dtype: str = "bfloat16",
    int8: bool = False,
    allow_fallback_tokenizer: bool = False,
) -> Tuple[VibeVoiceConfig, Dict, object]:
    """Load (config, params, processor) from an HF-style checkpoint dir.

    int8=True quantizes the LM + logits projection while the weights are
    still on the HOST, then ships only the int8 copies to the accelerator —
    required for 7B on a 16 GB chip, where the bf16 LM (~14 GB) cannot
    coexist with its quantized copy."""
    from ..processor.processor import VibeVoiceProcessor

    cfg = VibeVoiceConfig.from_json_file(os.path.join(path, "config.json"))
    sd = _load_state_dict(path)

    if int8:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            params = convert_full_model(sd, cfg)
            params = _to_dtype(params, jnp.dtype(dtype))
            from ..models.vibevoice import quantize_for_inference

            params = quantize_for_inference(params)
        params = jax.device_put(params)
    else:
        params = convert_full_model(sd, cfg)
        params = _to_dtype(params, jnp.dtype(dtype))
    processor = VibeVoiceProcessor.from_pretrained(
        path, allow_fallback_tokenizer=allow_fallback_tokenizer
    )
    return cfg, params, processor


def load_streaming_checkpoint(
    path: str, dtype: str = "bfloat16", allow_fallback_tokenizer: bool = False
):
    from ..processor.streaming_processor import VibeVoiceStreamingProcessor

    cfg = VibeVoiceStreamingConfig.from_json_file(os.path.join(path, "config.json"))
    sd = _load_state_dict(path)
    params = convert_streaming_model(sd, cfg)
    params = _to_dtype(params, jnp.dtype(dtype))
    processor = VibeVoiceStreamingProcessor.from_pretrained(
        path, allow_fallback_tokenizer=allow_fallback_tokenizer
    )
    return cfg, params, processor


# ---------------------------------------------------------------------------
# Native checkpointing (orbax-free pickle of numpy pytrees + config JSON)
# ---------------------------------------------------------------------------


def save_native(path: str, cfg, params: Dict) -> None:
    os.makedirs(path, exist_ok=True)
    import dataclasses

    blob = dataclasses.asdict(cfg)
    # model_type routes load_pretrained (the reference's HF Auto-class
    # registration analog, configuration_vibevoice.py:14-165)
    blob["model_type"] = (
        "vibevoice_streaming" if isinstance(cfg, VibeVoiceStreamingConfig) else "vibevoice"
    )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(blob, f, indent=2, default=str)
    host = jax.tree.map(lambda x: np.asarray(x), params)
    with open(os.path.join(path, "params.pkl"), "wb") as f:
        pickle.dump(host, f)


def load_native(path: str, streaming: Optional[bool] = None):
    if streaming is None:
        streaming = read_model_type(path) == "vibevoice_streaming"
    cls = VibeVoiceStreamingConfig if streaming else VibeVoiceConfig
    cfg = cls.from_json_file(os.path.join(path, "config.json"))
    with open(os.path.join(path, "params.pkl"), "rb") as f:
        params = pickle.load(f)
    return cfg, jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Single entry point: route by config.json model_type (the reference
# registers every model with HF Auto classes so one from_pretrained call
# loads any variant — configuration_vibevoice.py:14-165,
# modeling_vibevoice.py:486-487; this is the native analog)
# ---------------------------------------------------------------------------


class LoadedModel(NamedTuple):
    config: object
    params: Dict
    processor: object
    model_type: str  # "vibevoice" | "vibevoice_streaming"

    # tuple-unpacking compatibility with load_checkpoint's 3-tuple
    def __iter__(self):  # pragma: no cover - trivial
        return iter((self.config, self.params, self.processor))


def read_model_type(path: str) -> str:
    """model_type from config.json, with a structural fallback for configs
    written before the field existed (streaming configs carry
    tts_backbone_num_hidden_layers; full configs carry a semantic tokenizer)."""
    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    mt = d.get("model_type")
    if mt in ("vibevoice", "vibevoice_streaming"):
        return mt
    if mt is not None and str(mt).startswith("vibevoice_streaming"):
        return "vibevoice_streaming"
    if "tts_backbone_num_hidden_layers" in d:
        return "vibevoice_streaming"
    return "vibevoice"


def load_pretrained(
    path: str,
    dtype: str = "bfloat16",
    int8: bool = False,
    allow_fallback_tokenizer: bool = False,
) -> LoadedModel:
    """Load ANY checkpoint dir — multi-speaker or streaming, HF-style sharded
    safetensors or native params.pkl — routed by config.json's model_type.

    Unpacks like the 3-tuple loaders: ``cfg, params, proc = load_pretrained(p)``
    (plus ``.model_type`` when the caller needs to route engines)."""
    model_type = read_model_type(path)
    is_native = os.path.exists(os.path.join(path, "params.pkl"))

    if model_type == "vibevoice_streaming":
        if int8:
            raise NotImplementedError(
                "int8 host-side loading is wired for the multi-speaker model; "
                "the streaming 0.5B fits comfortably in bf16"
            )
        if is_native:
            from ..processor.streaming_processor import VibeVoiceStreamingProcessor

            cfg, params = load_native(path, streaming=True)
            params = _to_dtype(params, jnp.dtype(dtype))
            proc = VibeVoiceStreamingProcessor.from_pretrained(
                path, allow_fallback_tokenizer=allow_fallback_tokenizer
            )
        else:
            cfg, params, proc = load_streaming_checkpoint(
                path, dtype=dtype, allow_fallback_tokenizer=allow_fallback_tokenizer
            )
        return LoadedModel(cfg, params, proc, "vibevoice_streaming")

    if is_native:
        from ..processor.processor import VibeVoiceProcessor

        cfg, params = load_native(path, streaming=False)
        params = _to_dtype(params, jnp.dtype(dtype))
        if int8:
            from ..models.vibevoice import quantize_for_inference

            params = quantize_for_inference(params)
        proc = VibeVoiceProcessor.from_pretrained(
            path, allow_fallback_tokenizer=allow_fallback_tokenizer
        )
    else:
        cfg, params, proc = load_checkpoint(
            path, dtype=dtype, int8=int8, allow_fallback_tokenizer=allow_fallback_tokenizer
        )
    return LoadedModel(cfg, params, proc, "vibevoice")
