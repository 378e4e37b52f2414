"""Convert reference streaming voice presets (`.pt`) to native VoicePreset.

The reference `.pt` schema (reference demo/streaming_inference_from_file.py:288-291,
vibevoice_streaming_processor.py:233-240) is a dict with keys
'lm'/'tts_lm'/'neg_lm'/'neg_tts_lm', each holding 'last_hidden_state'
(B, S, H) and 'past_key_values' (HF cache: per-layer (k, v) of shape
(B, KH, S, D)).
"""

from __future__ import annotations

import numpy as np


def _stack_kv(past_key_values) -> tuple:
    """HF per-layer [(k, v)] with (B, KH, S, D) -> ((L,B,KH,S,D) k, v, len)."""
    ks, vs = [], []
    layers = getattr(past_key_values, "key_cache", None)
    if layers is not None:  # transformers DynamicCache
        for k, v in zip(past_key_values.key_cache, past_key_values.value_cache):
            ks.append(np.asarray(k.detach().float().cpu()))
            vs.append(np.asarray(v.detach().float().cpu()))
    else:
        for k, v in past_key_values:
            ks.append(np.asarray(k.detach().float().cpu()))
            vs.append(np.asarray(v.detach().float().cpu()))
    k = np.stack(ks)  # already (L, B, KH, S, D)
    v = np.stack(vs)
    length = np.full((k.shape[1],), k.shape[3], np.int32)
    return k.astype(np.float32), v.astype(np.float32), length


def convert_torch_preset(pt_path: str):
    """Load a reference .pt voice preset into a models.streaming.VoicePreset."""
    import torch

    from ..models.streaming import VoicePreset

    d = torch.load(pt_path, map_location="cpu", weights_only=False)

    def h(stream):
        return np.asarray(d[stream]["last_hidden_state"].detach().float().cpu())[:, -1]

    return VoicePreset(
        lm_kv=_stack_kv(d["lm"]["past_key_values"]),
        tts_kv=_stack_kv(d["tts_lm"]["past_key_values"]),
        neg_tts_kv=_stack_kv(d["neg_tts_lm"]["past_key_values"]),
        lm_h=h("lm"),
        tts_h=h("tts_lm"),
        neg_tts_h=h("neg_tts_lm"),
    )
