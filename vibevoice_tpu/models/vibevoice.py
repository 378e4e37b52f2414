"""Composite VibeVoice model: Qwen2 LM + σ-VAE tokenizers + connectors +
diffusion head (reference modeling_vibevoice.py:107-209).

Parameters live in one pytree:

  {"lm": qwen2 params, "lm_head": optional (V, H) when untied,
   "acoustic_tokenizer": ..., "semantic_tokenizer": ...,
   "acoustic_connector": ..., "semantic_connector": ...,
   "diffusion_head": ...,
   "speech_scaling_factor": scalar, "speech_bias_factor": scalar}

The scaling/bias scalars are the reference's NaN-initialised buffers computed
from the first training batch (reference modeling_vibevoice.py:130-132,
:307-323); checkpoints carry concrete values.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import VibeVoiceConfig
from ..ops.norms import rms_norm
from . import diffusion_head as dh
from . import qwen2
from . import tokenizer as tok

Params = Dict

CONNECTOR_NORM_EPS = 1e-6  # LlamaRMSNorm(eps=1e-6), reference modeling_vibevoice.py:62


def init_connector(key, in_dim: int, out_dim: int, dtype=jnp.float32, std: float = 0.02) -> Params:
    k1, k2 = jax.random.split(key)

    def lin(k, cin, cout):
        return {
            "w": (jax.random.normal(k, (cin, cout), jnp.float32) * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    return {"fc1": lin(k1, in_dim, out_dim), "norm": {"w": jnp.ones((out_dim,), dtype)}, "fc2": lin(k2, out_dim, out_dim)}


def connector_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """fc1 -> RMSNorm -> fc2 (reference modeling_vibevoice.py:58-69)."""
    h = jnp.dot(x, p["fc1"]["w"].astype(x.dtype)) + p["fc1"]["b"].astype(x.dtype)
    h = rms_norm(h, p["norm"]["w"], CONNECTOR_NORM_EPS)
    return jnp.dot(h, p["fc2"]["w"].astype(h.dtype)) + p["fc2"]["b"].astype(h.dtype)


def init(key, cfg: VibeVoiceConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 7)
    h = cfg.decoder_config.hidden_size
    params = {
        "lm": qwen2.init(ks[0], cfg.decoder_config, dtype),
        "acoustic_tokenizer": tok.init_acoustic_tokenizer(ks[1], cfg.acoustic_tokenizer_config, dtype),
        "semantic_tokenizer": tok.init_semantic_tokenizer(ks[2], cfg.semantic_tokenizer_config, dtype),
        "acoustic_connector": init_connector(ks[3], cfg.acoustic_vae_dim, h, dtype),
        "semantic_connector": init_connector(ks[4], cfg.semantic_vae_dim, h, dtype),
        "diffusion_head": dh.init(ks[5], cfg.diffusion_head_config, dtype),
        "speech_scaling_factor": jnp.asarray(1.0, jnp.float32),
        "speech_bias_factor": jnp.asarray(0.0, jnp.float32),
    }
    if not cfg.decoder_config.tie_word_embeddings:
        params["lm_head"] = (
            jax.random.normal(ks[6], (cfg.decoder_config.vocab_size, h), jnp.float32) * 0.02
        ).astype(dtype)
    return params


def lm_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    head_q = params["lm"].get("lm_head_q") or params.get("lm_head_q")
    if head_q is not None:
        from ..ops import quant

        if "w4" in head_q:  # experimental int4 probe (quantize_weight bits=4)
            return quant.int4_matmul(hidden, head_q["w4"], head_q["scale"])
        # _int8_matmul_dx, not raw int8_matmul: identical compiled forward,
        # but CE gradients can flow through a quantized lm_head into the
        # hidden states (the head/connector fine-tune over an int8 LM keeps
        # lm_head_q in the graph; the raw Pallas kernel has no autodiff rule)
        return quant._int8_matmul_dx(hidden, head_q["w8"], head_q["scale"])
    w = params.get("lm_head")
    if w is None:
        w = params["lm"]["embed"]
    return jnp.dot(hidden, w.T.astype(hidden.dtype))


def lm_logits_cand(params: Params, hidden: jnp.ndarray, cand) -> jnp.ndarray:
    """Logits for a STATIC candidate set only (the token-constraint set,
    reference VibeVoiceTokenConstraintProcessor): reads O(C) columns of the
    logits projection instead of the whole vocab row — the full 151936-column
    matmul is 233 MB int8 (466 MB bf16) of HBM traffic per frame at 1.5B and
    its result is discarded except at C≈4 candidate columns. Exact: int8
    scales are per-column, so slicing commutes with dequantization; the bf16
    path gathers the same weight rows the full matmul would reduce over.
    Full-vocab `lm_logits` is still required for top-p sampling (the nucleus
    is computed over the whole distribution)."""
    cand = jnp.asarray(cand, jnp.int32)
    head_q = params["lm"].get("lm_head_q") or params.get("lm_head_q")
    if head_q is not None:
        key = "w4" if "w4" in head_q else "w8"
        w = head_q[key][:, cand].astype(jnp.float32)  # (H, C) — C column tiles
        s = head_q["scale"][cand].astype(jnp.float32)
        return jnp.dot(hidden.astype(jnp.float32), w) * s
    w = params.get("lm_head")
    if w is None:
        w = params["lm"]["embed"]
    return jnp.dot(hidden, w[cand, :].T.astype(hidden.dtype))


def quantize_for_inference(
    params: Params,
    components: Tuple[str, ...] = ("lm", "lm_head"),
) -> Params:
    """Weight-only per-channel int8 for the serving path (see ops/quant.py).
    Decode is weight-bandwidth-bound, so halving weight bytes raises RTF.
    Defaults to the LM + logits projection (measured +14% RTF at bs1);
    "diffusion_head"/"tokenizers" are available but measured neutral — their
    matmuls are small enough that kernel overhead cancels the bandwidth win."""
    from ..ops import quant

    out = dict(params)
    if "lm" in components:
        out["lm"] = quant.quantize_lm(params["lm"], quantize_lm_head=False)
    if "lm_head" in components:
        head_w = params.get("lm_head")
        if head_w is None:
            head_w = params["lm"]["embed"]
        else:
            out.pop("lm_head", None)
        out["lm_head_q"] = quant.quantize_weight(head_w.T)
    if "diffusion_head" in components:
        out["diffusion_head"] = quant.quantize_diffusion_head(params["diffusion_head"])
    if "tokenizers" in components:
        out["acoustic_tokenizer"] = quant.quantize_tokenizer(params["acoustic_tokenizer"])
        if "semantic_tokenizer" in params:
            out["semantic_tokenizer"] = quant.quantize_tokenizer(params["semantic_tokenizer"])
    return out


def fuse_vocoder(params: Params, cfg: VibeVoiceConfig, quantize: bool = True) -> Params:
    """Serving-prep transform: pack the per-frame block stacks (acoustic
    decoder stage 0 + semantic encoder final stage) into the fused Pallas
    kernel format (ops/vocoder_fused.py) — together ~1.1 GB of weight reads
    per frame on the 1.5B config. quantize=True stores their FFN weights
    int8, halving the bytes. The acoustic ENCODER stays dense (it runs in
    batch mode during voice-clone prefill)."""
    out = dict(params)
    ac = dict(params["acoustic_tokenizer"])
    ac.update(tok.fuse_hot_stages({"decoder": ac["decoder"]}, cfg.acoustic_tokenizer_config, quantize))
    out["acoustic_tokenizer"] = ac
    if "semantic_tokenizer" in params:
        se = dict(params["semantic_tokenizer"])
        se.update(
            tok.fuse_hot_stages({"encoder": se["encoder"]}, cfg.semantic_tokenizer_config, quantize)
        )
        out["semantic_tokenizer"] = se
    return out


def fuse_for_serving(params: Params, cfg: VibeVoiceConfig, quantize: bool = True) -> Params:
    """All serving-prep packs: fused vocoder stages + fused diffusion-head
    FFN stack (pairs with the hoisted AdaLN path in models/inference.py) +
    packed int8 qkv/gateup LM projections (ops/quant.pack_lm_projections)."""
    out = fuse_vocoder(params, cfg, quantize)
    out["diffusion_head"] = dh.fuse_head(
        params["diffusion_head"], cfg.diffusion_head_config, quantize
    )
    import os

    if (
        quantize
        and os.environ.get("LM_PACK") == "1"  # measured NEUTRAL-to-NEGATIVE at bs1; off by default
        and out["lm"]["layers"]
        and "w8" in out["lm"]["layers"][0]["attn"].get("q", {})
    ):
        from ..ops.quant import pack_lm_projections

        out["lm"] = pack_lm_projections(out["lm"])
    return out


def splice_speech_features(
    embeds: jnp.ndarray,
    speech_input_mask: jnp.ndarray,
    features: jnp.ndarray,
    feature_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Overwrite embeddings at masked positions with speech features, in
    flat row-major order (the JAX equivalent of the reference's boolean-mask
    assignment ``inputs_embeds[speech_input_mask] = features[speech_masks]``,
    reference modeling_vibevoice_inference.py:221-224).

    embeds: (B, T, H); speech_input_mask: (B, T) bool;
    features: (N, F, H) connector outputs per voice clip;
    feature_valid: (N, F) bool frame validity.
    """
    b, t, h = embeds.shape
    feat_flat = features.reshape(-1, h)
    valid_flat = feature_valid.reshape(-1)
    m = feat_flat.shape[0]
    # rank of each valid feature row among valid rows
    rank = jnp.cumsum(valid_flat.astype(jnp.int32)) - 1
    rank = jnp.where(valid_flat, rank, m)  # invalid rows -> dropped by scatter
    table = jnp.zeros((m + 1, h), embeds.dtype).at[rank].set(feat_flat.astype(embeds.dtype), mode="drop")
    # rank of each masked embedding slot among masked slots
    mask_flat = speech_input_mask.reshape(-1)
    slot_rank = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    gathered = table[jnp.clip(slot_rank, 0, m - 1)]
    out = jnp.where(mask_flat[:, None], gathered, embeds.reshape(-1, h))
    return out.reshape(b, t, h)


def encode_voice_features(
    cfg: VibeVoiceConfig,
    params: Params,
    speech_tensors: jnp.ndarray,
    key: Optional[jax.Array] = None,
    speech_type: str = "audio",
    vae_noise: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Voice-clone path: acoustic encode -> σ-VAE sample -> scale -> connector
    (reference _process_speech_inputs, modeling_vibevoice_inference.py:149-176).

    speech_type="audio": speech_tensors are (N, T_wav) mono 24 kHz waveforms
    (right-padded). speech_type="pt": speech_tensors are precomputed VAE
    latent means (N, F, vae_dim) — the reference's `.pt` voice-preset path.
    vae_noise, if given, is an explicit (std_eps (N,), eps (N, F, vae_dim))
    pair used instead of drawing from `key` (fidelity-harness hook).
    Returns connector features (N, F, H).
    """
    acfg = cfg.acoustic_tokenizer_config
    # match model dtype (the reference casts speech_tensors.to(self.dtype),
    # modeling_vibevoice_inference.py:222)
    dtype = jax.tree_util.tree_leaves(params["acoustic_connector"])[0].dtype
    speech_tensors = speech_tensors.astype(dtype)
    if speech_type == "pt":
        mean = speech_tensors
    elif speech_type == "audio":
        mean, _ = tok.encode(acfg, params["acoustic_tokenizer"], speech_tensors[..., None])
    else:
        raise NotImplementedError(f"speech_type {speech_type}")
    if vae_noise is not None:
        latents = tok.sample_latents_from_noise(
            mean, acfg.fix_std, acfg.std_dist_type, vae_noise[0], vae_noise[1]
        )
    elif key is not None:
        latents = tok.sample_latents(key, mean, acfg.fix_std, acfg.std_dist_type)
    else:
        latents = mean
    scaled = (latents + params["speech_bias_factor"]) * params["speech_scaling_factor"]
    return connector_apply(params["acoustic_connector"], scaled.astype(mean.dtype))
