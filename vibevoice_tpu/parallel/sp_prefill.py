"""Sequence-parallel (ring-attention) prefill for long prompts.

Runs the Qwen2 prefill with activations sharded over the sequence dimension
of a mesh axis: each of N chips embeds/normalizes/projects its T/N token
shard and attention runs as a ppermute ring (parallel/ring_attention.py), so
a 64K-prompt prefill costs 1/N of the per-chip attention FLOPs and 1/N of the
activation memory. The reference has no context parallelism at all
(SURVEY.md §2.10); this is the TPU-native capability upgrade for BASELINE
config 3 (64K long-form) prompts.

Output is a decode-ready ``DecodeCarry``: the per-shard K/V blocks are
written into a standard right-padded KV cache (optionally int8-quantized —
qwen2.make_cache semantics), the negative CFG stream and conv states are
initialized exactly as models/inference.prefill_fn does, and single-stream
decode proceeds unchanged (TP or single-chip).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..configs import Qwen2Config, VibeVoiceConfig
from ..models import qwen2
from ..ops.norms import rms_norm
from .ring_attention import _shard_map, ring_attention_local


def _local_layer(cfg: Qwen2Config, lp, x, cos, sin, q_pos, k_valid, *, axis, n, q_chunk):
    b, t, h = x.shape
    nh, kh, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    res = x
    hdn = rms_norm(x, lp["input_norm"]["w"], cfg.rms_norm_eps)
    q, k, v = qwen2.project_qkv(lp["attn"], hdn, b, t, nh, kh, d)
    q = qwen2.apply_rope(q, cos, sin)
    k = qwen2.apply_rope(k, cos, sin)
    attn = ring_attention_local(
        q, k, v, q_pos, q_pos, k_valid,
        axis_name=axis, n_shards=n, scale=d**-0.5, q_chunk=q_chunk,
    )
    x = res + qwen2._mm(attn.reshape(b, t, h), lp["attn"]["o"])
    res = x
    hdn = rms_norm(x, lp["post_norm"]["w"], cfg.rms_norm_eps)
    x = res + qwen2.mlp_forward(lp["mlp"], hdn)
    return x, k, v


def _local_forward(lm_params, x, q_pos, k_valid, *, cfg: Qwen2Config, axis, n, q_chunk):
    """Inside shard_map: x (B, Tl, H) shard -> (hidden, k-list, v-list)."""
    cos, sin = qwen2.rope_cos_sin(q_pos, cfg.head_dim, cfg.rope_theta, x.dtype)
    ks, vs = [], []
    for lp in lm_params["layers"]:
        x, k, v = _local_layer(
            cfg, lp, x, cos, sin, q_pos, k_valid, axis=axis, n=n, q_chunk=q_chunk
        )
        ks.append(k)
        vs.append(v)
    x = rms_norm(x, lm_params["final_norm"]["w"], cfg.rms_norm_eps)
    return x, tuple(ks), tuple(vs)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _sp_forward(cfg: Qwen2Config, lm_params, embeds, valid, mesh: Mesh, axis: str, q_chunk: int):
    """Sequence-sharded LM prefill forward.

    embeds (B, T, H) with T divisible by mesh.shape[axis]; right-padded.
    Returns (hidden (B, T, H), k/v tuples of (B, T, KH, D))."""
    b, t, _ = embeds.shape
    n = mesh.shape[axis]
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    fn = functools.partial(_local_forward, cfg=cfg, axis=axis, n=n, q_chunk=q_chunk)
    seq3 = P(None, axis, None)
    seq4 = P(None, axis, None, None)
    seq = P(None, axis)
    nl = cfg.num_hidden_layers
    return _shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), seq3, seq, seq),
        out_specs=(seq3, (seq4,) * nl, (seq4,) * nl),
        check_vma=False,
    )(lm_params, embeds, pos, valid)


def ring_prefill_carry(
    cfg: VibeVoiceConfig,
    params,
    ids: jnp.ndarray,  # (B, T) right-padded
    valid_mask: jnp.ndarray,  # (B, T) bool
    max_len: int,
    tokens,
    mesh: Mesh,
    *,
    axis: str = "tp",
    q_chunk: int = 512,
    speech_args=None,
    speech_type: str = "audio",
    kv_int8: bool = False,
):
    """Sequence-parallel analog of models/inference.prefill_fn: returns a
    DecodeCarry ready for the fused decode step."""
    from ..models import inference as inf
    from ..models import tokenizer as tok
    from ..models import vibevoice as vv

    lm_cfg = cfg.decoder_config
    b, t = ids.shape
    n = mesh.shape[axis]
    dtype = params["lm"]["embed"].dtype

    embeds = qwen2.embed_tokens(params["lm"], ids)
    if speech_args is not None:
        speech_tensors, speech_frame_valid, speech_input_mask, vae_key, vae_noise = speech_args
        feats = vv.encode_voice_features(
            cfg, params, speech_tensors, vae_key, speech_type, vae_noise
        )
        embeds = vv.splice_speech_features(embeds, speech_input_mask, feats, speech_frame_valid)

    pad_t = -(-t // n) * n
    # q_chunk must divide the local shard
    while (pad_t // n) % min(q_chunk, pad_t // n) != 0:
        pad_t += n
    valid = jnp.asarray(valid_mask)
    if pad_t != t:
        embeds = jnp.pad(embeds, ((0, 0), (0, pad_t - t), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_t - t)))
    q_chunk = min(q_chunk, pad_t // n)

    hidden, ks, vs = _sp_forward(lm_cfg, params["lm"], embeds, valid, mesh, axis, q_chunk)

    lengths = jnp.sum(valid.astype(jnp.int32), axis=1)
    last = jnp.maximum(lengths - 1, 0)
    h_pos = hidden[jnp.arange(b), last]

    # ---- build the positive-stream cache from the gathered K/V shards ----
    pos_cache = qwen2.make_cache(lm_cfg, b, max_len, dtype, quantized=kv_int8)
    d_c = pos_cache.k[0].shape[-1]
    new_k, new_v = list(pos_cache.k), list(pos_cache.v)
    new_ks = list(pos_cache.k_scale) if kv_int8 else None
    new_vs = list(pos_cache.v_scale) if kv_int8 else None
    for li in range(lm_cfg.num_hidden_layers):
        k, v = ks[li], vs[li]  # (B, T, KH, D)
        if d_c != k.shape[-1]:  # lane-padded cache (head_dim < 128)
            padw = ((0, 0), (0, 0), (0, 0), (0, d_c - k.shape[-1]))
            k, v = jnp.pad(k, padw), jnp.pad(v, padw)
        if kv_int8:
            kq, ksc = qwen2.quantize_kv_rows(k)
            vq, vsc = qwen2.quantize_kv_rows(v)
            new_k[li] = new_k[li].at[:, :, :pad_t].set(kq.transpose(0, 2, 1, 3))
            new_v[li] = new_v[li].at[:, :, :pad_t].set(vq.transpose(0, 2, 1, 3))
            new_ks[li] = new_ks[li].at[:, :, :, :pad_t].set(ksc.transpose(0, 2, 1)[:, :, None, :])
            new_vs[li] = new_vs[li].at[:, :, :, :pad_t].set(vsc.transpose(0, 2, 1)[:, :, None, :])
        else:
            new_k[li] = new_k[li].at[:, :, :pad_t].set(k.transpose(0, 2, 1, 3).astype(dtype))
            new_v[li] = new_v[li].at[:, :, :pad_t].set(v.transpose(0, 2, 1, 3).astype(dtype))
    pos_cache = qwen2.KVCache(
        k=tuple(new_k),
        v=tuple(new_v),
        length=lengths,
        k_scale=tuple(new_ks) if kv_int8 else None,
        v_scale=tuple(new_vs) if kv_int8 else None,
    )

    # ---- negative stream + conv states (same as prefill_fn) --------------
    neg_ids = jnp.full((b, 1), tokens.speech_start, jnp.int32)
    neg_embeds = qwen2.embed_tokens(params["lm"], neg_ids)
    neg_cache = qwen2.make_cache(lm_cfg, b, max_len, dtype, quantized=kv_int8)
    h_neg, neg_cache = qwen2.forward(lm_cfg, params["lm"], neg_embeds, cache=neg_cache)

    return inf.DecodeCarry(
        cache=inf._combine_caches(pos_cache, neg_cache),
        dec_state=tok.init_decoder_state(cfg.acoustic_tokenizer_config, b, dtype),
        sem_state=tok.init_encoder_state(cfg.semantic_tokenizer_config, b, dtype),
        h_pos=h_pos,
        h_neg=h_neg[:, 0],
        finished=jnp.zeros((b,), bool),
        n_diff=jnp.zeros((b,), jnp.int32),
    )
