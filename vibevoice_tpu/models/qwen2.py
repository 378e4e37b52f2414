"""Qwen2 decoder LM, TPU-native.

Functional GQA transformer matching HF's Qwen2 math (the reference builds its
LM via ``AutoModel.from_config(Qwen2Config)``, reference
modeling_vibevoice.py:119-121): RMSNorm, full-head RoPE with rotate-half,
q/k/v biases, SwiGLU MLP.

KV-cache design (TPU-first, replaces HF's left-padded uniform-append cache +
the reference's per-sample cache "shift-delete" surgery, reference
modeling_vibevoice_inference.py:549-624):

* Sequences are RIGHT-padded; each sample carries its own valid length
  ``len[b]``.
* A decode chunk of W tokens is written at per-sample offsets ``len[b]``
  (vmapped dynamic_update_slice) and attends keys ``j <= len[b] + i``.
* "Logically deleting" a speculative token (the negative CFG stream's
  non-diffusion samples) is simply *not advancing* ``len[b]``; the next write
  overwrites the slot. Resetting a stream to its first token is ``len[b] = 1``.
  No data movement, identical attention semantics.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import functools

import jax
import jax.numpy as jnp

from ..configs import Qwen2Config
from ..ops.norms import rms_norm

Params = Dict

# Attention implementation: "auto" picks the Pallas flash kernel on TPU for
# cached attention (the flash-attn-2 analog, SURVEY.md §2.9), XLA elsewhere.
_ATTENTION_IMPL = "auto"


def set_attention_impl(impl: str) -> None:
    global _ATTENTION_IMPL
    assert impl in ("auto", "flash", "xla")
    _ATTENTION_IMPL = impl


def _flash_enabled() -> bool:
    if _ATTENTION_IMPL == "flash":
        return True
    if _ATTENTION_IMPL == "xla":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class KVCache(NamedTuple):
    """KV cache: per-layer tuples of (B, KH, S, D) buffers.

    Separate per-layer buffers (rather than one stacked (L, ...) array) let
    XLA alias each layer's update in place under donation — a stacked array
    sliced per layer around the Pallas kernel boundary forces whole-cache
    copies every step. Batch/head lead so the flash kernel's per-(b,h) DMA
    slices touch only the (S, D) tile plane (bf16 sublane tiling constrains
    the last two dims).

    int8 mode (``make_cache(quantized=True)``): k/v buffers are int8 with
    per-(token, kv-head) row scales stored in ``k_scale``/``v_scale`` as
    (B, KH, 1, S) float32 — the trailing-S layout lets the flash kernel DMA
    (1, block_k) scale rows alongside each K/V block. Halves KV HBM bytes
    (the decode-attention bandwidth term) and puts 7B @ 32K on one v5e."""

    k: tuple  # L x (B, KH, S, D)
    v: tuple  # L x (B, KH, S, D)
    length: jnp.ndarray  # (B,) int32 — valid prefix length per sample
    k_scale: Optional[tuple] = None  # L x (B, KH, 1, S) f32 (int8 mode)
    v_scale: Optional[tuple] = None

    @property
    def max_len(self) -> int:
        return self.k[0].shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def make_cache(
    cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16, *, quantized: bool = False
) -> KVCache:
    """Mosaic DMA slices need 128-lane alignment on the trailing dim, so
    models with head_dim < 128 (the 0.5B streaming LM's 64-dim heads) get
    their cache lanes zero-padded to 128 when the flash kernel is available;
    q/k/v chunks are padded on write and outputs sliced back (zero lanes
    contribute nothing to scores). Costs 2x cache bytes but keeps decode on
    the valid-prefix flash path instead of full-cache masked XLA attention."""
    d = cfg.head_dim
    if d % 128 != 0 and _flash_enabled():
        d = -(-d // 128) * 128
    shape = (batch, cfg.num_key_value_heads, max_len, d)
    nl = cfg.num_hidden_layers
    buf_dtype = jnp.int8 if quantized else dtype
    scale_shape = (batch, cfg.num_key_value_heads, 1, max_len)
    return KVCache(
        k=tuple(jnp.zeros(shape, buf_dtype) for _ in range(nl)),
        v=tuple(jnp.zeros(shape, buf_dtype) for _ in range(nl)),
        length=jnp.zeros((batch,), jnp.int32),
        k_scale=tuple(jnp.zeros(scale_shape, jnp.float32) for _ in range(nl)) if quantized else None,
        v_scale=tuple(jnp.zeros(scale_shape, jnp.float32) for _ in range(nl)) if quantized else None,
    )


def quantize_kv_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize (B, W, KH, D) to int8 with per-(b, w, kh) row scales.

    Returns (q int8 (B, W, KH, D), scale f32 (B, W, KH)) with
    ``q * scale ≈ x``; all-zero rows get scale 0 (dequantizes to zero)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    inv = jnp.where(amax > 0, 127.0 / jnp.maximum(amax, 1e-30), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, amax / 127.0


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key, cfg: Qwen2Config, dtype=jnp.float32) -> Params:
    h, i = cfg.hidden_size, cfg.intermediate_size
    kh = cfg.num_key_value_heads * cfg.head_dim
    std = cfg.initializer_range
    keys = jax.random.split(key, 2 + cfg.num_hidden_layers)

    def lin(k, cin, cout, bias=False):
        p = {"w": (jax.random.normal(k, (cin, cout), jnp.float32) * std).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    layers = []
    for li in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[2 + li], 7)
        layers.append(
            {
                "input_norm": {"w": jnp.ones((h,), dtype)},
                "attn": {
                    "q": lin(ks[0], h, h, bias=True),
                    "k": lin(ks[1], h, kh, bias=True),
                    "v": lin(ks[2], h, kh, bias=True),
                    "o": lin(ks[3], h, h),
                },
                "post_norm": {"w": jnp.ones((h,), dtype)},
                "mlp": {
                    "gate": lin(ks[4], h, i),
                    "up": lin(ks[5], h, i),
                    "down": lin(ks[6], i, h),
                },
            }
        )
    embed = (jax.random.normal(keys[0], (cfg.vocab_size, h), jnp.float32) * std).astype(dtype)
    return {"embed": embed, "layers": layers, "final_norm": {"w": jnp.ones((h,), dtype)}}


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions (B, T) -> cos/sin (B, T, D) in HF half-split layout."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, H, D); HF rotate-half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rot * sin[:, :, None, :]


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def _mm(x, p):
    if "w8" in p or "w4" in p or "lora" in p:
        from ..ops.quant import mm as qmm

        return qmm(x, p)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def project_qkv(ap, hdn, b, t, nh, kh, d):
    """q/k/v projections; a packed "qkv" entry (ops/quant.pack_lm_projections)
    runs ONE int8 matmul instead of three — per-column scales make the packed
    result bit-identical, and 2 fewer kernel launches per layer per step."""
    if "qkv" in ap:
        qkv = _mm(hdn, ap["qkv"])
        q, k, v = jnp.split(qkv, [nh * d, (nh + kh) * d], axis=-1)
    else:
        q, k, v = _mm(hdn, ap["q"]), _mm(hdn, ap["k"]), _mm(hdn, ap["v"])
    return q.reshape(b, t, nh, d), k.reshape(b, t, kh, d), v.reshape(b, t, kh, d)


def mlp_forward(m, hdn):
    """SwiGLU MLP; packed "gateup" fuses the two input projections."""
    if "gateup" in m:
        gu = _mm(hdn, m["gateup"])
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g, u = _mm(hdn, m["gate"]), _mm(hdn, m["up"])
    return _mm(jax.nn.silu(g) * u, m["down"])


def _attention_masked(q, k, v, mask):
    """q (B,T,NH,D), k/v (B,S,KH,D), mask (B,T,S) bool -> (B,T,NH,D).

    GQA by reshaping q into (KH, G) groups; f32 softmax.
    """
    b, t, nh, d = q.shape
    s, kh = k.shape[1], k.shape[2]
    g = nh // kh
    qg = q.reshape(b, t, kh, g, d)
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * (d**-0.5)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    scores = jnp.where(mask[:, None, None, :, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v)
    return out.reshape(b, t, nh, d)


def _train_flash_enabled(t: int) -> bool:
    """Measured on v5e (1.5B LoRA step, T=4096 B=2): XLA's fused masked
    attention is ~7% FASTER than the Pallas training kernel (the kernel pays
    GQA head replication and block overhead), so flash is off by default at
    short T. It becomes the MEMORY lever at long T — the masked path's
    per-layer (B,H,T,T) f32 score transient is ~3.2 GB/sample-pair at T=8192
    and stops fitting. TRAIN_FLASH=1 forces on, =0 forces off."""
    import os

    env = os.environ.get("TRAIN_FLASH")
    if env == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    return env == "1" or t >= 8192


def train_attention_inputs(cfg, valid_mask: jnp.ndarray):
    """Positions, (B,T,T) attention mask, and the flash-path `train_valid`
    for the NO-CACHE training forward of a right-padded batch. Shared by
    `forward` and the GPipe pipeline (parallel/pipeline.py) so the two
    stacks cannot silently diverge on mask/rope/flash-dispatch semantics.

    train_valid is non-None when the differentiable Pallas flash kernel
    applies (TPU backend gate in _train_flash_enabled, 128-lane heads,
    512-aligned T); the dense mask is DCE'd by XLA in that case."""
    t = valid_mask.shape[1]
    positions = jnp.cumsum(valid_mask.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)
    ji = jnp.arange(t)
    causal = ji[:, None] >= ji[None, :]  # (T, T): query i attends key j <= i
    mask = valid_mask[:, None, :] & causal[None]
    train_valid = None
    if _train_flash_enabled(t) and cfg.head_dim % 128 == 0 and t % 512 == 0:
        train_valid = valid_mask
    return positions, mask, train_valid


def _attention_train_flash(q, k, v, valid):
    """Training-path (no-cache) flash attention via the Pallas TPU kernel
    bundled with JAX (jax.experimental.pallas.ops.tpu.flash_attention) —
    differentiable (custom VJP), online-softmax fwd + bwd, so the (B,H,T,T)
    f32 score tensor of `_attention_masked` never materialises. The memory
    term that dominated multi-K-sequence fine-tuning (400 MB/layer transient
    at T=4096) and its recompute under remat both disappear.

    Semantics match `_attention_masked` for right-padded batches: causal=True
    plus segment ids (valid=1 / pad=0) — valid tokens are a contiguous
    prefix, so "attend causally within my segment" == valid & causal. Pad
    rows attend only pads (outputs unused; self-attention keeps softmax
    finite).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, t, nh, d = q.shape
    kh = k.shape[2]
    g = nh // kh
    if g > 1:  # GQA: the kernel wants matching head counts
        k = jnp.repeat(k, g, axis=2)
        v = jnp.repeat(v, g, axis=2)
    seg = valid.astype(jnp.int32)
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=True,
        sm_scale=d**-0.5,
    )
    return out.transpose(0, 2, 1, 3)


def _attention_cached(q, k, v, mask, scale=None):
    """q (B,T,NH,D), k/v (B,KH,S,D) cache layout, mask (B,T,S) bool.

    `scale` defaults to D**-0.5; pass the true head_dim's scale when q/k/v
    are lane-padded (see make_cache)."""
    b, t, nh, d = q.shape
    kh, s = k.shape[1], k.shape[2]
    g = nh // kh
    qg = q.reshape(b, t, kh, g, d)
    scores = jnp.einsum("btkgd,bksd->bkgts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * (scale if scale is not None else d**-0.5)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    scores = jnp.where(mask[:, None, None, :, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksd->btkgd", probs.astype(v.dtype), v)
    return out.reshape(b, t, nh, d)


def _write_cache(cache_layer: jnp.ndarray, new: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Write (B, W, KH, D) into (B, KH, S, D) at per-sample offsets (B,)."""
    new = new.transpose(0, 2, 1, 3)  # (B, KH, W, D)

    def one(buf, chunk, off):
        return jax.lax.dynamic_update_slice(buf, chunk, (0, off, 0))

    return jax.vmap(one)(cache_layer, new, offsets)


def _write_scale(scale_layer: jnp.ndarray, new: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Write (B, W, KH) row scales into (B, KH, 1, S) at per-sample offsets."""
    new = new.transpose(0, 2, 1)[:, :, None, :]  # (B, KH, 1, W)

    def one(buf, chunk, off):
        return jax.lax.dynamic_update_slice(buf, chunk, (0, 0, off))

    return jax.vmap(one)(scale_layer, new, offsets)


def _dequantize_kv(buf: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, KH, S, D) int8 + (B, KH, 1, S) f32 -> dequantized (B, KH, S, D)."""
    return (buf.astype(jnp.float32) * jnp.swapaxes(scale, 2, 3)).astype(dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer(cfg, lp, x, cos, sin, *, mask, cache_kv=None, offsets=None, flash=False,
           train_valid=None):
    """One transformer block. Returns (x, (k_new, v_new) cache layer or None)."""
    b, t, h = x.shape
    nh, kh, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    res = x
    hdn = rms_norm(x, lp["input_norm"]["w"], cfg.rms_norm_eps)
    q, k, v = project_qkv(lp["attn"], hdn, b, t, nh, kh, d)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_kv is not None:
        ck, cv, cks, cvs = cache_kv
        d_c = ck.shape[-1]
        if d_c != d:  # lane-padded cache (head_dim < 128; see make_cache)
            padw = ((0, 0), (0, 0), (0, 0), (0, d_c - d))
            q = jnp.pad(q, padw)
            k = jnp.pad(k, padw)
            v = jnp.pad(v, padw)
        if cks is not None:  # int8 cache: quantize the chunk row-wise
            kq, ks_new = quantize_kv_rows(k)
            vq, vs_new = quantize_kv_rows(v)
            ck = _write_cache(ck, kq, offsets)
            cv = _write_cache(cv, vq, offsets)
            cks = _write_scale(cks, ks_new, offsets)
            cvs = _write_scale(cvs, vs_new, offsets)
        else:
            ck = _write_cache(ck, k.astype(ck.dtype), offsets)
            cv = _write_cache(cv, v.astype(cv.dtype), offsets)
        if flash:
            from ..ops.flash_attention import flash_cached_attention

            attn = flash_cached_attention(
                q,
                ck if cks is not None else ck.astype(q.dtype),
                cv if cks is not None else cv.astype(q.dtype),
                offsets,
                k_scale=cks,
                v_scale=cvs,
                scale=d**-0.5,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            if cks is not None:
                k_full = _dequantize_kv(ck, cks, q.dtype)
                v_full = _dequantize_kv(cv, cvs, q.dtype)
            else:
                k_full, v_full = ck.astype(q.dtype), cv.astype(q.dtype)
            attn = _attention_cached(q, k_full, v_full, mask, scale=d**-0.5)
        if d_c != d:
            attn = attn[..., :d]
        new_cache = (ck, cv, cks, cvs)
    else:
        if train_valid is not None:
            attn = _attention_train_flash(q, k, v, train_valid)
        else:
            attn = _attention_masked(q, k, v, mask)
        new_cache = None

    x = res + _mm(attn.reshape(b, t, h), lp["attn"]["o"])

    res = x
    hdn = rms_norm(x, lp["post_norm"]["w"], cfg.rms_norm_eps)
    hdn = mlp_forward(lp["mlp"], hdn)
    return res + hdn, new_cache


def forward(
    cfg: Qwen2Config,
    params: Params,
    embeds: jnp.ndarray,
    *,
    valid_mask: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    advance: Optional[jnp.ndarray] = None,
    layer_range: Optional[Tuple[int, int]] = None,
    skip_final_norm: bool = False,
    remat: bool = False,
    remat_policy=None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the LM over a chunk of embeddings.

    Args:
      embeds: (B, T, H) input embeddings (chunk = full prompt for prefill or a
        decode window).
      valid_mask: (B, T) bool marking real (non-pad) tokens; default all-True.
      cache: KVCache; when given, the chunk is appended at ``cache.length``
        and attention spans the whole cache. When None, plain causal
        self-attention over the chunk (training path).
      advance: (B,) int32 — how much to advance each sample's cache length
        (defaults to the per-sample count of valid tokens). Pass zeros to
        evaluate speculatively without committing (negative-stream trick).
      layer_range: (start, stop) slice of layers (the streaming model's split
        stacks, reference modeling_vibevoice_streaming.py:134-143).
      skip_final_norm: omit the final RMSNorm (lower split of the streaming LM).
      remat: rematerialise each layer in backward (training path only — i.e.
        cache must be None). Trades one extra forward for O(layers) activation
        memory: only the residual stream survives between layers, which is
        what lets a 1.5B fine-tune step at multi-K sequence lengths fit a
        single 16 GB chip.
      remat_policy: jax.checkpoint saveable-policy for the remat blocks
        (e.g. checkpoint_policies.dots_with_no_batch_dims_saveable — keep
        matmul outputs, recompute only elementwise; faster backward, more
        memory). None = save nothing.

    Returns (hidden (B, T, H), new_cache).
    """
    b, t, h = embeds.shape
    if valid_mask is None:
        valid_mask = jnp.ones((b, t), bool)

    flash = False
    if cache is not None:
        base = cache.length  # (B,)
        q_abs = base[:, None] + jnp.cumsum(valid_mask.astype(jnp.int32), axis=1) - 1
        q_abs = jnp.where(valid_mask, q_abs, base[:, None])  # pads: harmless position
        positions = q_abs
        s = cache.max_len
        offsets = base
        # Flash needs 128-lane heads and a 512-aligned cache. Models with
        # head_dim < 128 qualify via lane-padded caches (make_cache); keying
        # on the CACHE's actual lane dim keeps mixed backends consistent.
        flash = _flash_enabled() and cache.k[0].shape[-1] % 128 == 0 and s % 512 == 0
        if flash:
            # the kernel applies the (right-padding) causal rule itself; no
            # materialised mask needed — key at 64K context
            mask = None
        else:
            j = jnp.arange(s)
            # keys: committed prefix OR this chunk's valid tokens at their
            # slots (chunk token i occupies slot base + i; pads masked)
            prefix_valid = j[None, :] < base[:, None]  # (B, S)
            chunk_valid = jax.vmap(
                lambda vm, off: jax.lax.dynamic_update_slice(jnp.zeros((s,), bool), vm, (off,))
            )(valid_mask, base)
            key_valid = prefix_valid | chunk_valid  # (B, S)
            causal = j[None, None, :] <= q_abs[:, :, None]  # (B, T, S)
            mask = key_valid[:, None, :] & causal
    else:
        positions, mask, train_valid = train_attention_inputs(cfg, valid_mask)
        offsets = None
    if cache is not None:
        train_valid = None

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, embeds.dtype)

    lo, hi = layer_range if layer_range is not None else (0, cfg.num_hidden_layers)
    x = embeds
    new_k, new_v, new_ks, new_vs = None, None, None, None
    if cache is not None:
        new_k = list(cache.k)
        new_v = list(cache.v)
        quant = cache.k_scale is not None
        new_ks = list(cache.k_scale) if quant else [None] * len(new_k)
        new_vs = list(cache.v_scale) if quant else [None] * len(new_v)
    if remat:
        if cache is not None:
            raise ValueError("remat is a training-path option (cache must be None)")

        @functools.partial(jax.checkpoint, policy=remat_policy)
        def _ckpt_layer(lp, x, cos, sin, mask, train_valid):
            return _layer(cfg, lp, x, cos, sin, mask=mask, cache_kv=None, offsets=None,
                          flash=False, train_valid=train_valid)[0]

    for li in range(lo, hi):
        # note: layer_range uses LOCAL layer params (split streaming stacks
        # pass their own param trees), so cache index == li - lo when the
        # cache belongs to the sub-stack; full-model callers use lo=0.
        ci = li - lo
        if remat:
            x = _ckpt_layer(params["layers"][li], x, cos, sin, mask, train_valid)
            continue
        cache_kv = (new_k[ci], new_v[ci], new_ks[ci], new_vs[ci]) if cache is not None else None
        x, updated = _layer(
            cfg, params["layers"][li], x, cos, sin, mask=mask, cache_kv=cache_kv,
            offsets=offsets, flash=flash, train_valid=train_valid,
        )
        if cache is not None:
            new_k[ci], new_v[ci], new_ks[ci], new_vs[ci] = updated

    if not skip_final_norm:
        x = rms_norm(x, params["final_norm"]["w"], cfg.rms_norm_eps)

    if cache is not None:
        if advance is None:
            advance = jnp.sum(valid_mask.astype(jnp.int32), axis=1)
        return x, KVCache(
            k=tuple(new_k),
            v=tuple(new_v),
            length=cache.length + advance,
            k_scale=tuple(new_ks) if quant else None,
            v_scale=tuple(new_vs) if quant else None,
        )
    return x, None


def embed_tokens(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][ids]


def lm_head_logits(params: Params, hidden: jnp.ndarray, lm_head: Optional[jnp.ndarray] = None):
    """Logits; with tied embeddings lm_head is the embedding matrix
    (reference modeling_vibevoice_inference.py:119-128)."""
    w = params["embed"] if lm_head is None else lm_head
    return jnp.dot(hidden, w.T.astype(hidden.dtype))
