"""Fused Pallas kernel for the diffusion head's AdaLN-FFN stack.

After the AdaLN hoist (models/diffusion_head.precompute_mods) the per-solver-
step head work is: noisy_proj -> L x [rmsnorm -> modulate -> SwiGLU FFN ->
gated residual] -> final layer. The FFN weights (gate/up 1536x4608 + down
4608x1536 per layer, 4 layers on 1.5B) are ~170 MB bf16 and are re-read every
one of the K solver steps — ~1.7 GB per frame at K=10, the single largest
remaining bs1 decode term.

This kernel runs the whole L-layer stack per denoise call in one pallas_call
(same grid-pipelined pattern as ops/vocoder_fused.py):

  grid (layer, ffn-chunk); x carried in the output block across layers
  c==0: h = rmsnorm(x) * w; hmod = h * (1 + scale) + shift   (mods hoisted)
  each chunk: g = silu(hmod @ Wg_c) * (hmod @ Wu_c); acc += g @ Wd_c
  c==NC-1: x += gate * acc

With quantize=True the FFN weights are int8 (per-output-column scales),
halving the stream. The modulations arrive per layer as (R, 3H) blocks.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vocoder_fused import PackedStage

CHUNK_F = 1536


def _pick_chunk_f(dim: int, hid: int, itemsize: int) -> int:
    """FFN chunk size bounded by VMEM: each grid step holds wg+wu (dim, cf)
    and wd (cf, dim) blocks, double-buffered by the pipeline, against the
    ~16 MB scoped-VMEM limit. 1536 fits the 1.5B head (dim 1536); the 7B
    head (dim 3584, hid 10752) needs smaller chunks or Mosaic refuses to
    compile (scoped vmem OOM)."""
    import os

    forced = int(os.environ.get("HEAD_CHUNK_F", "0"))
    if forced:
        return forced
    budget = 8 * 1024 * 1024  # single-buffer bytes for the 3 weight blocks
    if dim > 2048:
        # Mosaic's scoped-VMEM accounting at large dims also charges the
        # in-kernel dequant copies: dim 3584 measured 16.09M at cf 512
        # (over the 16M limit); 384 fits
        budget = 5 * 1024 * 1024
    for cf in (CHUNK_F, 1024, 768, 512, 384, 256, 128, hid):
        if cf <= hid and hid % cf == 0 and 3 * dim * cf * itemsize <= budget:
            return cf
    cf = hid  # tiny models: shrink by halving until it fits
    while 3 * dim * cf * itemsize > budget and cf % 2 == 0:
        cf //= 2
    return cf


def pack_head_ffns(layers: List[Dict], eps: float, quantize: bool = False) -> PackedStage:
    """Stack the head layers' norm + FFN params into kernel-ready arrays
    (adaln weights stay OUTSIDE — they are consumed by the hoisted
    precompute_mods path, read once per frame)."""
    nb = len(layers)
    dim = layers[0]["norm"]["w"].shape[0]
    hid = layers[0]["ffn"]["gate"]["w"].shape[1]

    arrays = {
        "norm_w": jnp.stack([l["norm"]["w"] for l in layers]),  # (L, H)
    }
    wg = jnp.stack([l["ffn"]["gate"]["w"] for l in layers])  # (L, H, F)
    wu = jnp.stack([l["ffn"]["up"]["w"] for l in layers])
    wd = jnp.stack([l["ffn"]["down"]["w"] for l in layers])  # (L, F, H)
    if quantize:
        from .quant import quantize_weight

        for name, w in (("wg", wg), ("wu", wu), ("wd", wd)):
            qs = [quantize_weight(w[i]) for i in range(nb)]
            arrays[name + "_q"] = jnp.stack([q["w8"] for q in qs])
            arrays[name + "_scale"] = jnp.stack([q["scale"] for q in qs])
    else:
        arrays["wg"], arrays["wu"], arrays["wd"] = wg, wu, wd
    return PackedStage(arrays, float(eps), dim, hid, nb, bool(quantize))


def _kernel(
    x_ref,  # (R, H) input activations
    mods_ref,  # (1, R, 3H) this layer's shift|scale|gate
    norm_w_ref,  # (1, 1, H)
    wg_ref,  # (1, H, CF)
    wg_scale_ref,  # (1, 1, CF)
    wu_ref,  # (1, H, CF)
    wu_scale_ref,  # (1, 1, CF)
    wd_ref,  # (1, CF, H)
    wd_scale_ref,  # (1, 1, H)
    y_ref,  # (R, H) output / carried residual
    hmod_ref,  # scratch (R, H) model-dtype — modulated norm output
    acc_ref,  # scratch (R, H) f32 — FFN accumulator
    *,
    n_chunks: int,
    eps: float,
    dim: int,
):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        x = jnp.where(b == 0, x_ref[...].astype(jnp.float32), y_ref[...].astype(jnp.float32))
        inv = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        h = x * inv * norm_w_ref[0, 0].astype(jnp.float32)
        shift = mods_ref[0, :, :dim].astype(jnp.float32)
        scale = mods_ref[0, :, dim : 2 * dim].astype(jnp.float32)
        hmod_ref[...] = (h * (1.0 + scale) + shift).astype(hmod_ref.dtype)
        y_ref[...] = x.astype(y_ref.dtype)  # persist pre-FFN residual
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mm_dtype = hmod_ref.dtype
    hmod = hmod_ref[...]
    u = jax.lax.dot_general(
        hmod, wg_ref[0].astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * wg_scale_ref[0, 0].astype(jnp.float32)
    v = jax.lax.dot_general(
        hmod, wu_ref[0].astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * wu_scale_ref[0, 0].astype(jnp.float32)
    g = (jax.nn.silu(u) * v).astype(mm_dtype)
    acc_ref[...] += jax.lax.dot_general(
        g, wd_ref[0].astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == n_chunks - 1)
    def _():
        gate = mods_ref[0, :, 2 * dim :].astype(jnp.float32)
        d = acc_ref[...] * wd_scale_ref[0, 0].astype(jnp.float32)
        y_ref[...] = (y_ref[...].astype(jnp.float32) + gate * d).astype(y_ref.dtype)


def fused_head_ffn_stack(
    packed: PackedStage,
    x: jnp.ndarray,  # (B, H) post-noisy_proj activations
    mods: jnp.ndarray,  # (L, B, 3H) per-layer shift|scale|gate
    interpret: bool = False,
) -> jnp.ndarray:
    """Run all L AdaLN-FFN blocks on one denoise step. Returns (B, H)."""
    nb, dim, hid = packed.n_blocks, packed.dim, packed.hidden
    b_, h_ = x.shape
    assert h_ == dim, (x.shape, dim)
    rows = max(8, -(-b_ // 8) * 8)
    if rows != b_:
        x = jnp.pad(x, ((0, rows - b_), (0, 0)))
        mods = jnp.pad(mods, ((0, 0), (0, rows - b_), (0, 0)))

    cf = min(_pick_chunk_f(dim, hid, 1 if packed.quantized else x.dtype.itemsize), hid)
    assert hid % cf == 0, (hid, cf)
    n_chunks = hid // cf
    if packed.quantized:
        wg, wu, wd = packed["wg_q"], packed["wu_q"], packed["wd_q"]
        wg_s, wu_s, wd_s = packed["wg_scale"], packed["wu_scale"], packed["wd_scale"]
    else:
        wg, wu, wd = packed["wg"], packed["wu"], packed["wd"]
        wg_s = jnp.ones((nb, hid), jnp.float32)
        wu_s = jnp.ones((nb, hid), jnp.float32)
        wd_s = jnp.ones((nb, dim), jnp.float32)

    vec = lambda a: a[:, None, :]
    kernel = functools.partial(_kernel, n_chunks=n_chunks, eps=packed.eps, dim=dim)
    y = pl.pallas_call(
        kernel,
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec((rows, dim), lambda b, c: (0, 0), memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, rows, 3 * dim), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim, cf), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),  # wg
            pl.BlockSpec((1, 1, cf), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim, cf), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),  # wu
            pl.BlockSpec((1, 1, cf), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cf, dim), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),  # wd
            pl.BlockSpec((1, 1, dim), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, dim), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, dim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, dim), x.dtype),
            pltpu.VMEM((rows, dim), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        mods,
        vec(packed["norm_w"]),
        wg,
        vec(wg_s),
        wu,
        vec(wu_s),
        wd,
        vec(wd_s),
    )
    return y[:b_]
