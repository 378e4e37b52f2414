"""Fused Pallas kernel for a ConvNeXt block stack at T=1 (the vocoder hot
stage).

Per 7.5 Hz frame the acoustic decoder's stage 0 and the semantic encoder's
final stage each run 8 Block1D blocks at dim 2048 and sequence length 1
(reference modular_vibevoice_tokenizer.py:816-951; Block1D :620-684). Their
FFN weights (2048 -> 8192 -> 2048 per block) total ~540 MB bf16 per stack —
by far the largest HBM reads of the vocoder path, all GEMV-shaped and
bandwidth-bound.

This kernel runs the WHOLE stack in one pallas_call:

  for each block b (grid dim 0):
      h   = rms_norm(x) * norm_w
      c   = depthwise_conv_k7([state_b ; h]);  state_b' = shift-in h
      x   = x + c * gamma
      hn  = rms_norm(x) * ffn_norm_w
      u_c = hn @ W1[:, chunk] + b1[chunk]           (grid dim 1 streams W1/W2
      d  += gelu(u_c) @ W2[chunk, :]                 chunks through VMEM)
      x   = x + (d + b2) * ffn_gamma

Pallas's grid pipeline double-buffers the weight chunks from HBM, so the
kernel runs at the weight-read roofline with zero intermediate HBM traffic.
With quantize=True the FFN weights are stored int8 (per-output-channel
scales) and dequantized on the VPU chunk-by-chunk — halving the stage's
bytes. XLA cannot do this fusion: it materialises dequantized matrices and
round-trips each block's intermediates through HBM.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024  # FFN hidden chunk streamed per grid step (W1+W2 slices ~8MB bf16)
CTX = 6  # depthwise kernel 7 -> 6 carried frames


@jax.tree_util.register_pytree_node_class
class PackedStage:
    """Kernel-ready stacked stage params. Arrays are pytree children; the
    shape/eps/quantized metadata is static aux data, so the whole object can
    ride inside a jitted params pytree without tracing its Python scalars."""

    def __init__(self, arrays: Dict, eps: float, dim: int, hidden: int, n_blocks: int,
                 quantized: bool):
        self.arrays = arrays
        self.eps = eps
        self.dim = dim
        self.hidden = hidden
        self.n_blocks = n_blocks
        self.quantized = quantized

    def __getitem__(self, k):
        return self.arrays[k]

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return tuple(self.arrays[k] for k in keys), (
            keys, self.eps, self.dim, self.hidden, self.n_blocks, self.quantized,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, eps, dim, hidden, n_blocks, quantized = aux
        return cls(dict(zip(keys, children)), eps, dim, hidden, n_blocks, quantized)


def pack_stage(blocks: List[Dict], eps: float, quantize: bool = False) -> PackedStage:
    """Stack a stage's Block1D params into kernel-ready arrays.

    blocks: list of per-block param dicts (see models/tokenizer._init_block).
    Requires layer-scale gammas present and kernel size 7 (true for every
    shipped config; reference configuration_vibevoice.py:34-37)."""
    nb = len(blocks)
    dim = blocks[0]["norm"]["w"].shape[0]
    hid = blocks[0]["ffn"]["fc1"]["w"].shape[1]

    def stack(path):
        return jnp.stack([functools.reduce(lambda d, k: d[k], path, b) for b in blocks])

    arrays = {
        "norm_w": stack(["norm", "w"]),  # (NB, C)
        "conv_w": stack(["mixer", "w"])[:, :, 0, :],  # (NB, 7, C) depthwise
        "conv_b": stack(["mixer", "b"]),  # (NB, C)
        "gamma": stack(["gamma"]),
        "ffn_norm_w": stack(["ffn_norm", "w"]),
        "b1": stack(["ffn", "fc1", "b"]),  # (NB, H)
        "b2": stack(["ffn", "fc2", "b"]),  # (NB, C)
        "ffn_gamma": stack(["ffn_gamma"]),
    }
    w1 = stack(["ffn", "fc1", "w"])  # (NB, C, H)
    w2 = stack(["ffn", "fc2", "w"])  # (NB, H, C)
    if quantize:
        from .quant import quantize_weight

        q1 = [quantize_weight(w1[i]) for i in range(nb)]
        q2 = [quantize_weight(w2[i]) for i in range(nb)]
        arrays["w1_q"] = jnp.stack([q["w8"] for q in q1])
        arrays["w1_scale"] = jnp.stack([q["scale"] for q in q1])  # (NB, H)
        arrays["w2_q"] = jnp.stack([q["w8"] for q in q2])
        arrays["w2_scale"] = jnp.stack([q["scale"] for q in q2])  # (NB, C)
    else:
        arrays["w1"] = w1
        arrays["w2"] = w2
    return PackedStage(arrays, float(eps), dim, hid, nb, bool(quantize))


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """float32 erf from lowerable primitives (Mosaic has no erf/erfc):
    Abramowitz & Stegun 7.1.26, max abs error 1.5e-7 — negligible against
    the bf16 activations this kernel serves."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _rms(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return xf * inv * w.astype(jnp.float32)


def _kernel(
    x_ref,  # (R, C) input activations (block 0 reads these)
    state_ref,  # (1, R, CTX, C) this block's conv context
    norm_w_ref,  # (1, 1, C)
    conv_w_ref,  # (1, 7, C)
    conv_b_ref,  # (1, 1, C)
    gamma_ref,  # (1, 1, C)
    ffn_norm_w_ref,  # (1, 1, C)
    w1_ref,  # (1, C, CHUNK)
    w1_scale_ref,  # (1, 1, CHUNK) (ones in dense mode)
    b1_ref,  # (1, 1, CHUNK)
    w2_ref,  # (1, CHUNK, C)
    w2_scale_ref,  # (1, 1, C)
    b2_ref,  # (1, 1, C)
    ffn_gamma_ref,  # (1, 1, C)
    y_ref,  # (R, C) output / running residual
    new_state_ref,  # (1, R, CTX, C)
    xmid_ref,  # scratch (R, C) f32 — residual after conv sub-block
    hn_ref,  # scratch (R, C) bf16 — ffn-normed input
    acc_ref,  # scratch (R, C) f32 — FFN down accumulator
    *,
    n_chunks: int,
    eps: float,
):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        x = jnp.where(b == 0, x_ref[...].astype(jnp.float32), y_ref[...].astype(jnp.float32))
        # norm -> depthwise conv over [state ; h] -> layer scale -> residual
        h = _rms(x, norm_w_ref[0, 0], eps)
        h_in = h.astype(state_ref.dtype)
        conv = h * conv_w_ref[0, CTX].astype(jnp.float32)
        for t in range(CTX):
            conv += state_ref[0, :, t, :].astype(jnp.float32) * conv_w_ref[0, t].astype(
                jnp.float32
            )
            new_state_ref[0, :, t, :] = (
                state_ref[0, :, t + 1, :] if t + 1 < CTX else h_in
            )
        conv += conv_b_ref[0, 0].astype(jnp.float32)
        x = x + conv * gamma_ref[0, 0].astype(jnp.float32)
        xmid_ref[...] = x
        hn_ref[...] = _rms(x, ffn_norm_w_ref[0, 0], eps).astype(hn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # FFN chunk: u = hn @ W1[:, chunk] + b1; acc += gelu(u) @ W2[chunk, :]
    mm_dtype = hn_ref.dtype
    w1 = w1_ref[0].astype(mm_dtype)
    u = jax.lax.dot_general(
        hn_ref[...], w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    u = u * w1_scale_ref[0, 0].astype(jnp.float32) + b1_ref[0, 0].astype(jnp.float32)
    # exact gelu via erf (jax.nn.gelu's erfc path has no Pallas TPU lowering)
    g = (0.5 * u * (1.0 + _erf(u * (2.0**-0.5)))).astype(mm_dtype)
    w2 = w2_ref[0].astype(mm_dtype)
    acc_ref[...] += jax.lax.dot_general(
        g, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(c == n_chunks - 1)
    def _():
        d = acc_ref[...] * w2_scale_ref[0, 0].astype(jnp.float32) + b2_ref[0, 0].astype(jnp.float32)
        y = xmid_ref[...] + d * ffn_gamma_ref[0, 0].astype(jnp.float32)
        y_ref[...] = y.astype(y_ref.dtype)


def fused_stage_step(
    packed: PackedStage,
    x: jnp.ndarray,  # (B, 1, C)
    states: jnp.ndarray,  # (NB, B, CTX, C)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the packed block stack on one frame. Returns (y (B, 1, C),
    new_states (NB, B, CTX, C))."""
    nb, dim, hid = packed.n_blocks, packed.dim, packed.hidden
    b_, t_, c_ = x.shape
    assert t_ == 1 and c_ == dim, (x.shape, dim)
    x2 = x[:, 0, :]
    rows = max(8, -(-b_ // 8) * 8)
    if rows != b_:
        x2 = jnp.pad(x2, ((0, rows - b_), (0, 0)))
        states = jnp.pad(states, ((0, 0), (0, rows - b_), (0, 0), (0, 0)))

    # largest 128-lane-multiple chunk <= CHUNK that divides hid (one always
    # exists: pack requires hid % 128 == 0, and 128 divides hid)
    chunk = min(CHUNK, hid)
    while chunk > 128 and hid % chunk:
        chunk -= 128
    assert hid % chunk == 0, (hid, chunk)
    n_chunks = hid // chunk
    if packed.quantized:
        w1, w2 = packed["w1_q"], packed["w2_q"]
        w1_scale = packed["w1_scale"]
        w2_scale = packed["w2_scale"]
    else:
        w1, w2 = packed["w1"], packed["w2"]
        w1_scale = jnp.ones((nb, hid), jnp.float32)
        w2_scale = jnp.ones((nb, dim), jnp.float32)

    spec_b = lambda shape: pl.BlockSpec(shape, lambda b, c: (b,) + (0,) * (len(shape) - 1),
                                        memory_space=pltpu.VMEM)
    # TPU block rule: the last two block dims must be tile-divisible or equal
    # the array dims — per-block vectors ride as (NB, 1, C) with (1, 1, C) blocks
    vec = lambda a: a[:, None, :]
    kernel = functools.partial(_kernel, n_chunks=n_chunks, eps=packed.eps)
    y, new_states = pl.pallas_call(
        kernel,
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec((rows, dim), lambda b, c: (0, 0), memory_space=pltpu.VMEM),  # x
            spec_b((1, rows, CTX, dim)),  # state
            spec_b((1, 1, dim)),  # norm_w
            spec_b((1, 7, dim)),  # conv_w
            spec_b((1, 1, dim)),  # conv_b
            spec_b((1, 1, dim)),  # gamma
            spec_b((1, 1, dim)),  # ffn_norm_w
            pl.BlockSpec((1, dim, chunk), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec((1, 1, chunk), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),  # w1_scale
            pl.BlockSpec((1, 1, chunk), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec((1, chunk, dim), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),  # w2
            spec_b((1, 1, dim)),  # w2_scale
            spec_b((1, 1, dim)),  # b2
            spec_b((1, 1, dim)),  # ffn_gamma
        ],
        out_specs=(
            pl.BlockSpec((rows, dim), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            spec_b((1, rows, CTX, dim)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, dim), x.dtype),
            jax.ShapeDtypeStruct((nb, rows, CTX, dim), states.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, dim), jnp.float32),
            # matmul-input dtype follows the model dtype (bf16 in serving)
            pltpu.VMEM((rows, dim), x.dtype),
            pltpu.VMEM((rows, dim), jnp.float32),
        ],
        interpret=interpret,
    )(
        x2,
        states,
        vec(packed["norm_w"]),
        packed["conv_w"],
        vec(packed["conv_b"]),
        vec(packed["gamma"]),
        vec(packed["ffn_norm_w"]),
        w1,
        vec(w1_scale),
        vec(packed["b1"]),
        w2,
        vec(w2_scale),
        vec(packed["b2"]),
        vec(packed["ffn_gamma"]),
    )
    return y[:b_, None, :], new_states[:, :b_]
