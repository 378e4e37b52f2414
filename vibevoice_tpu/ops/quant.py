"""Weight-only int8 quantization with a Pallas dequantizing matmul.

Decode is HBM-bandwidth-bound on weight reads (README perf notes). Storing
weights int8 halves the bytes per step; XLA does NOT fuse the int8->bf16
convert into `dot` (it materialises the dequantized matrix — measured 1.8x
slower), so this kernel streams int8 blocks into VMEM, converts on the VPU,
and feeds the MXU directly.

Layout: w8 (IN, OUT) int8 with per-output-channel f32 scales (OUT,).
Per-channel symmetric quantization: w = w8 * scale.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BLOCK_K = int(os.environ.get("QUANT_BLOCK_K", "0"))  # 0 = per-shape adaptive
BLOCK_N = int(os.environ.get("QUANT_BLOCK_N", "0"))
# "pallas" streams int8 blocks through a custom kernel; "xla" lowers to
# convert+dot and lets XLA fuse the dequant into the matmul.
QUANT_IMPL = os.environ.get("QUANT_IMPL", "pallas")


@functools.lru_cache(maxsize=None)
def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # backend init failure -> be safe, use XLA path
        return False


@functools.lru_cache(maxsize=None)
def _pick_blocks(cin: int, cout: int, rows: int, xbytes: int):
    """Largest-divisor block shapes under a VMEM budget.

    The kernel's cost at decode shapes (8 rows) is per-GRID-STEP overhead,
    not bytes: 7B gate/up (3584x18944) at fixed 512x512 runs 259 steps per
    matmul — ~25K steps per decode frame across the LM, measured ~5 ms of
    pure overhead. Blocks must DIVIDE the dims (Mosaic block grids), so pick
    the divisor pair minimizing grid steps subject to the double-buffered
    VMEM footprint; prefill calls (rows in the thousands) are charged for
    their x/out/acc tiles and naturally land back on ~512 blocks. Returns
    None when no divisor pair fits (odd tiny dims -> XLA fallback)."""
    budget = 12 << 20

    def divisors(n, cap):
        return [d for d in range(128, min(n, cap) + 1, 128) if n % d == 0]

    best = None
    for bk in divisors(cin, 8192):
        for bn in divisors(cout, 8192):
            # double-buffered x and w8 blocks + out (bf16) + acc scratch (f32)
            vmem = 2 * rows * bk * xbytes + 2 * bk * bn + rows * bn * (2 + 4)
            if vmem > budget:
                continue
            steps = (cin // bk) * (cout // bn)
            key = (steps, cin // bk, -bn)
            if best is None or key < best[0]:
                best = (key, bk, bn)
    return None if best is None else (best[1], best[2])


def quantize_weight(w: jnp.ndarray, max_chunk_bytes: int = 256 << 20, bits: int = 8) -> Dict:
    """w (IN, OUT) float -> {'w8': int8, 'scale': (OUT,) f32}; keeps bias out.

    Very large weights (e.g. a 7B lm_head, 3584x152064) quantize in
    output-column chunks: scales are per-column, so chunking is exact, and it
    caps the float32 transients — a multi-GB f32 spike at high HBM occupancy
    can wedge this image's remote-TPU transfer path even when the allocation
    itself succeeds.

    bits=4 is an EXPERIMENTAL storage mode ({'w4': jnp.int4}) probing XLA's
    native int4 lowering on the weight-read-bound 7B decode (BENCH_INT4=1);
    per-channel int4 is not accuracy-qualified — production int4 would need
    group-wise scales and parity tests."""
    key, qmax = ("w8", 127.0) if bits == 8 else ("w4", 7.0)
    dt = jnp.int8 if bits == 8 else jnp.int4

    def q(block):
        wf = block.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / qmax
        wq = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(dt)
        return wq, scale

    cin, cout = w.shape
    if cin * cout * 4 <= max_chunk_bytes:
        wq, scale = q(w)
        return {key: wq, "scale": scale}
    chunk = max(512, max_chunk_bytes // (cin * 4))
    parts = []
    for i in range(0, cout, chunk):
        wq, scale = q(w[:, i : i + chunk])
        wq.block_until_ready()  # keep the f32 transient peak to one chunk
        parts.append((wq, scale))
    return {
        key: jnp.concatenate([p[0] for p in parts], axis=1),
        "scale": jnp.concatenate([p[1] for p in parts]),
    }


def _kernel(x_ref, w8_ref, scale_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...].astype(jnp.bfloat16)  # (R, BK)
    wb = w8_ref[...].astype(jnp.bfloat16)  # (BK, BN)
    acc_ref[...] += jax.lax.dot_general(
        xb, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def int8_matmul(
    x: jnp.ndarray,  # (..., IN)
    w8: jnp.ndarray,  # (IN, OUT) int8
    scale: jnp.ndarray,  # (OUT,) f32
    *,
    block_k: int = 0,
    block_n: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ (w8 * scale), dequantizing inside the kernel."""
    orig_shape = x.shape
    cin, cout = w8.shape
    x2 = x.reshape(-1, cin)
    rows = x2.shape[0]
    r_pad = max(8, -(-rows // 8) * 8)
    if r_pad != rows:
        x2 = jnp.pad(x2, ((0, r_pad - rows), (0, 0)))
    picked = None
    min_div = int(os.environ.get("QUANT_MIN_DIV", "512"))
    if (interpret or _on_tpu()) and cin % min_div == 0 and cout % min_div == 0:
        # Adaptive blocks only for 512-divisible shapes (the shapes the fixed
        # 512-block kernel served): 7B gate/up/down at fixed 512x512 ran 259
        # grid steps with 512-byte DMA bursts — measured ~5 ms/frame of pure
        # overhead; the picked blocks cut 7B decode 25.5 -> 20.1 ms (+27%).
        # Non-512-divisible shapes keep the XLA fused convert+dot fallback.
        # MEASURED NEGATIVE (round 4, do not redo): admitting 128-divisible
        # shapes (QUANT_MIN_DIV=128) puts 1.5B gate/up/down (1536x8960,
        # 8960 = 128*70) on the kernel with LARGE (768, 4480) blocks — and
        # still regresses bs1 25.2 -> 22.4 (-11%, reproduced). XLA's fused
        # convert+dot beats the kernel on these shapes regardless of block
        # size; the earlier sub-512-block regression was not a block-size
        # artifact. The env stays for future probing only.
        picked = _pick_blocks(cin, cout, r_pad, x.dtype.itemsize)
        if picked and (picked[1] < 512 or picked[0] < 256):
            picked = None
    block_k = block_k or BLOCK_K or (picked and picked[0]) or 0
    block_n = block_n or BLOCK_N or (picked and picked[1]) or 0
    if (
        QUANT_IMPL == "xla"
        or not block_k
        or not block_n
        or cin % block_k
        or cout % block_n
    ):
        # fallback when no divisor blocks fit (odd tiny dims) or forced
        y = jnp.dot(x2.astype(jnp.bfloat16), (w8.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)))
        return y[:rows].reshape(*orig_shape[:-1], cout).astype(x.dtype)

    n_k = cin // block_k
    n_n = cout // block_n
    kernel = functools.partial(_kernel, n_k=n_k)
    y = pl.pallas_call(
        kernel,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((r_pad, block_k), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_pad, block_n), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((r_pad, block_n), jnp.float32)],
        interpret=interpret,
    )(x2, w8, scale.reshape(1, -1))
    return y[:rows].reshape(*orig_shape[:-1], cout)


def _kernel_t(g_ref, w8_ref, scale_ref, o_ref, acc_ref, *, n_k: int):
    """Transposed-contraction variant: dx (R, BI) += (g*scale) @ w8^T, with
    the per-output-channel scale folded into g in-kernel. w8 blocks stream
    int8 (half the bytes of a dequantized bf16 transpose, and no multi-GB
    materialised W^T — the QLoRA backward's weight read)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gb = (g_ref[...].astype(jnp.float32) * scale_ref[...].astype(jnp.float32)).astype(
        jnp.bfloat16
    )  # (R, BO)
    wb = w8_ref[...].astype(jnp.bfloat16)  # (BI, BO)
    acc_ref[...] += jax.lax.dot_general(
        gb, wb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int8_matmul_t(
    g: jnp.ndarray,  # (..., OUT)
    w8: jnp.ndarray,  # (IN, OUT) int8
    scale: jnp.ndarray,  # (OUT,) f32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """dx = g @ (w8 * scale)^T — the backward of int8_matmul w.r.t. x.

    Same streaming structure as the forward kernel with the contraction on
    w8's OUTPUT dim, so the stored (IN, OUT) int8 tensor serves both passes
    (no transposed copy, which would double weight HBM)."""
    orig_shape = g.shape
    cin, cout = w8.shape
    g2 = g.reshape(-1, cout)
    rows = g2.shape[0]
    r_pad = max(8, -(-rows // 8) * 8)
    if r_pad != rows:
        g2 = jnp.pad(g2, ((0, r_pad - rows), (0, 0)))
    picked = None
    # Same 512 default as the forward (ADVICE r4): one env knob must mean the
    # same thing in both passes. QUANT_MIN_DIV_T probes the backward alone
    # (e.g. =128 admits 1.5B gate/up/down dx onto the transposed kernel,
    # avoiding the bf16 W^T materialization — unmeasured; probe before use).
    min_div = int(
        os.environ.get("QUANT_MIN_DIV_T", os.environ.get("QUANT_MIN_DIV", "512"))
    )
    if (interpret or _on_tpu()) and cin % min_div == 0 and cout % min_div == 0:
        # same divisor picker as the forward; the roles of the dims swap
        # (grid tiles (BI out-rows, BO contraction))
        picked = _pick_blocks(cout, cin, r_pad, g.dtype.itemsize)
        if picked and (picked[1] < 512 or picked[0] < 256):
            picked = None
    if QUANT_IMPL == "xla" or not picked:
        gs = (g2.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        dx = jnp.dot(gs, w8.astype(jnp.bfloat16).T)
        return dx[:rows].reshape(*orig_shape[:-1], cin).astype(g.dtype)
    block_o, block_i = picked
    n_k = cout // block_o
    n_i = cin // block_i
    kernel = functools.partial(_kernel_t, n_k=n_k)
    y = pl.pallas_call(
        kernel,
        grid=(n_i, n_k),
        in_specs=[
            pl.BlockSpec((r_pad, block_o), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, block_o), lambda j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda j, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_pad, block_i), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, cin), g.dtype),
        scratch_shapes=[pltpu.VMEM((r_pad, block_i), jnp.float32)],
        interpret=interpret,
    )(g2, w8, scale.reshape(1, -1))
    return y[:rows].reshape(*orig_shape[:-1], cin)


# ---------------------------------------------------------------------------
# Model-level quantization
# ---------------------------------------------------------------------------

LM_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_lm(lm_params: Dict, quantize_lm_head: bool = True) -> Dict:
    """Quantize the Qwen2 linears (and the tied lm_head projection) in place
    of their 'w' entries; biases/norms/embeddings stay bf16."""
    out = dict(lm_params)
    layers = []
    for layer in lm_params["layers"]:
        nl = {**layer, "attn": dict(layer["attn"]), "mlp": dict(layer["mlp"])}
        for name in ("q", "k", "v", "o"):
            p = dict(layer["attn"][name])
            q = quantize_weight(p.pop("w"))
            p.update(q)
            nl["attn"][name] = p
        for name in ("gate", "up", "down"):
            p = dict(layer["mlp"][name])
            q = quantize_weight(p.pop("w"))
            p.update(q)
            nl["mlp"][name] = p
        layers.append(nl)
    out["layers"] = layers
    if quantize_lm_head:
        # embed stays bf16 for the gather; the logits matmul gets its own
        # quantized copy (H, V)
        out["lm_head_q"] = quantize_weight(lm_params["embed"].T)
    return out


def pack_lm_projections(lm_params: Dict) -> Dict:
    """Serving-prep: concatenate each layer's int8 q|k|v into one "qkv" and
    gate|up into one "gateup" (output-column axis). Per-column scales make
    the packed matmuls bit-identical to the separate ones, and the decode
    step drops from 7 to 4 Pallas launches per layer (launch overhead is a
    measurable slice of the bs1 frame). Consumed by qwen2.project_qkv /
    mlp_forward; originals are removed to keep one int8 copy in HBM."""

    def cat(parts, with_bias):
        p = {
            "w8": jnp.concatenate([x["w8"] for x in parts], axis=1),
            "scale": jnp.concatenate([x["scale"] for x in parts]),
        }
        if with_bias:
            p["b"] = jnp.concatenate(
                [x.get("b", jnp.zeros((x["w8"].shape[1],), jnp.bfloat16)) for x in parts]
            )
        return p

    out = dict(lm_params)
    layers = []
    for layer in lm_params["layers"]:
        a, m = layer["attn"], layer["mlp"]
        if "w8" not in a["q"]:  # bf16 layer: XLA fuses these anyway
            layers.append(layer)
            continue
        nl = {**layer, "attn": dict(a), "mlp": dict(m)}
        nl["attn"]["qkv"] = cat([a["q"], a["k"], a["v"]], with_bias="b" in a["q"])
        for name in ("q", "k", "v"):
            del nl["attn"][name]
        nl["mlp"]["gateup"] = cat([m["gate"], m["up"]], with_bias=False)
        for name in ("gate", "up"):
            del nl["mlp"][name]
        layers.append(nl)
    out["layers"] = layers
    return out


def int4_matmul(x: jnp.ndarray, w4: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """EXPERIMENTAL y = (x @ w4) * scale with int4-packed storage (see
    quantize_weight bits=4). XLA convert+dot only: the scale is applied
    after the dot so the int4->bf16 convert can fuse into the matmul loads.
    (A Pallas variant would duplicate the int8 kernel for a path the current
    TPU backend can't run — S4 jit-boundary transfers recurse; CLAUDE.md.)"""
    orig_shape = x.shape
    cin, cout = w4.shape
    x2 = x.reshape(-1, cin)
    y = jnp.dot(x2.astype(jnp.bfloat16), w4.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    y = (y * scale.astype(jnp.float32)).astype(x.dtype)
    return y.reshape(*orig_shape[:-1], cout)


@jax.custom_vjp
def _int8_matmul_dx(x: jnp.ndarray, w8: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """int8_matmul with a custom VJP w.r.t. the ACTIVATIONS only (the int8
    weights are frozen — QLoRA training). The Pallas forward has no autodiff
    rule; the backward is dx = (g * scale) @ w8^T as one convert+dot (XLA
    fuses the int8->bf16 convert into the transposed matmul loads; this runs
    once per linear per step, not in the decode hot loop). Weights/scale are
    explicit primals (a tracer-closing custom_vjp leaks under remat); their
    cotangents are float0 / zeros — frozen by construction."""
    return int8_matmul(x, w8, scale)


def _int8_dx_fwd(x, w8, scale):
    return int8_matmul(x, w8, scale), (w8, scale)


def _int8_dx_bwd(res, g):
    import numpy as np

    w8, scale = res
    dx = int8_matmul_t(g, w8, scale)
    return (
        dx,
        np.zeros(w8.shape, dtype=jax.dtypes.float0),
        jnp.zeros_like(scale),
    )


_int8_matmul_dx.defvjp(_int8_dx_fwd, _int8_dx_bwd)


def mm(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """Linear apply dispatching on quantized vs dense weights.

    A "lora" entry ((A (IN,r), B (r,OUT), scaling) — finetune/lora.attach
    semantics) adds the low-rank branch at runtime: y += ((x @ A) @ B) * s.
    That is the QLoRA path — the int8 base stays frozen, gradients flow only
    through A/B.

    int8 applies always ride _int8_matmul_dx: identical compiled forward,
    and reverse-mode works w.r.t. the ACTIVATIONS wherever an int8 base
    sits inside a training graph (the trainer wires this as QLoRA,
    --int8_base; custom training code differentiating w.r.t. non-LM leaves
    gets the same dx path). int8 weights are frozen by construction — their
    cotangents are defined zero, never an error."""
    if "w8" in p:
        y = _int8_matmul_dx(x, p["w8"], p["scale"])
    elif "w4" in p:
        y = int4_matmul(x, p["w4"], p["scale"])
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype))
    if "lora" in p:
        a, b, s = p["lora"]
        y = y + ((x @ a.astype(x.dtype)) @ b.astype(x.dtype)) * jnp.asarray(s, y.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _quant_entry(p: Dict) -> Dict:
    """Quantize a linear entry, but only when its dims admit kernel blocks at
    decode rows — otherwise the runtime would fall back to a *slower*
    dequantize-then-dot, so small layers stay dense."""
    w = p["w"]
    if w.shape[0] % 512 or w.shape[1] % 512:  # small/odd layers stay dense
        # (kept at 512 even though the matmul kernel now admits 128-divisible
        # shapes: relaxing WHICH aux weights quantize changes tested numerics
        # for a measured-neutral win — "int8 tokenizer FFNs were neutral")
        return p
    q = dict(p)
    qq = quantize_weight(q.pop("w"))
    q.update(qq)
    return q


def quantize_diffusion_head(head: Dict) -> Dict:
    """Quantize the AdaLN FFNs + projections (run 2xK times per frame)."""
    out = dict(head)
    layers = []
    for layer in head["layers"]:
        nl = {**layer, "ffn": {k: _quant_entry(v) for k, v in layer["ffn"].items()},
              "adaln": _quant_entry(layer["adaln"])}
        layers.append(nl)
    out["layers"] = layers
    return out


def _quantize_blocks(stages):
    new_stages = []
    for stage in stages:
        new_stage = []
        for block in stage:
            nb = dict(block)
            nb["ffn"] = {
                "fc1": _quant_entry(block["ffn"]["fc1"]),
                "fc2": _quant_entry(block["ffn"]["fc2"]),
            }
            new_stage.append(nb)
        new_stages.append(new_stage)
    return new_stages


def quantize_tokenizer(tok_params: Dict) -> Dict:
    """Quantize ConvNeXt-block FFNs (the dominant vocoder/encoder weights;
    conv mixers and norms stay dense)."""
    out = dict(tok_params)
    for part in ("encoder", "decoder"):
        if part in tok_params:
            sub = dict(tok_params[part])
            sub["stages"] = _quantize_blocks(sub["stages"])
            out[part] = sub
    return out
