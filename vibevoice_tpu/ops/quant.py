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

BLOCK_K = int(os.environ.get("QUANT_BLOCK_K", "512"))
BLOCK_N = int(os.environ.get("QUANT_BLOCK_N", "512"))
# "pallas" streams int8 blocks through a custom kernel; "xla" lowers to
# convert+dot and lets XLA fuse the dequant into the matmul.
QUANT_IMPL = os.environ.get("QUANT_IMPL", "pallas")


def quantize_weight(w: jnp.ndarray, max_chunk_bytes: int = 256 << 20) -> Dict:
    """w (IN, OUT) float -> {'w8': int8, 'scale': (OUT,) f32}; keeps bias out.

    Very large weights (e.g. a 7B lm_head, 3584x152064) quantize in
    output-column chunks: scales are per-column, so chunking is exact, and it
    caps the float32 transients — a multi-GB f32 spike at high HBM occupancy
    can wedge this image's remote-TPU transfer path even when the allocation
    itself succeeds."""

    def q(block):
        wf = block.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
        w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return w8, scale

    cin, cout = w.shape
    if cin * cout * 4 <= max_chunk_bytes:
        w8, scale = q(w)
        return {"w8": w8, "scale": scale}
    chunk = max(512, max_chunk_bytes // (cin * 4))
    parts = []
    for i in range(0, cout, chunk):
        w8, scale = q(w[:, i : i + chunk])
        w8.block_until_ready()  # keep the f32 transient peak to one chunk
        parts.append((w8, scale))
    return {
        "w8": jnp.concatenate([p[0] for p in parts], axis=1),
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
    block_k: int = BLOCK_K,
    block_n: int = BLOCK_N,
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
    if QUANT_IMPL == "xla" or cin % block_k or cout % block_n:
        # fallback for odd shapes (rare: all model dims are multiples of 512
        # except tiny test configs)
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


def mm(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """Linear apply dispatching on quantized vs dense weights."""
    if "w8" in p:
        y = int8_matmul(x, p["w8"], p["scale"])
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _quant_entry(p: Dict) -> Dict:
    """Quantize a linear entry, but only when its dims map onto the kernel's
    512-tiles — otherwise the runtime would fall back to a *slower*
    dequantize-then-dot, so small layers stay dense."""
    w = p["w"]
    if w.shape[0] % BLOCK_K or w.shape[1] % BLOCK_N:
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
