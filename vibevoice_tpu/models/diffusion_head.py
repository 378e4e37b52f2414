"""Per-token diffusion head (AdaLN-zero MLP stack), TPU-native.

Functional re-design of the reference VibeVoiceDiffusionHead
(reference modular_vibevoice_diffusion_head.py:191-280):

  x = noisy_proj(latent); c = cond_proj(cond) + t_embed(t)
  repeat head_layers: x += gate * SwiGLU(modulate(rmsnorm(x), shift, scale))
  out = final_linear(modulate(affine-free-rmsnorm(x), shift, scale))

The whole head is a handful of small matmuls; at inference it runs inside the
`lax.scan` DPM-solver loop (schedule/dpm_solver.py) so the K denoise steps
compile into one XLA program per generated frame.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..configs import DiffusionHeadConfig
from ..ops.norms import rms_norm

Params = Dict

FREQ_EMBED_SIZE = 256


def timestep_embedding(t: jnp.ndarray, dim: int = FREQ_EMBED_SIZE, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, [cos | sin] layout
    (reference modular_vibevoice_diffusion_head.py:66-88)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def init(key, cfg: DiffusionHeadConfig, dtype=jnp.float32) -> Params:
    """Initialise with the reference's zero-init AdaLN / final layers
    (reference :240-252)."""
    h, d, f = cfg.hidden_size, cfg.latent_size, cfg.ffn_dim
    ks = jax.random.split(key, 8 + cfg.head_layers)

    def lin(k, cin, cout, std=0.02):
        return {"w": (jax.random.normal(k, (cin, cout), jnp.float32) * std).astype(dtype)}

    layers = []
    for i in range(cfg.head_layers):
        lk = jax.random.split(ks[8 + i], 3)
        layers.append(
            {
                "norm": {"w": jnp.ones((h,), dtype)},
                "adaln": {"w": jnp.zeros((h, 3 * h), dtype)},
                "ffn": {
                    "gate": lin(lk[0], h, f),
                    "up": lin(lk[1], h, f),
                    "down": lin(lk[2], f, h),
                },
            }
        )
    return {
        "noisy_proj": lin(ks[0], d, h),
        "cond_proj": lin(ks[1], h, h),
        "t_embedder": {
            "fc1": lin(ks[2], FREQ_EMBED_SIZE, h),
            "fc2": lin(ks[3], h, h),
        },
        "layers": layers,
        "final": {
            "adaln": {"w": jnp.zeros((h, 2 * h), dtype)},
            "linear": {"w": jnp.zeros((h, d), dtype)},
        },
    }


def _mm(x, p):
    if "w8" in p:
        from ..ops.quant import mm as qmm

        return qmm(x, p)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def apply(
    params: Params,
    cfg: DiffusionHeadConfig,
    noisy: jnp.ndarray,
    timesteps: jnp.ndarray,
    condition: jnp.ndarray,
) -> jnp.ndarray:
    """Predict v/eps for a batch of noisy latents.

    noisy: (B, latent), timesteps: (B,), condition: (B, hidden).
    """
    x = _mm(noisy, params["noisy_proj"])
    t_freq = timestep_embedding(timesteps).astype(x.dtype)
    te = params["t_embedder"]
    t_emb = _mm(jax.nn.silu(_mm(t_freq, te["fc1"])), te["fc2"])
    # NOTE: reference applies SiLU *between* the two t_embedder linears only
    # (reference :58-63): Linear -> SiLU -> Linear.
    c = _mm(condition, params["cond_proj"]) + t_emb

    for lp in params["layers"]:
        mod = _mm(jax.nn.silu(c), lp["adaln"])
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = rms_norm(x, lp["norm"]["w"], cfg.rms_norm_eps)
        h = h * (1 + scale) + shift
        f = lp["ffn"]
        h = _mm(jax.nn.silu(_mm(h, f["gate"])) * _mm(h, f["up"]), f["down"])
        x = x + gate * h

    fin = params["final"]
    mod = _mm(jax.nn.silu(c), fin["adaln"])
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = rms_norm(x, None, cfg.rms_norm_eps)
    h = h * (1 + scale) + shift
    return _mm(h, fin["linear"])


# ---------------------------------------------------------------------------
# Solver-hoisted AdaLN path
# ---------------------------------------------------------------------------
#
# Inside the DPM-solver scan, the only timestep-dependent part of the head is
# c = cond_proj(cond) + t_embed(t) and the AdaLN projections of silu(c). The
# K solver timesteps are known before the scan, so the per-step modulations
# can be computed ONCE per frame as K-batched matmuls — the AdaLN weights
# (~57 MB bf16 on 1.5B) are then read once instead of K times. Exact same
# math as apply(), just hoisted.


def precompute_mods(params: Params, cfg: DiffusionHeadConfig, timesteps: jnp.ndarray,
                    condition: jnp.ndarray):
    """timesteps (K,), condition (B, H) -> per-step modulation pytree:
    {"layers": [(K, B, 3H)] * L, "final": (K, B, 2H)}."""
    k = timesteps.shape[0]
    b = condition.shape[0]
    t_freq = timestep_embedding(timesteps).astype(condition.dtype)
    te = params["t_embedder"]
    t_emb = _mm(jax.nn.silu(_mm(t_freq, te["fc1"])), te["fc2"])  # (K, H)
    c = _mm(condition, params["cond_proj"])[None, :, :] + t_emb[:, None, :]  # (K, B, H)
    sc = jax.nn.silu(c).reshape(k * b, -1)
    mods = {
        "layers": [_mm(sc, lp["adaln"]).reshape(k, b, -1) for lp in params["layers"]],
        "final": _mm(sc, params["final"]["adaln"]).reshape(k, b, -1),
    }
    return mods


def apply_with_mods(params: Params, cfg: DiffusionHeadConfig, noisy: jnp.ndarray, mods) -> jnp.ndarray:
    """One denoise call with precomputed modulations for THIS step:
    mods = {"layers": [(B, 3H)] * L, "final": (B, 2H)} (a (K,...) slice)."""
    x = _mm(noisy, params["noisy_proj"])

    packed = params.get("ffn_packed")
    if packed is not None:
        from ..ops.head_fused import fused_head_ffn_stack

        stacked = jnp.stack([m.astype(x.dtype) for m in mods["layers"]])
        x = fused_head_ffn_stack(packed, x, stacked, interpret=_fuse_interpret())
    else:
        for lp, mod in zip(params["layers"], mods["layers"]):
            shift, scale, gate = jnp.split(mod.astype(x.dtype), 3, axis=-1)
            h = rms_norm(x, lp["norm"]["w"], cfg.rms_norm_eps)
            h = h * (1 + scale) + shift
            f = lp["ffn"]
            h = _mm(jax.nn.silu(_mm(h, f["gate"])) * _mm(h, f["up"]), f["down"])
            x = x + gate * h

    fin = params["final"]
    shift, scale = jnp.split(mods["final"].astype(x.dtype), 2, axis=-1)
    h = rms_norm(x, None, cfg.rms_norm_eps)
    h = h * (1 + scale) + shift
    return _mm(h, fin["linear"])


def _fuse_interpret() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True


def fuse_head(head_params: Params, cfg: DiffusionHeadConfig, quantize: bool = True,
              keep_dense: bool = False) -> Params:
    """Serving-prep transform: pack the AdaLN-FFN stack into the fused Pallas
    kernel (ops/head_fused.py). Only meaningful together with the hoisted
    precompute_mods/apply_with_mods path (the adaln weights stay dense —
    they are read once per frame, not per solver step)."""
    from ..ops.head_fused import pack_head_ffns

    dim = head_params["layers"][0]["norm"]["w"].shape[0]
    hid = head_params["layers"][0]["ffn"]["gate"]["w"].shape[1]
    if not ((dim % 128 == 0 and hid % 128 == 0) or _fuse_interpret()):
        return head_params  # Mosaic 128-lane tiling; tiny configs stay dense
    out = dict(head_params)
    out["ffn_packed"] = pack_head_ffns(head_params["layers"], cfg.rms_norm_eps, quantize)
    if not keep_dense:
        # adaln + norm stay (hoisted path / checkpointing); FFN weights move
        out["layers"] = [
            {"norm": lp["norm"], "adaln": lp["adaln"]} for lp in head_params["layers"]
        ]
    return out
