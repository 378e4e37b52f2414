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
