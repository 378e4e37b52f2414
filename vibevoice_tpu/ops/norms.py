"""Normalization primitives.

All norms compute in float32 and cast back to the input dtype, matching the
reference's explicit upcasts (reference modular_vibevoice_tokenizer.py:49,69
and modular_vibevoice_diffusion_head.py:31-38). XLA fuses these into the
surrounding elementwise graph, so there is no separate kernel cost on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray], eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm over the last axis; f32 accumulate, weight applied in input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = (xf * jnp.reciprocal(jnp.sqrt(var + eps))).astype(dtype)
    if weight is not None:
        out = out * weight.astype(dtype)
    return out


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm over the last axis with f32 accumulation."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = ((xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(dtype)
    if weight is not None:
        out = out * weight.astype(dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out
