"""EMA of the diffusion head (reference EmaCallback,
train_vibevoice.py:36-95): shadow weights updated each step, swapped in for
eval/save. Functional: the shadow is just another pytree."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_ema(head_params: Dict) -> Dict:
    return jax.tree.map(lambda x: x.astype(jnp.float32), head_params)


def update_ema(ema: Dict, head_params: Dict, decay: float = 0.999) -> Dict:
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(jnp.float32), ema, head_params
    )


def swap_in_ema(params: Dict, ema: Dict) -> Dict:
    out = dict(params)
    dtype = jax.tree_util.tree_leaves(params["diffusion_head"])[0].dtype
    out["diffusion_head"] = jax.tree.map(lambda e: e.astype(dtype), ema)
    return out
