"""Training-time diffusion timestep samplers.

Parity with reference vibevoice/schedule/timestep_sampler.py:5-18 (note: the
reference never imports these — training samples timesteps uniformly via
torch.multinomial, reference modeling_vibevoice.py:429-433; the same is true
here, finetune/loss.py uses jax.random.randint — but the samplers are part of
the public surface)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class UniformSampler:
    """Uniform over [0, num_timesteps)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key, shape) -> jnp.ndarray:
        return jax.random.randint(key, shape, 0, self.num_timesteps)


class LogitNormalSampler:
    """Logit-normal over the unit interval, discretised to timesteps
    (weights mid-schedule steps more heavily; arXiv 2403.03206 §3.1)."""

    def __init__(self, num_timesteps: int, loc: float = 0.0, scale: float = 1.0):
        self.num_timesteps = num_timesteps
        self.loc = loc
        self.scale = scale

    def sample(self, key, shape) -> jnp.ndarray:
        z = self.loc + self.scale * jax.random.normal(key, shape)
        u = jax.nn.sigmoid(z)
        return jnp.clip((u * self.num_timesteps).astype(jnp.int32), 0, self.num_timesteps - 1)
