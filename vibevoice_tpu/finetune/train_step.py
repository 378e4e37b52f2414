"""Optimizer + pjit'd training step over a DP x TP mesh."""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import VibeVoiceConfig
from ..schedule.dpm_solver import NoiseSchedule
from .loss import Batch, TrainOptions, TrainOut, train_forward


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    grad_clip: float = 1.0,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def make_train_step(
    cfg: VibeVoiceConfig,
    optimizer: optax.GradientTransformation,
    opts: TrainOptions = TrainOptions(),
    trainable_filter=None,
):
    """Returns train_step(state, batch, key) -> (state, TrainOut).

    trainable_filter(path_tuple) -> bool freezes parameters (LoRA/selective
    unfreeze analog of reference train_vibevoice.py:390-468); frozen params
    get zero gradients.
    """
    hcfg = cfg.diffusion_head_config
    noise_schedule = NoiseSchedule.create(hcfg.ddpm_num_steps, hcfg.ddpm_beta_schedule)

    def loss_fn(params, batch, key):
        out = train_forward(cfg, params, batch, key, opts, noise_schedule)
        return out.loss, out

    def train_step(state: TrainState, batch: Batch, key) -> Tuple[TrainState, TrainOut]:
        grads, out = jax.grad(loss_fn, has_aux=True)(state.params, batch, key)
        if trainable_filter is not None:
            grads = _mask_grads(grads, trainable_filter)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # persist the first-batch speech statistics (buffer semantics,
        # reference modeling_vibevoice.py:316-322)
        params = dict(params)
        params["speech_scaling_factor"] = out.speech_scaling_factor
        params["speech_bias_factor"] = out.speech_bias_factor
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), out

    return train_step


def _mask_grads(grads: Dict, trainable_filter) -> Dict:
    flat = jax.tree_util.tree_flatten_with_path(grads)
    paths, treedef = flat

    def zero_if_frozen(path, g):
        keys = tuple(
            p.key if hasattr(p, "key") else getattr(p, "idx", None) for p in path
        )
        return g if trainable_filter(keys) else jnp.zeros_like(g)

    leaves = [zero_if_frozen(p, g) for p, g in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def init_train_state(params: Dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32)
    )


def make_lora_train_step(
    cfg: VibeVoiceConfig,
    optimizer: optax.GradientTransformation,
    lora_cfg,
    opts: TrainOptions = TrainOptions(),
):
    """LoRA training: gradients flow only through the adapter pytree; the
    merged weights are materialised inside the jitted loss
    (see finetune/lora.py). Returns lora_step(lora_state, base_params, batch,
    key) -> (lora_state, TrainOut)."""
    from .lora import apply_lora

    hcfg = cfg.diffusion_head_config
    noise_schedule = NoiseSchedule.create(hcfg.ddpm_num_steps, hcfg.ddpm_beta_schedule)

    def loss_fn(lora, base_params, batch, key):
        merged = apply_lora(base_params, lora, lora_cfg)
        out = train_forward(cfg, merged, batch, key, opts, noise_schedule)
        return out.loss, out

    def lora_step(state: TrainState, base_params, batch: Batch, key):
        grads, out = jax.grad(loss_fn, has_aux=True)(state.params, base_params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(params=lora, opt_state=opt_state, step=state.step + 1), out

    return lora_step
