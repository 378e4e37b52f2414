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


def _path_keys(path) -> Tuple:
    return tuple(p.key if hasattr(p, "key") else getattr(p, "idx", None) for p in path)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    grad_clip: float = 1.0,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    accumulation_steps: int = 1,
    trainable_filter=None,
) -> optax.GradientTransformation:
    """accumulation_steps > 1 wraps the optimizer in optax.MultiSteps (the HF
    Trainer gradient_accumulation_steps analog): gradients average over k
    micro-batches and parameters update every k-th call.

    trainable_filter(path_keys) -> bool routes frozen leaves to
    optax.set_to_zero() via multi_transform — zeroing their GRADIENT alone is
    not enough, adamw's weight decay would still shrink them (the reference's
    requires_grad=False means no update of any kind)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
    )
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if trainable_filter is not None:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "t" if trainable_filter(_path_keys(path)) else "f", params
            )

        opt = optax.multi_transform({"t": opt, "f": optax.set_to_zero()}, label_fn)
    if accumulation_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulation_steps)
    return opt


def make_train_step(
    cfg: VibeVoiceConfig,
    optimizer: optax.GradientTransformation,
    opts: TrainOptions = TrainOptions(),
    trainable_filter=None,
    lm_forward=None,
):
    """Returns train_step(state, batch, key) -> (state, TrainOut).

    trainable_filter(path_tuple) -> bool freezes parameters (LoRA/selective
    unfreeze analog of reference train_vibevoice.py:390-468); frozen params
    get zero gradients.

    lm_forward swaps the LM stack implementation (e.g. the GPipe pipeline of
    parallel/pipeline.py; params["lm"] must then be in that layout).
    """
    hcfg = cfg.diffusion_head_config
    noise_schedule = NoiseSchedule.create(hcfg.ddpm_num_steps, hcfg.ddpm_beta_schedule)

    def loss_fn(params, batch, key):
        out = train_forward(cfg, params, batch, key, opts, noise_schedule, lm_forward)
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


def build_trainable_filter(
    *,
    freeze_acoustic_tokenizer: bool = True,
    freeze_semantic_tokenizer: bool = True,
    train_connectors: bool = False,
    train_diffusion_head: bool = True,
    head_layers_to_freeze: Tuple[int, ...] = (),
    freeze_embed: bool = True,
    lm_layers_to_freeze: Tuple[int, ...] = (),
):
    """Path filter implementing the reference's selective freeze/unfreeze maze
    (reference train_vibevoice.py:107-122, :390-468): tokenizers frozen by
    default, connectors/diffusion-head opt-in, embeddings + (tied) lm_head
    frozen, plus per-layer freezing of diffusion-head and LM blocks."""
    head_frozen = set(head_layers_to_freeze)
    lm_frozen = set(lm_layers_to_freeze)

    def trainable(path) -> bool:
        root = path[0]
        if root == "acoustic_tokenizer":
            return not freeze_acoustic_tokenizer
        if root == "semantic_tokenizer":
            return not freeze_semantic_tokenizer
        if root in ("acoustic_connector", "semantic_connector"):
            return train_connectors
        if root == "diffusion_head":
            if not train_diffusion_head:
                return False
            if len(path) >= 3 and path[1] == "layers" and path[2] in head_frozen:
                return False
            return True
        if root in ("speech_scaling_factor", "speech_bias_factor"):
            return False  # buffers (reference registers them, not params)
        if root == "lm_head":
            return not freeze_embed
        if root == "lm":
            if len(path) >= 2 and path[1] == "embed":
                return not freeze_embed
            if len(path) >= 3 and path[1] == "layers" and path[2] in lm_frozen:
                return False
            return True
        return True

    return trainable


def make_component_train_step(
    cfg: VibeVoiceConfig,
    optimizer: optax.GradientTransformation,
    opts: TrainOptions = TrainOptions(),
    train_keys: Tuple[str, ...] = (
        "diffusion_head",
        "acoustic_connector",
        "semantic_connector",
    ),
):
    """Training step that differentiates ONLY the listed top-level components
    (the reference's train_diffusion_head / train_connectors modes with the
    LM frozen, train_vibevoice.py:390-468). Unlike make_train_step +
    trainable_filter — which asks jax.grad for every leaf and zeroes frozen
    ones — the frozen remainder here is a non-differentiated argument, so:

      * an int8-quantized frozen LM base works (jax.grad never sees the
        integer leaves — a 7B head fine-tune fits one 16 GB chip), and
      * optimizer state exists only for the trained components.

    Returns step(state, frozen_params, batch, key) -> (state, TrainOut);
    init state with init_train_state({k: params[k] for k in train_keys}).
    NOTE: the first-batch speech scaling/bias stats land in TrainOut — when
    frozen_params starts with NaN buffers the caller persists them
    (frozen["speech_scaling_factor"] = out.speech_scaling_factor) after the
    first step, mirroring what make_train_step does in-graph.
    """
    hcfg = cfg.diffusion_head_config
    noise_schedule = NoiseSchedule.create(hcfg.ddpm_num_steps, hcfg.ddpm_beta_schedule)

    def loss_fn(sub, frozen, batch, key):
        params = {**frozen, **sub}
        out = train_forward(cfg, params, batch, key, opts, noise_schedule)
        return out.loss, out

    def step(state: TrainState, frozen_params, batch: Batch, key):
        grads, out = jax.grad(loss_fn, has_aux=True)(state.params, frozen_params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        sub = optax.apply_updates(state.params, updates)
        return TrainState(params=sub, opt_state=opt_state, step=state.step + 1), out

    return step


def make_eval_step(
    cfg: VibeVoiceConfig, opts: TrainOptions = TrainOptions(), lm_forward=None
):
    """Loss-only forward for the held-out split (the reference gets its eval
    loop from HF Trainer for free; here it is one jitted function)."""
    hcfg = cfg.diffusion_head_config
    noise_schedule = NoiseSchedule.create(hcfg.ddpm_num_steps, hcfg.ddpm_beta_schedule)

    def eval_step(params, batch: Batch, key) -> TrainOut:
        return train_forward(cfg, params, batch, key, opts, noise_schedule, lm_forward)

    return eval_step


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
