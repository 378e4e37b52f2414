"""Training forward + loss for VibeVoice fine-tuning, as one static-shape
jittable function.

Re-designs the reference's VibeVoiceTrainer.training_forward / compute_loss
(reference vibevoice/finetune/train_vibevoice.py:606-845) without dynamic
boolean gathers:

* Latents are scattered to their sequence positions once (rank-matching
  scatter, shared with inference voice-prefill), so the diffusion loss is a
  masked dense computation over (B, T, batch_mul) — static shapes, pjit-able.
* The conditioning for the latent at position p is hidden[p-1] — the
  reference's shift-left cond mask (train_vibevoice.py:689-692) expressed as
  a roll.
* The speech scaling/bias statistics (reference modeling_vibevoice.py:307-323)
  are computed with `pmean` over the data-parallel mesh axis when
  uninitialised (NaN), replacing torch.distributed all_reduce.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..configs import VibeVoiceConfig
from ..schedule.dpm_solver import NoiseSchedule
from ..models import diffusion_head as dh
from ..models import qwen2
from ..models import tokenizer as tok
from ..models import vibevoice as vv


@dataclass(frozen=True)
class TrainOptions:
    ce_loss_weight: float = 1.0
    diffusion_loss_weight: float = 1.0
    ddpm_batch_mul: int = 4
    dp_axis: Optional[str] = None  # mesh axis name for the stats all-reduce
    # Memory levers for real-scale (1.5B+) fine-tuning on a 16 GB chip:
    # remat recomputes each LM layer (and the diffusion head) in backward so
    # only the residual stream is stored per layer; ce_chunk_size > 0 computes
    # the CE logits in sequence chunks under jax.checkpoint, so the
    # (B, T, 152K-vocab) float32 logits/softmax residuals (2.5 GB per 4K-token
    # sample) never materialise. Both are exact (same loss/grads).
    remat: bool = False
    ce_chunk_size: int = 0
    # remat_policy="dots" saves each layer's matmul OUTPUTS and recomputes
    # only the cheap elementwise work in backward
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable): faster
    # backward than full remat, more memory — the middle point on the
    # memory/time curve. Same loss/grads either way.
    remat_policy: Optional[str] = None  # None (= save nothing) | "dots"
    # head_position_budget = K > 0 gathers (per sample) the first K speech
    # positions before the diffusion head, so the head runs on B*K*batch_mul
    # rows instead of B*T*batch_mul. Typically only ~T/8 positions are
    # speech, so the dense head burns ~8x its useful FLOPs (~25% of the
    # whole training step at T=2048). Exact (to f32 reduction order) when
    # K >= the max target-frame count of any sample (the trainer checks per
    # batch on the host); static shape, dp-sharding preserved (gather is
    # per-sample along T).
    head_position_budget: int = 0


class Batch(NamedTuple):
    """One collated training batch (see finetune/data.py). All right-padded."""

    input_ids: jnp.ndarray  # (B, T) int32
    attention_mask: jnp.ndarray  # (B, T) bool
    speech_tensors: jnp.ndarray  # (N, T_wav) float — voice + target clips
    speech_masks: jnp.ndarray  # (N, F) bool latent-frame validity
    speech_semantic_tensors: jnp.ndarray  # (N, F, D_sem) precomputed semantics
    speeches_loss_input: jnp.ndarray  # (N,) bool — clip is a diffusion target
    acoustic_input_mask: jnp.ndarray  # (B, T) bool — all latent positions
    acoustic_loss_mask: jnp.ndarray  # (B, T) bool — target latent positions


class TrainOut(NamedTuple):
    loss: jnp.ndarray
    ce_loss: jnp.ndarray
    diffusion_loss: jnp.ndarray
    speech_scaling_factor: jnp.ndarray
    speech_bias_factor: jnp.ndarray
    # CE debug scalars (reference debug_ce_details dumps,
    # train_vibevoice.py:847-880)
    ce_token_count: jnp.ndarray = jnp.zeros((), jnp.int32)
    ce_max: jnp.ndarray = jnp.zeros(())
    ce_accuracy: jnp.ndarray = jnp.zeros(())
    speech_frame_count: jnp.ndarray = jnp.zeros((), jnp.int32)


def _resolve_remat_policy(name: Optional[str]):
    if name is None:
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r} (None | 'dots')")


def _masked_std_mean(x: jnp.ndarray, mask: jnp.ndarray, dp_axis: Optional[str]):
    """Std/mean of masked latent elements, optionally pmean'd across DP ranks
    (reference modeling_vibevoice.py:307-323)."""
    m = mask[..., None].astype(jnp.float32)
    n = jnp.sum(m) * x.shape[-1]
    s = jnp.sum(x * m)
    ss = jnp.sum(jnp.square(x) * m)
    if dp_axis is not None:
        n = jax.lax.psum(n, dp_axis)
        s = jax.lax.psum(s, dp_axis)
        ss = jax.lax.psum(ss, dp_axis)
    mean = s / jnp.maximum(n, 1.0)
    # torch.std uses the unbiased estimator (n-1 denominator)
    var = (ss - n * jnp.square(mean)) / jnp.maximum(n - 1.0, 1.0)
    return jnp.sqrt(var), mean


def _ce_chunked(params, hidden, labels, label_mask, chunk: int):
    """CE statistics computed in sequence chunks, each under jax.checkpoint.

    Peak memory drops from O(B*T*vocab) to O(chunk*vocab): forward keeps only
    the per-chunk scalars, and backward recomputes each chunk's logits instead
    of storing the softmax residuals. Exact — same loss/grad as the dense path
    (pinned by test_finetune.py::test_remat_chunked_ce_match).
    """
    b, tm1, h = hidden.shape
    # chunk over T only (batch stays a leading dim on every chunk) so a
    # dp-sharded batch axis survives the reshape under pjit
    n_chunks = -(-tm1 // chunk)
    pad = n_chunks * chunk - tm1
    hs = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0))) if pad else hidden
    ls = jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, pad)))
    ms = jnp.pad(label_mask, ((0, 0), (0, pad)))

    @jax.checkpoint
    def body(carry, xs):
        hc, lc, mc = xs  # (B, chunk, H), (B, chunk), (B, chunk)
        mcf = mc.astype(jnp.float32)
        logits = vv.lm_logits(params, hc).astype(jnp.float32)  # (B, chunk, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tlp = jnp.take_along_axis(logp, lc[..., None], axis=-1)[..., 0]
        s, n, mx, hit = carry
        s = s + jnp.sum(-tlp * mcf)
        n = n + jnp.sum(mcf)
        mx = jnp.maximum(mx, jnp.max(jnp.where(mc, -tlp, 0.0)))
        hit = hit + jnp.sum(((jnp.argmax(logits, axis=-1) == lc) & mc).astype(jnp.float32))
        return (s, n, mx, hit), None

    init = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    xs = (
        jnp.moveaxis(hs.reshape(b, n_chunks, chunk, h), 1, 0),
        jnp.moveaxis(ls.reshape(b, n_chunks, chunk), 1, 0),
        jnp.moveaxis(ms.reshape(b, n_chunks, chunk), 1, 0),
    )
    (s, n, mx, hit), _ = jax.lax.scan(body, init, xs)
    denom = jnp.maximum(n, 1.0)
    return s / denom, mx, hit / denom, n.astype(jnp.int32)


def train_forward(
    cfg: VibeVoiceConfig,
    params: Dict,
    batch: Batch,
    key: jax.Array,
    opts: TrainOptions = TrainOptions(),
    noise_schedule: Optional[NoiseSchedule] = None,
    lm_forward=None,
) -> TrainOut:
    hcfg = cfg.diffusion_head_config
    acfg = cfg.acoustic_tokenizer_config
    if noise_schedule is None:
        noise_schedule = NoiseSchedule.create(hcfg.ddpm_num_steps, hcfg.ddpm_beta_schedule)

    k_vae, k_noise, k_t = jax.random.split(key, 3)
    b, t = batch.input_ids.shape
    n, f = batch.speech_masks.shape
    dtype = params["lm"]["embed"].dtype

    # ---- acoustic encode + σ-sample + scaling stats ----------------------
    mean, _ = tok.encode(acfg, params["acoustic_tokenizer"], batch.speech_tensors[..., None].astype(dtype))
    latents = tok.sample_latents(k_vae, mean.astype(jnp.float32), acfg.fix_std, acfg.std_dist_type)
    latents = jax.lax.stop_gradient(latents)

    scaling = params["speech_scaling_factor"]
    bias = params["speech_bias_factor"]
    std, lat_mean = _masked_std_mean(latents, batch.speech_masks, opts.dp_axis)
    need_init = jnp.isnan(scaling) | jnp.isnan(bias)
    scaling = jnp.where(need_init, 1.0 / std, scaling)
    bias = jnp.where(need_init, -lat_mean, bias)

    speech_features = (latents + bias) * scaling  # (N, F, D) scaled latents

    # ---- splice connector features into the token embeddings -------------
    acoustic_connect = vv.connector_apply(params["acoustic_connector"], speech_features.astype(dtype))
    semantic_connect = vv.connector_apply(
        params["semantic_connector"], batch.speech_semantic_tensors.astype(dtype)
    )
    connect = acoustic_connect + semantic_connect  # (N, F, H)
    embeds = qwen2.embed_tokens(params["lm"], batch.input_ids)
    embeds = vv.splice_speech_features(
        embeds, batch.acoustic_input_mask, connect, batch.speech_masks
    )

    # ---- LM forward -------------------------------------------------------
    # lm_forward lets a parallelism layout swap the stack implementation
    # (parallel/pipeline.py GPipe); default is the dense qwen2 forward
    if lm_forward is not None:
        hidden = lm_forward(
            cfg.decoder_config, params["lm"], embeds, batch.attention_mask, opts.remat,
            _resolve_remat_policy(opts.remat_policy),
        )
    else:
        hidden, _ = qwen2.forward(
            cfg.decoder_config, params["lm"], embeds, valid_mask=batch.attention_mask,
            remat=opts.remat, remat_policy=_resolve_remat_policy(opts.remat_policy),
        )

    # ---- CE loss (mask pads + acoustic positions; reference
    #      train_vibevoice.py:183-190) ---------------------------------------
    labels = batch.input_ids[:, 1:]
    label_mask = (
        batch.attention_mask[:, 1:]
        & batch.attention_mask[:, :-1]
        & ~batch.acoustic_input_mask[:, 1:]
    )
    if opts.ce_chunk_size > 0:
        ce, ce_max, ce_acc, n_ce = _ce_chunked(
            params, hidden[:, :-1], labels, label_mask, opts.ce_chunk_size
        )
    else:
        logits = vv.lm_logits(params, hidden).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tok_logp = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
        n_ce = jnp.sum(label_mask)
        ce = -jnp.sum(tok_logp * label_mask) / jnp.maximum(n_ce, 1)
        ce_max = jnp.max(jnp.where(label_mask, -tok_logp, 0.0))
        hits = (jnp.argmax(logits[:, :-1], axis=-1) == labels) & label_mask
        ce_acc = jnp.sum(hits) / jnp.maximum(n_ce, 1)

    # ---- diffusion loss ---------------------------------------------------
    # scatter target latents to their sequence positions
    target_valid = batch.speech_masks & batch.speeches_loss_input[:, None]
    lat_at_pos = vv.splice_speech_features(
        jnp.zeros((b, t, hcfg.latent_size), jnp.float32),
        batch.acoustic_loss_mask,
        speech_features,
        target_valid,
    )
    # condition for position p is hidden[p-1] (shift-left cond mask)
    cond_at_pos = jnp.roll(hidden, 1, axis=1).astype(jnp.float32)
    loss_mask = batch.acoustic_loss_mask & (jnp.arange(t)[None, :] > 0)

    mul = opts.ddpm_batch_mul
    d = hcfg.latent_size
    k_pos = opts.head_position_budget
    if k_pos > 0:
        # compact the speech positions: stable argsort of ~mask puts each
        # sample's True positions first (in sequence order); the head then
        # sees (B, K) rows instead of (B, T). Valid iff K covers every
        # sample's frame count — positions past the budget would be DROPPED
        # from the diffusion loss, so the trainer checks K on the host.
        k_pos = min(k_pos, t)
        idx = jnp.argsort(~loss_mask, axis=1, stable=True)[:, :k_pos]  # (B, K)
        lat_at_pos = jnp.take_along_axis(lat_at_pos, idx[..., None], axis=1)
        cond_at_pos = jnp.take_along_axis(cond_at_pos, idx[..., None], axis=1)
        head_mask = jnp.take_along_axis(loss_mask, idx, axis=1)  # (B, K)
        rows = b * k_pos
    else:
        idx = None
        head_mask = loss_mask
        rows = b * t
    x0 = jnp.repeat(lat_at_pos.reshape(rows, d), mul, axis=0)
    cond = jnp.repeat(cond_at_pos.reshape(rows, -1), mul, axis=0)
    # noise/timesteps are drawn at FULL (B*T*mul) size and gathered, so the
    # budgeted path consumes the identical RNG stream per position — its
    # loss matches the dense path to f32 reduction order (dropped rows are
    # exact zeros; only the sum grouping differs)
    noise = jax.random.normal(k_noise, (b * t * mul, d), jnp.float32)
    timesteps = jax.random.randint(k_t, (b * t * mul,), 0, hcfg.ddpm_num_steps)
    if idx is not None:
        base = (jnp.arange(b)[:, None] * t + idx) * mul  # (B, K)
        flat = (base[..., None] + jnp.arange(mul)).reshape(-1)  # (B*K*mul,)
        noise = jnp.take(noise, flat, axis=0)
        timesteps = jnp.take(timesteps, flat, axis=0)

    noisy = noise_schedule.add_noise(x0, noise, timesteps)
    head_fn = lambda hp, nz, ts, cd: dh.apply(hp, hcfg, nz, ts, cd)
    if opts.remat:
        # the head runs on rows*batch_mul inputs; recompute its 4 AdaLN
        # layers in backward rather than keeping their FFN intermediates
        head_fn = jax.checkpoint(
            head_fn, policy=_resolve_remat_policy(opts.remat_policy)
        )
    pred = head_fn(
        params["diffusion_head"], noisy.astype(dtype), timesteps.astype(jnp.float32), cond.astype(dtype)
    ).astype(jnp.float32)
    if hcfg.prediction_type == "v_prediction":
        target = noise_schedule.get_velocity(x0, noise, timesteps)
    elif hcfg.prediction_type == "epsilon":
        target = noise
    else:
        raise NotImplementedError(hcfg.prediction_type)

    per_elem = jnp.square(pred - target)
    elem_mask = jnp.repeat(head_mask.reshape(-1), mul)[:, None]
    speech_len = jnp.sum(loss_mask)
    diffusion_loss = jnp.sum(per_elem * elem_mask) / d / mul / jnp.maximum(speech_len, 1)

    total = opts.ce_loss_weight * ce + opts.diffusion_loss_weight * diffusion_loss
    return TrainOut(
        loss=total,
        ce_loss=ce,
        diffusion_loss=diffusion_loss,
        speech_scaling_factor=scaling,
        speech_bias_factor=bias,
        ce_token_count=n_ce.astype(jnp.int32),
        ce_max=ce_max,
        ce_accuracy=ce_acc,
        speech_frame_count=speech_len.astype(jnp.int32),
    )
