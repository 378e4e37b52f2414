"""Generation engine for the multi-speaker VibeVoice model.

Re-designs the reference's host-driven generate loop
(reference modeling_vibevoice_inference.py:326-710) around ONE fused, jitted
step function per 7.5 Hz frame:

    constrained token choice -> CFG negative-stream bookkeeping ->
    K-step DPM-solver scan -> streaming conv vocode -> semantic re-encode ->
    next-step embeddings -> one 2B-batched LM forward (both CFG streams)

Key departures from the reference (equivalent semantics, TPU-first):

* The negative CFG stream's per-position KV-cache "shift-delete" surgery
  (reference :549-624) becomes pure length bookkeeping on the right-padded
  cache: every step writes speculatively (advance=0) and the *next* step
  commits the slot only for samples that turned out to be diffusing
  (see models/qwen2.py). `speech_start` resets the stream by setting its
  length to 1 — slot 0 always holds the negative prompt's KV.
* Diffusion + vocoding run every step for the full batch under masks
  (branch-free); non-diffusion steps are rare (segment boundaries), so the
  wasted work is negligible and the program is a single static XLA graph.
* Per-sample finish/max-length bookkeeping lives on host (it gates streamer
  delivery), tokens and audio cross the device boundary once per frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, NamedTuple, Optional

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import VibeVoiceConfig
from ..schedule import dpm_solver as dpm
from . import diffusion_head as dh
from . import qwen2
from . import tokenizer as tok
from . import vibevoice as vv


@dataclass(frozen=True)
class SpecialTokens:
    """Speech control tokens reuse Qwen2.5-VL vision token ids
    (reference modular_vibevoice_text_tokenizer.py:66-84)."""

    speech_start: int = 151652  # <|vision_start|>
    speech_end: int = 151653  # <|vision_end|>
    speech_diffusion: int = 151654  # <|vision_pad|>
    eos: int = 151643  # <|endoftext|>
    bos: Optional[int] = None

    @property
    def candidates(self):
        c = [self.speech_start, self.speech_end, self.speech_diffusion, self.eos]
        if self.bos is not None:
            c.append(self.bos)
        return tuple(c)


@dataclass(frozen=True)
class GenerateOptions:
    cfg_scale: float = 1.3
    ddpm_steps: int = 10
    do_sample: bool = False
    temperature: float = 1.0  # logits warp when do_sample (HF semantics)
    top_p: float = 1.0  # nucleus filter when do_sample
    refresh_negative: bool = True
    max_length_times: float = 2.0
    max_length: Optional[int] = None  # defaults to LM context length
    sde: bool = False
    frames_per_dispatch: int = 1  # >1 scans K frames per device dispatch
    prefill_chunk: int = 2048  # prompts longer than this prefill in chunks
    # int8 KV cache with per-row scales (qwen2.make_cache). None = automatic:
    # on when the cache is long-context (>= KV_INT8_AUTO_LEN slots — where
    # halved KV bytes dominate; 7B@32K only fits one 16 GB chip this way),
    # off at short contexts (quantize-on-write costs ~8% at low fill).
    # resolve_kv_int8() applies the policy once max_length is known.
    kv_int8: Optional[bool] = None


KV_INT8_AUTO_LEN = 16384  # kv_int8=None turns int8 KV on at/above this cache length


def resolve_kv_int8(opts: GenerateOptions, max_length: int) -> GenerateOptions:
    """Apply the automatic int8-KV policy (GenerateOptions.kv_int8=None):
    quantize the cache only when it is long enough that halved KV bytes beat
    the ~8% quantize-on-write cost (measured ledger: neutral-to-negative at
    4K, required for 7B@32K on one 16 GB chip). Explicit True/False wins."""
    import dataclasses

    if opts.kv_int8 is not None:
        return opts
    return dataclasses.replace(opts, kv_int8=max_length >= KV_INT8_AUTO_LEN)


class DecodeCarry(NamedTuple):
    """Fused-stream decode state: ONE KV cache of batch 2B holds the positive
    stream in rows [0, B) and the negative CFG stream in rows [B, 2B). Both
    streams consume the same input embedding each frame (reference :506-508,
    :579-581), so a single batched forward reads the LM weights once instead
    of twice — decode is weight-bandwidth-bound, making this ~a third faster
    than separate pos/neg forwards."""

    cache: qwen2.KVCache  # batch 2B
    dec_state: Dict
    sem_state: Dict
    h_pos: jnp.ndarray  # (B, H) hidden that will emit this step's token
    h_neg: jnp.ndarray  # (B, H)
    finished: jnp.ndarray  # (B,) bool
    n_diff: jnp.ndarray  # (B,) int32 diffusion-event count (noise-bank index)


class StepOut(NamedTuple):
    tokens: jnp.ndarray  # (B,)
    audio: jnp.ndarray  # (B, hop, 1)
    audio_mask: jnp.ndarray  # (B,) bool — sample produced audio this step
    finished: jnp.ndarray  # (B,)


@dataclass
class GenerationOutput:
    """Mirrors reference VibeVoiceGenerationOutput
    (modeling_vibevoice_inference.py:38-51)."""

    sequences: np.ndarray
    speech_outputs: Optional[List[Optional[np.ndarray]]] = None
    reach_max_step_sample: Optional[np.ndarray] = None


# ---------------------------------------------------------------------------
# Jitted core
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 3, 6, 7, 8, 9), donate_argnums=())
def prefill_fn(
    cfg: VibeVoiceConfig,
    params,
    ids,
    max_len: int,
    valid_mask,
    speech_args,
    use_speech: bool,
    tokens: SpecialTokens,
    speech_type: str = "audio",
    kv_int8: bool = False,
):
    """Full-prompt prefill for both streams. Returns the initial DecodeCarry."""
    b, t = ids.shape
    lm_cfg = cfg.decoder_config
    dtype = params["lm"]["embed"].dtype
    embeds = qwen2.embed_tokens(params["lm"], ids)

    if use_speech:
        speech_tensors, speech_frame_valid, speech_input_mask, vae_key, vae_noise = speech_args
        feats = vv.encode_voice_features(
            cfg, params, speech_tensors, vae_key, speech_type, vae_noise
        )
        embeds = vv.splice_speech_features(embeds, speech_input_mask, feats, speech_frame_valid)

    pos_cache = qwen2.make_cache(lm_cfg, b, max_len, dtype, quantized=kv_int8)
    h, pos_cache = qwen2.forward(lm_cfg, params["lm"], embeds, valid_mask=valid_mask, cache=pos_cache)
    last = jnp.maximum(jnp.sum(valid_mask.astype(jnp.int32), axis=1) - 1, 0)
    h_pos = h[jnp.arange(b), last]

    # negative stream: 1-token <speech_start> prompt (reference :379-386)
    neg_ids = jnp.full((b, 1), tokens.speech_start, jnp.int32)
    neg_embeds = qwen2.embed_tokens(params["lm"], neg_ids)
    neg_cache = qwen2.make_cache(lm_cfg, b, max_len, dtype, quantized=kv_int8)
    h_neg, neg_cache = qwen2.forward(lm_cfg, params["lm"], neg_embeds, cache=neg_cache)

    dec_state = tok.init_decoder_state(cfg.acoustic_tokenizer_config, b, dtype)
    sem_state = tok.init_encoder_state(cfg.semantic_tokenizer_config, b, dtype)
    return DecodeCarry(
        cache=_combine_caches(pos_cache, neg_cache),
        dec_state=dec_state,
        sem_state=sem_state,
        h_pos=h_pos,
        h_neg=h_neg[:, 0],
        finished=jnp.zeros((b,), bool),
        n_diff=jnp.zeros((b,), jnp.int32),
    )


def _combine_caches(pos: qwen2.KVCache, neg: qwen2.KVCache) -> qwen2.KVCache:
    """Stack the two streams row-wise into one 2B cache (one-time copy)."""
    cat = lambda a, b: tuple(jnp.concatenate([x, y], axis=0) for x, y in zip(a, b))
    return qwen2.KVCache(
        k=cat(pos.k, neg.k),
        v=cat(pos.v, neg.v),
        length=jnp.concatenate([pos.length, neg.length]),
        k_scale=cat(pos.k_scale, neg.k_scale) if pos.k_scale is not None else None,
        v_scale=cat(pos.v_scale, neg.v_scale) if pos.v_scale is not None else None,
    )


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _prefill_init_fn(
    cfg: VibeVoiceConfig, params, ids_shape_b, max_len: int, tokens: SpecialTokens,
    kv_int8: bool = False,
):
    """Allocate caches + negative-stream prefill + conv states (the
    T-independent part of prefill, shared by the chunked path)."""
    b = ids_shape_b.shape[0]
    lm_cfg = cfg.decoder_config
    dtype = params["lm"]["embed"].dtype
    pos_cache = qwen2.make_cache(lm_cfg, b, max_len, dtype, quantized=kv_int8)
    neg_ids = jnp.full((b, 1), tokens.speech_start, jnp.int32)
    neg_embeds = qwen2.embed_tokens(params["lm"], neg_ids)
    neg_cache = qwen2.make_cache(lm_cfg, b, max_len, dtype, quantized=kv_int8)
    h_neg, neg_cache = qwen2.forward(lm_cfg, params["lm"], neg_embeds, cache=neg_cache)
    dec_state = tok.init_decoder_state(cfg.acoustic_tokenizer_config, b, dtype)
    sem_state = tok.init_encoder_state(cfg.semantic_tokenizer_config, b, dtype)
    return (
        pos_cache,
        neg_cache,
        dec_state,
        sem_state,
        h_neg[:, 0],
    )


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def _prefill_chunk_fn(cfg: VibeVoiceConfig, params, pos_cache, h_pos, embeds, valid, lengths, chunk_start):
    """Run one prompt chunk through the positive stream; update h_pos for
    samples whose last valid token lies in this chunk."""
    lm_cfg = cfg.decoder_config
    h, pos_cache = qwen2.forward(
        lm_cfg, params["lm"], embeds, valid_mask=valid, cache=pos_cache
    )
    b, c = valid.shape
    last_global = lengths - 1  # (B,)
    in_chunk = (last_global >= chunk_start) & (last_global < chunk_start + c)
    idx = jnp.clip(last_global - chunk_start, 0, c - 1)
    h_last = h[jnp.arange(b), idx]
    h_pos = jnp.where(in_chunk[:, None], h_last, h_pos)
    return pos_cache, h_pos


def chunked_prefill(
    cfg: VibeVoiceConfig,
    params,
    ids: jnp.ndarray,
    valid_mask: jnp.ndarray,
    max_len: int,
    tokens: SpecialTokens,
    speech_args=None,
    chunk: int = 1024,
    speech_type: str = "audio",
    kv_int8: bool = False,
) -> DecodeCarry:
    """Long-prompt prefill in fixed-size chunks: bounds attention score/mask
    memory at O(chunk x S), enabling 64K prompts (SURVEY.md §5 long-context).
    Voice features are spliced into the full embedding matrix once, then the
    chunks stream through the cache path."""
    b, t = ids.shape
    embeds = qwen2.embed_tokens(params["lm"], ids)
    if speech_args is not None:
        speech_tensors, speech_frame_valid, speech_input_mask, vae_key, vae_noise = speech_args
        feats = vv.encode_voice_features(
            cfg, params, speech_tensors, vae_key, speech_type, vae_noise
        )
        embeds = vv.splice_speech_features(embeds, speech_input_mask, feats, speech_frame_valid)

    lengths = jnp.sum(valid_mask.astype(jnp.int32), axis=1)
    # pass only a (B,)-shaped token: tracing on the full (B, T) ids would
    # recompile this T-independent init for every distinct prompt length
    # (1-3 min per shape on the remote-compile tunnel)
    pos_cache, neg_cache, dec_state, sem_state, h_neg = _prefill_init_fn(
        cfg, params, ids[:, 0], max_len, tokens, kv_int8
    )
    h_pos = jnp.zeros((b, cfg.decoder_config.hidden_size), params["lm"]["embed"].dtype)

    n_chunks = -(-t // chunk)
    pad_t = n_chunks * chunk
    if pad_t != t:
        embeds = jnp.pad(embeds, ((0, 0), (0, pad_t - t), (0, 0)))
        valid_mask = jnp.pad(valid_mask, ((0, 0), (0, pad_t - t)))
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        pos_cache, h_pos = _prefill_chunk_fn(
            cfg, params, pos_cache, h_pos, embeds[:, sl], valid_mask[:, sl], lengths, c * chunk
        )
    return DecodeCarry(
        cache=_combine_caches(pos_cache, neg_cache),
        dec_state=dec_state,
        sem_state=sem_state,
        h_pos=h_pos,
        h_neg=h_neg,
        finished=jnp.zeros((b,), bool),
        n_diff=jnp.zeros((b,), jnp.int32),
    )


def _trace_opts(opts: GenerateOptions) -> GenerateOptions:
    """Project opts onto the fields the traced step program actually reads,
    so host-only knobs (max_length, max_length_times, prefill_chunk,
    frames_per_dispatch) don't fragment the step-fn memo into spurious
    ~13 s retraces."""
    import dataclasses

    return dataclasses.replace(
        GenerateOptions(),
        cfg_scale=opts.cfg_scale,
        ddpm_steps=opts.ddpm_steps,
        do_sample=opts.do_sample,
        temperature=opts.temperature,
        top_p=opts.top_p,
        refresh_negative=opts.refresh_negative,
        sde=opts.sde,
        kv_int8=opts.kv_int8,
    )


def make_step_fn(
    cfg: VibeVoiceConfig, tokens: SpecialTokens, opts: GenerateOptions, inject: bool = False
):
    """Builds the fused per-frame step function (jitted, carry donated).

    Memoized on the (hashable, frozen) configs: a fresh jax.jit wrapper per
    generate() call would RE-TRACE the whole fused program every call —
    measured ~13 s per trace at 1.5B even with the persistent compile cache
    (tracing happens before the cache is consulted)."""
    return _make_step_fn_cached(cfg, tokens, _trace_opts(opts), inject)


@functools.lru_cache(maxsize=32)
def _make_step_fn_cached(cfg, tokens, opts, inject):
    return jax.jit(_make_step_body(cfg, tokens, opts, inject), donate_argnums=(1,))


def _make_step_body(
    cfg: VibeVoiceConfig, tokens: SpecialTokens, opts: GenerateOptions, inject: bool = False
):
    """Unjitted fused step body (shared by the single-step and scanned paths).

    With inject=True the step takes an extra `hooks` argument
    {"forced": (B,) int32 forced token or -1,
     "init": (E, B, D) per-diffusion-event initial latent noise,
     "sde": (E, S, B, D) per-event per-solver-step SDE noise or None},
    indexed by the carried per-sample diffusion-event counter — the
    fidelity-harness analog of the reference's torch.randn draws
    (reference modeling_vibevoice_inference.py:701, dpm_solver.py:956-960)."""
    lm_cfg = cfg.decoder_config
    acfg = cfg.acoustic_tokenizer_config
    scfg = cfg.semantic_tokenizer_config
    hcfg = cfg.diffusion_head_config
    coeffs = dpm.make_solver(
        opts.ddpm_steps,
        num_train_timesteps=hcfg.ddpm_num_steps,
        beta_schedule=hcfg.ddpm_beta_schedule,
        prediction_type=hcfg.prediction_type,
        algorithm_type="sde-dpmsolver++" if opts.sde else "dpmsolver++",
    )
    cand = jnp.asarray(tokens.candidates, jnp.int32)

    def step_body(params, carry: DecodeCarry, key, ext_finish, hooks=None):
        b = carry.h_pos.shape[0]
        k_tok, k_lat, k_sde = jax.random.split(key, 3)

        # ---- 1. constrained token choice (reference :488-501) -------------
        # top-p needs the full-vocab distribution; every other mode reads
        # only the candidate columns — skipping the full lm_head matmul
        # saves 233 MB (int8) / 466 MB (bf16) of HBM traffic PER FRAME at
        # 1.5B (vocab 151936), the largest single weight read in the step
        need_full_vocab = opts.do_sample and opts.top_p < 1.0
        with jax.named_scope("token_choice"):
            if need_full_vocab:
                logits = vv.lm_logits(params, carry.h_pos).astype(jnp.float32)
                cand_logits = logits[:, cand]
            else:
                cand_logits = vv.lm_logits_cand(
                    params, carry.h_pos, tokens.candidates
                ).astype(jnp.float32)
        if opts.do_sample:
            # HF warper ordering (reference generation config path): the
            # temperature/top-p warpers run on FULL-VOCAB logits, and the
            # token-constraint processor masks afterwards — so the nucleus is
            # computed over the whole distribution, then intersected with the
            # candidate set. (A nucleus of pure text tokens would leave no
            # candidate; HF's min_tokens_to_keep=1 keeps a full-vocab top-1
            # that the constraint may still mask to -inf and error — we keep
            # the best CANDIDATE instead, the graceful superset behavior.)
            rows = jnp.arange(cand_logits.shape[0])
            if need_full_vocab:
                scaled_full = logits / max(opts.temperature, 1e-6)
                probs = jax.nn.softmax(scaled_full, axis=-1)
                order = jnp.argsort(-probs, axis=-1)
                sorted_p = jnp.take_along_axis(probs, order, axis=-1)
                csum = jnp.cumsum(sorted_p, axis=-1)
                keep_sorted = (csum - sorted_p) < opts.top_p
                keep = jnp.zeros_like(keep_sorted).at[rows[:, None], order].set(keep_sorted)
                cand_keep = keep[:, cand]
                cand_scaled = scaled_full[:, cand]
            else:
                cand_keep = jnp.ones(cand_logits.shape, bool)
                cand_scaled = cand_logits / max(opts.temperature, 1e-6)
            best = jnp.argmax(cand_scaled, axis=-1)
            cand_keep = cand_keep.at[rows, best].set(True)
            choice = jax.random.categorical(
                k_tok, jnp.where(cand_keep, cand_scaled, -jnp.inf), axis=-1
            )
        else:
            choice = jnp.argmax(cand_logits, axis=-1)
        next_tok = cand[choice]
        if inject:
            next_tok = jnp.where(hooks["forced"] >= 0, hooks["forced"], next_tok)
        next_tok = jnp.where(carry.finished, tokens.eos, next_tok)

        finished = carry.finished | (next_tok == tokens.eos) | ext_finish
        diff_mask = (next_tok == tokens.speech_diffusion) & ~finished
        end_mask = next_tok == tokens.speech_end
        start_mask = (next_tok == tokens.speech_start) & ~finished

        # ---- 2. negative-stream bookkeeping (rows [B, 2B) of the cache) ---
        cache = carry.cache
        pos_len, neg_len = cache.length[:b], cache.length[b:]
        if opts.refresh_negative:
            # commit last step's speculative slot only for diffusing samples,
            # then reset streams that just emitted <speech_start>
            neg_len = neg_len + diff_mask.astype(jnp.int32)
            neg_len = jnp.where(start_mask, 1, neg_len)
        cache = cache._replace(length=jnp.concatenate([pos_len, neg_len]))

        # ---- 3. conv-state reset on speech_end (reference :542-546) -------
        dec_state = tok.reset_state(carry.dec_state, end_mask)
        sem_state = tok.reset_state(carry.sem_state, end_mask)

        # ---- 4. CFG diffusion scan (reference :629-633, :697-710) ---------
        # AdaLN modulations for all K steps are precomputed once per frame
        # (the solver timesteps are known), so the adaln weights are read
        # once instead of K times — exact same math as dh.apply
        mods = dh.precompute_mods(
            params["diffusion_head"], hcfg, coeffs.timesteps,
            jnp.concatenate([carry.h_pos, carry.h_neg], axis=0),
        )
        head_fn = lambda x, t, e: dh.apply_with_mods(params["diffusion_head"], hcfg, x, e)
        if inject:
            e = jnp.clip(carry.n_diff, 0, hooks["init"].shape[0] - 1)
            rows = jnp.arange(b)
            x_init = hooks["init"][e, rows].astype(jnp.float32)
            sde_noise = (
                jnp.transpose(hooks["sde"][e, :, rows], (1, 0, 2)).astype(jnp.float32)
                if opts.sde
                else None
            )
            sde_key = None
        else:
            x_init = jax.random.normal(k_lat, (b, cfg.acoustic_vae_dim), jnp.float32)
            sde_noise = None
            sde_key = k_sde if opts.sde else None
        with jax.named_scope("cfg_diffusion"):
            latent = dpm.cfg_sample(
                coeffs,
                head_fn,
                carry.h_pos,
                carry.h_neg,
                opts.cfg_scale,
                x_init,
                key=sde_key,
                noise=sde_noise,
                extras=mods,
            )

        # ---- 5. vocode one frame + semantic re-encode (reference :636-664)
        dtype = params["lm"]["embed"].dtype
        scaled = latent / params["speech_scaling_factor"] - params["speech_bias_factor"]
        with jax.named_scope("vocoder"):
            audio, dec_state_new = tok.decode(
                acfg, params["acoustic_tokenizer"], scaled[:, None, :].astype(dtype), dec_state
            )
        with jax.named_scope("semantic_encode"):
            sem_mean, sem_state_new = tok.encode(scfg, params["semantic_tokenizer"], audio, sem_state)

        commit = diff_mask.reshape(-1, 1, 1)
        dec_state = jax.tree.map(lambda n, o: jnp.where(commit, n, o), dec_state_new, dec_state)
        sem_state = jax.tree.map(lambda n, o: jnp.where(commit, n, o), sem_state_new, sem_state)

        # ---- 6. next-step embeddings (reference :567-675) -----------------
        acoustic_embed = vv.connector_apply(params["acoustic_connector"], latent.astype(dtype))
        semantic_embed = vv.connector_apply(params["semantic_connector"], sem_mean[:, 0])
        diff_embeds = acoustic_embed + semantic_embed
        tok_embeds = qwen2.embed_tokens(params["lm"], next_tok)
        next_embeds = jnp.where(diff_mask[:, None], diff_embeds, tok_embeds)[:, None, :]

        # ---- 7. ONE batched LM forward for both streams -------------------
        # (same weights, same inputs; rows [0,B)=positive, [B,2B)=negative)
        both_embeds = jnp.concatenate([next_embeds, next_embeds], axis=0)
        neg_adv = (
            jnp.zeros((b,), jnp.int32)
            if opts.refresh_negative
            else jnp.ones((b,), jnp.int32)
        )
        advance = jnp.concatenate([jnp.ones((b,), jnp.int32), neg_adv])
        with jax.named_scope("lm_fused"):
            h_both, cache = qwen2.forward(
                lm_cfg, params["lm"], both_embeds, cache=cache, advance=advance
            )

        new_carry = DecodeCarry(
            cache=cache,
            dec_state=dec_state,
            sem_state=sem_state,
            h_pos=h_both[:b, 0],
            h_neg=h_both[b:, 0],
            finished=finished,
            n_diff=carry.n_diff + diff_mask.astype(jnp.int32),
        )
        out = StepOut(tokens=next_tok, audio=audio, audio_mask=diff_mask, finished=finished)
        return new_carry, out

    return step_body


def make_multi_step_fn(
    cfg: VibeVoiceConfig,
    tokens: SpecialTokens,
    opts: GenerateOptions,
    frames_per_dispatch: int,
    inject: bool = False,
):
    """Device-resident loop: scans `frames_per_dispatch` fused frame steps in
    one XLA dispatch, amortising host round-trips (the TPU answer to the
    reference's per-step Python loop + CUDA-graph TODO, reference
    modeling_vibevoice_inference.py:432-495).

    Returns multi_step(params, carry, key, ext_finish (K, B)) ->
    (carry, StepOut stacked over K). With inject=True takes a trailing
    `hooks` dict whose "forced" entry is (K, B). Memoized — see make_step_fn
    (a fresh jit wrapper per call re-traces ~13 s at 1.5B)."""
    return _make_multi_step_fn_cached(
        cfg, tokens, _trace_opts(opts), frames_per_dispatch, inject
    )


@functools.lru_cache(maxsize=32)
def _make_multi_step_fn_cached(cfg, tokens, opts, frames_per_dispatch, inject):
    single = _make_step_body(cfg, tokens, opts, inject)

    def multi(params, carry, key, ext_finish, hooks=None):
        keys = jax.random.split(key, frames_per_dispatch)

        def body(c, inp):
            k, ext, forced = inp
            h = None if not inject else {**hooks, "forced": forced}
            return single(params, c, k, ext, h)

        forced_seq = (
            hooks["forced"]
            if inject
            else jnp.zeros((frames_per_dispatch, ext_finish.shape[1]), jnp.int32)
        )
        carry, outs = jax.lax.scan(body, carry, (keys, ext_finish, forced_seq))
        return carry, outs

    return jax.jit(multi, donate_argnums=(1,))


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


def generate(
    cfg: VibeVoiceConfig,
    params,
    *,
    input_ids: np.ndarray,
    valid_mask: Optional[np.ndarray] = None,
    speech_tensors: Optional[np.ndarray] = None,
    speech_frame_valid: Optional[np.ndarray] = None,
    speech_input_mask: Optional[np.ndarray] = None,
    tokens: SpecialTokens = SpecialTokens(),
    opts: GenerateOptions = GenerateOptions(),
    speech_type: str = "audio",
    seed: int = 0,
    audio_streamer=None,
    stop_check_fn: Optional[Callable[[], bool]] = None,
    show_progress_bar: bool = False,
    step_fn=None,
    noise_bank: Optional[Dict[str, np.ndarray]] = None,
    forced_tokens: Optional[np.ndarray] = None,
) -> GenerationOutput:
    """Host loop: prefill once, then one fused device step per frame
    (call-stack parity: SURVEY.md §3.1).

    input_ids must be RIGHT-padded; `valid_mask` marks real tokens.

    Fidelity-harness hooks (both optional, used by tests/test_e2e_fidelity.py
    to replay the reference's exact noise draws):
      noise_bank: {"init": (E, B, D), "sde": (E, S, B, D) [sde mode only],
                   "vae_std": (N,), "vae_eps": (N, F, D) [voice-clone only]}
      forced_tokens: (T, B) int32 token script; -1 entries fall through to
                     the model's own argmax/sample choice.
    """
    b, t0 = input_ids.shape
    if valid_mask is None:
        valid_mask = np.ones((b, t0), bool)
    lengths = valid_mask.sum(axis=1).astype(np.int64)

    max_length = opts.max_length or cfg.decoder_config.max_position_embeddings
    if max_length <= t0:
        raise ValueError(
            f"max_length={max_length} must exceed the prompt length ({t0} tokens); "
            "raise GenerateOptions.max_length or shorten the prompt"
        )
    opts = resolve_kv_int8(opts, max_length)
    max_steps = int(min(max_length - t0, opts.max_length_times * t0))
    max_step_per_sample = np.minimum(
        max_length - lengths, (opts.max_length_times * lengths).astype(np.int64)
    )

    key = jax.random.PRNGKey(seed)
    # pk kept in the split so existing seeds reproduce (prefill itself
    # consumes no randomness; the VAE draw rides speech_args' vk)
    key, _pk, vk = jax.random.split(key, 3)

    use_speech = speech_tensors is not None
    speech_args = None
    if use_speech:
        if speech_type == "audio":
            hop = cfg.acoustic_tokenizer_config.hop_length
            expected_frames = -(-speech_tensors.shape[1] // hop)
            if speech_frame_valid.shape[1] != expected_frames:
                raise ValueError(
                    f"speech_frame_valid has {speech_frame_valid.shape[1]} frames but the "
                    f"acoustic tokenizer (hop {hop}) produces {expected_frames}; did the "
                    "processor use a mismatched speech_tok_compress_ratio?"
                )
        vae_noise = None
        if noise_bank is not None and "vae_eps" in noise_bank:
            vae_noise = (
                jnp.asarray(noise_bank["vae_std"]),
                jnp.asarray(noise_bank["vae_eps"]),
            )
        speech_args = (
            jnp.asarray(speech_tensors),
            jnp.asarray(speech_frame_valid),
            jnp.asarray(speech_input_mask),
            vk,
            vae_noise,
        )
    if t0 > opts.prefill_chunk:
        carry = chunked_prefill(
            cfg,
            params,
            jnp.asarray(input_ids, jnp.int32),
            jnp.asarray(valid_mask),
            max_length,
            tokens,
            speech_args=speech_args if use_speech else None,
            chunk=opts.prefill_chunk,
            speech_type=speech_type,
            kv_int8=opts.kv_int8,
        )
    else:
        carry = prefill_fn(
            cfg,
            params,
            jnp.asarray(input_ids, jnp.int32),
            max_length,
            jnp.asarray(valid_mask),
            speech_args,
            use_speech,
            tokens,
            speech_type,
            opts.kv_int8,
        )

    inject = noise_bank is not None or forced_tokens is not None
    k_frames = max(1, opts.frames_per_dispatch)
    if step_fn is None:
        if k_frames > 1:
            step_fn = make_multi_step_fn(cfg, tokens, opts, k_frames, inject)
        else:
            step_fn = make_step_fn(cfg, tokens, opts, inject)

    hooks_base = None
    if inject:
        d = cfg.acoustic_vae_dim
        bank = noise_bank or {}
        init = bank.get("init")
        if init is None:
            # forced-tokens-only injection: one fixed init draw per sample
            # (the event counter clips to bank row 0 every frame)
            init = jax.random.normal(jax.random.PRNGKey(seed ^ 0x5EED), (1, b, d), jnp.float32)
        hooks_base = {"init": jnp.asarray(init)}
        if opts.sde:
            if "sde" not in bank:
                raise ValueError("injection with opts.sde requires noise_bank['sde']")
            hooks_base["sde"] = jnp.asarray(bank["sde"])

    sequences = [input_ids]
    audio_chunks: List[List[np.ndarray]] = [[] for _ in range(b)]
    reach_max = np.zeros(b, bool)
    finished_host = np.zeros(b, bool)

    iterator = range(0, max_steps, k_frames)
    if show_progress_bar:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="Generating", leave=False)
        except ImportError:
            pass

    def process_window(out, ext_cap, n_live):
        """Fetch one dispatched window (ONE device round-trip — separate
        np.asarray calls cost ~25 ms each on the remote tunnel) and deliver
        its tokens/audio; updates finished_host/reach_max in place."""
        nonlocal reach_max, finished_host
        toks, amask, audio, fin = jax.device_get(
            (out.tokens, out.audio_mask, out.audio, out.finished)
        )  # (K, B) / (K, B) / (K, B, hop, 1) / (K, B)
        if k_frames == 1:
            toks, amask, audio, fin = toks[None], amask[None], audio[None], fin[None]
        # frames past the global max_steps bound are dispatch padding (fully
        # masked in-device); a k=1 run never dispatches them — drop them so
        # sequences are identical for every frames_per_dispatch
        for f in range(n_live):
            sequences.append(toks[f][:, None])
            if amask[f].any():
                for i in np.nonzero(amask[f])[0]:
                    audio_chunks[i].append(audio[f, i, :, 0])
                if audio_streamer is not None:
                    audio_streamer.put(audio[f, amask[f], :, 0], np.nonzero(amask[f])[0])
            newly_done = fin[f] & ~finished_host
            if newly_done.any():
                # EOS wins the tie: a sample that CHOSE eos on its cap frame
                # is eos-finished, not max-length-finished (reference
                # modeling_vibevoice_inference.py:519-539 marks eos first)
                reach_max |= ext_cap[f] & newly_done & (toks[f] != tokens.eos)
                if audio_streamer is not None:
                    audio_streamer.end(np.nonzero(newly_done)[0])
            finished_host = fin[f]
            if finished_host.all():
                # remaining frames of this window are fully masked (a k=1
                # run would never have dispatched them)
                break

    # One dispatch kept in flight: window N+1 is dispatched BEFORE N's
    # outputs are fetched, overlapping device compute with the host's fetch
    # + delivery. Output equality with the sequential loop holds because a
    # window dispatched after everything finished is dropped unprocessed
    # (the in-device step is fully masked for finished samples).
    inflight = None  # (out, ext_finish)
    for step in iterator:
        if stop_check_fn is not None and stop_check_fn():
            if inflight is not None:
                process_window(*inflight)
                inflight = None
            if audio_streamer is not None:
                audio_streamer.end()
            break
        if audio_streamer is not None and getattr(audio_streamer, "finished_flags", None):
            if any(audio_streamer.finished_flags):
                # deliver the dispatched window first — the sequential loop
                # had processed it before noticing the abandoned stream
                if inflight is not None:
                    process_window(*inflight)
                    inflight = None
                break

        steps_now = np.arange(step, step + k_frames)
        # per-sample cap (drives reach_max accounting)...
        ext_cap = steps_now[:, None] >= max_step_per_sample[None, :]  # (K, B)
        # ...plus the global loop bound (reference range(max_steps)): frames
        # of the last window that fall past max_steps are masked for EVERY
        # sample, so outputs are identical for any frames_per_dispatch and
        # no sample's cache can advance past max_length. Samples stopped
        # only by the global bound do NOT count as reach_max (k=1 parity:
        # those frames are simply never dispatched).
        ext_finish = ext_cap | (steps_now >= max_steps)[:, None]

        key, sk = jax.random.split(key)
        hooks = None
        if inject:
            if forced_tokens is not None:
                forced_now = np.full((k_frames, b), -1, np.int32)
                avail = forced_tokens[step : step + k_frames]
                forced_now[: len(avail)] = avail
            else:
                forced_now = np.full((k_frames, b), -1, np.int32)
            hooks = {**hooks_base, "forced": jnp.asarray(forced_now)}
        if k_frames > 1:
            args = (jnp.asarray(ext_finish),) + ((hooks,) if inject else ())
        else:
            if inject:
                hooks = {**hooks, "forced": hooks["forced"][0]}
            args = (jnp.asarray(ext_finish[0]),) + ((hooks,) if inject else ())
        carry, out = step_fn(params, carry, sk, *args)

        n_live = max(0, min(k_frames, max_steps - step))
        prev, inflight = inflight, (out, ext_cap, n_live)
        if prev is not None:
            process_window(*prev)
        if finished_host.all():
            # the window just dispatched runs fully masked; dropping it keeps
            # sequences identical to the sequential loop
            inflight = None
            break
    if inflight is not None:
        process_window(*inflight)

    if audio_streamer is not None:
        audio_streamer.end()

    speech_outputs: List[Optional[np.ndarray]] = [
        np.concatenate(c) if c else None for c in audio_chunks
    ]
    return GenerationOutput(
        sequences=np.concatenate(sequences, axis=1),
        speech_outputs=speech_outputs,
        reach_max_step_sample=reach_max,
    )
