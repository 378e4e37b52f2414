"""Streaming VibeVoice model (0.5B): split-LM real-time TTS.

Re-designs the reference streaming family (reference
modeling_vibevoice_streaming.py:108-206, modeling_vibevoice_streaming_inference.py:93-751):

* The Qwen2 stack is split: a lower text LM (final norm skipped) and an upper
  TTS LM sharing nothing but the tokenizer embedding. Both are plain qwen2
  parameter trees here; the split is expressed with `layer_range` /
  `skip_final_norm` on one forward implementation.
* A 2-entry type embedding marks text(1)/speech(0) inputs to the TTS LM
  (reference :146, :292).
* A binary EOS classifier on the TTS LM hidden state ends generation
  (reference :42-53, :689-694).
* Generation interleaves 5-token text windows with 6-frame speech windows
  (reference :41-42, :553-702). Both window bodies are single jitted
  functions; the speech window is a 6-step `lax.scan` so time-to-first-audio
  is prefill + one text window + one frame of the scanned program.
* Voice presets are prefilled KV caches + last hidden states for the four
  streams (lm, tts_lm, neg_lm, neg_tts_lm), matching the reference's `.pt`
  format (reference demo/streaming_inference_from_file.py:288-291).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import VibeVoiceStreamingConfig
from ..schedule import dpm_solver as dpm
from . import diffusion_head as dh
from . import qwen2
from . import tokenizer as tok
from . import vibevoice as vv

TTS_TEXT_WINDOW_SIZE = 5  # reference modeling_vibevoice_streaming_inference.py:41
TTS_SPEECH_WINDOW_SIZE = 6  # reference :42

Params = Dict


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init(key, cfg: VibeVoiceStreamingConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 7)
    h = cfg.decoder_config.hidden_size
    lower_cfg, upper_cfg = _lower_cfg(cfg), _upper_cfg(cfg)
    std = cfg.decoder_config.initializer_range

    def lin(k, cin, cout):
        return {
            "w": (jax.random.normal(k, (cin, cout), jnp.float32) * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    kc = jax.random.split(ks[5], 2)
    return {
        "language_model": qwen2.init(ks[0], lower_cfg, dtype),
        "tts_language_model": qwen2.init(ks[1], upper_cfg, dtype),
        "tts_input_types": (jax.random.normal(ks[2], (2, h), jnp.float32) * std).astype(dtype),
        "tts_eos_classifier": {"fc1": lin(kc[0], h, h), "fc2": lin(kc[1], h, 1)},
        "acoustic_tokenizer": tok.init_acoustic_tokenizer(ks[3], cfg.acoustic_tokenizer_config, dtype),
        "acoustic_connector": vv.init_connector(ks[4], cfg.acoustic_vae_dim, h, dtype),
        "diffusion_head": dh.init(ks[6], cfg.diffusion_head_config, dtype),
        "speech_scaling_factor": jnp.asarray(1.0, jnp.float32),
        "speech_bias_factor": jnp.asarray(0.0, jnp.float32),
    }


def _lower_cfg(cfg: VibeVoiceStreamingConfig):
    import dataclasses

    return dataclasses.replace(cfg.decoder_config, num_hidden_layers=cfg.lm_num_hidden_layers)


def _upper_cfg(cfg: VibeVoiceStreamingConfig):
    import dataclasses

    return dataclasses.replace(
        cfg.decoder_config, num_hidden_layers=cfg.tts_backbone_num_hidden_layers
    )


def fuse_vocoder(params: Params, cfg: VibeVoiceStreamingConfig, quantize: bool = True) -> Params:
    """Pack the acoustic decoder's stage-0 block stack into the fused Pallas
    kernel (see models/vibevoice.fuse_vocoder; the streaming model has no
    semantic tokenizer)."""
    out = dict(params)
    ac = dict(params["acoustic_tokenizer"])
    ac.update(
        tok.fuse_hot_stages({"decoder": ac["decoder"]}, cfg.acoustic_tokenizer_config, quantize)
    )
    out["acoustic_tokenizer"] = ac
    return out


def eos_logit(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """BinaryClassifier: Linear -> ReLU -> Linear -> 1 (reference :42-53)."""
    p = params["tts_eos_classifier"]
    x = jnp.dot(h, p["fc1"]["w"].astype(h.dtype)) + p["fc1"]["b"].astype(h.dtype)
    x = jax.nn.relu(x)
    return jnp.dot(x, p["fc2"]["w"].astype(x.dtype)) + p["fc2"]["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Streaming state / voice presets
# ---------------------------------------------------------------------------


class StreamState(NamedTuple):
    lm_cache: qwen2.KVCache
    tts_cache: qwen2.KVCache
    neg_tts_cache: qwen2.KVCache
    dec_state: Dict
    tts_h: jnp.ndarray  # (B, H) last TTS hidden
    neg_tts_h: jnp.ndarray  # (B, H)
    finished: jnp.ndarray  # (B,) bool


@dataclass
class VoicePreset:
    """Prefilled prompt state for the four streams. `kv` entries are
    (k, v, length) with k/v shaped (L, 1, S, KH, D); `h` are (1, H) last
    hidden states. Mirrors the reference `.pt` schema (§2.6)."""

    lm_kv: tuple  # (k (L,1,KH,S,D), v, length)
    tts_kv: tuple
    neg_tts_kv: tuple
    lm_h: np.ndarray
    tts_h: np.ndarray
    neg_tts_h: np.ndarray

    def save(self, path: str) -> None:
        np.savez(
            path,
            lm_k=self.lm_kv[0], lm_v=self.lm_kv[1], lm_len=self.lm_kv[2],
            tts_k=self.tts_kv[0], tts_v=self.tts_kv[1], tts_len=self.tts_kv[2],
            neg_tts_k=self.neg_tts_kv[0], neg_tts_v=self.neg_tts_kv[1], neg_tts_len=self.neg_tts_kv[2],
            lm_h=self.lm_h, tts_h=self.tts_h, neg_tts_h=self.neg_tts_h,
        )

    @classmethod
    def load(cls, path: str) -> "VoicePreset":
        z = np.load(path)
        return cls(
            lm_kv=(z["lm_k"], z["lm_v"], z["lm_len"]),
            tts_kv=(z["tts_k"], z["tts_v"], z["tts_len"]),
            neg_tts_kv=(z["neg_tts_k"], z["neg_tts_v"], z["neg_tts_len"]),
            lm_h=z["lm_h"], tts_h=z["tts_h"], neg_tts_h=z["neg_tts_h"],
        )


def _cache_from_kv(cfg, kv, max_len: int, dtype, *, quantized: bool = False) -> qwen2.KVCache:
    k, v, length = kv  # stacked (L, B, KH, S, D) storage format
    L, b, kh, s, d = k.shape
    cache = qwen2.make_cache(cfg, b, max_len, dtype, quantized=quantized)
    length = jnp.asarray(length, jnp.int32).reshape(b)
    if quantized:
        # quantize the preset rows into the int8 buffers (per-(token, head)
        # scales); further writes quantize-on-write inside qwen2.forward
        ck, cks, cv, cvs = [], [], [], []
        for buf, sbuf, out, outs, x in (
            (cache.k, cache.k_scale, ck, cks, k),
            (cache.v, cache.v_scale, cv, cvs, v),
        ):
            for i in range(L):
                q, sc = qwen2.quantize_kv_rows(jnp.asarray(x[i], jnp.float32))
                out.append(buf[i].at[:, :, :s, :d].set(q))
                outs.append(sbuf[i].at[:, :, 0, :s].set(sc))
        return qwen2.KVCache(
            k=tuple(ck), v=tuple(cv), length=length,
            k_scale=tuple(cks), v_scale=tuple(cvs),
        )
    # cache lanes may be zero-padded past the model head_dim (qwen2.make_cache)
    ck = tuple(cache.k[i].at[:, :, :s, :d].set(jnp.asarray(k[i], dtype)) for i in range(L))
    cv = tuple(cache.v[i].at[:, :, :s, :d].set(jnp.asarray(v[i], dtype)) for i in range(L))
    return qwen2.KVCache(k=ck, v=cv, length=length)


def init_stream_state(
    cfg: VibeVoiceStreamingConfig,
    params: Params,
    preset: VoicePreset,
    max_len: int,
    *,
    kv_int8: bool = False,
) -> StreamState:
    dtype = params["language_model"]["embed"].dtype
    return StreamState(
        lm_cache=_cache_from_kv(_lower_cfg(cfg), preset.lm_kv, max_len, dtype, quantized=kv_int8),
        tts_cache=_cache_from_kv(_upper_cfg(cfg), preset.tts_kv, max_len, dtype, quantized=kv_int8),
        neg_tts_cache=_cache_from_kv(_upper_cfg(cfg), preset.neg_tts_kv, max_len, dtype, quantized=kv_int8),
        dec_state=tok.init_decoder_state(cfg.acoustic_tokenizer_config, 1, dtype),
        tts_h=jnp.asarray(preset.tts_h, dtype),
        neg_tts_h=jnp.asarray(preset.neg_tts_h, dtype),
        finished=jnp.zeros((1,), bool),
    )


def init_session_state(
    cfg: VibeVoiceStreamingConfig, params: Params, batch: int, max_len: int,
    kv_int8: bool = False,
) -> StreamState:
    """Empty multi-session state: `batch` slots, all finished (inactive).
    Sessions are spliced in per-slot via `admit_session`. kv_int8 halves KV
    HBM (per-row scales, quantize-on-write in qwen2.forward) — the
    long-context / high-slot-count memory knob: 3 caches x batch x max_len
    lane-padded bf16 rows are what bound sessions-per-chip at max_len >=8K."""
    dtype = params["language_model"]["embed"].dtype
    h = cfg.decoder_config.hidden_size
    return StreamState(
        lm_cache=qwen2.make_cache(_lower_cfg(cfg), batch, max_len, dtype, quantized=kv_int8),
        tts_cache=qwen2.make_cache(_upper_cfg(cfg), batch, max_len, dtype, quantized=kv_int8),
        neg_tts_cache=qwen2.make_cache(_upper_cfg(cfg), batch, max_len, dtype, quantized=kv_int8),
        dec_state=tok.init_decoder_state(cfg.acoustic_tokenizer_config, batch, dtype),
        tts_h=jnp.zeros((batch, h), dtype),
        neg_tts_h=jnp.zeros((batch, h), dtype),
        finished=jnp.ones((batch,), bool),
    )


def preset_admit_arrays(
    preset: VoicePreset, lane_dim: int, bucket: int = 128, max_len: Optional[int] = None
) -> Dict:
    """Host-side: pad a VoicePreset's stacked (L, 1, KH, Sp, D) KV arrays to
    (L, KH, Sb, lane_dim) with Sb = Sp rounded up to `bucket` (clamped to
    `max_len`, the slot capacity), so every voice compiles at most a handful
    of admit program shapes. Returns the kwargs for `admit_session` (numpy;
    cast on device)."""

    def prep(kv):
        k, v, ln = kv
        L, _, kh, sp, d = k.shape
        sb = -(-sp // bucket) * bucket
        if max_len is not None:
            if sp > max_len:
                raise ValueError(
                    f"voice preset has {sp} KV rows but the engine's max_len is {max_len}"
                )
            sb = min(sb, max_len)
        ok = np.zeros((L, kh, sb, lane_dim), np.float32)
        ov = np.zeros((L, kh, sb, lane_dim), np.float32)
        ok[:, :, :sp, :d] = k[:, 0]
        ov[:, :, :sp, :d] = v[:, 0]
        return ok, ov, np.int32(ln[0])

    lm_k, lm_v, lm_len = prep(preset.lm_kv)
    tts_k, tts_v, tts_len = prep(preset.tts_kv)
    ng_k, ng_v, ng_len = prep(preset.neg_tts_kv)
    return dict(
        lm_k=lm_k, lm_v=lm_v, lm_len=lm_len,
        tts_k=tts_k, tts_v=tts_v, tts_len=tts_len,
        ng_k=ng_k, ng_v=ng_v, ng_len=ng_len,
        tts_h=np.asarray(preset.tts_h[0], np.float32),
        neg_tts_h=np.asarray(preset.neg_tts_h[0], np.float32),
    )


def admit_session(
    state: StreamState,
    slot,
    *,
    lm_k, lm_v, lm_len,
    tts_k, tts_v, tts_len,
    ng_k, ng_v, ng_len,
    tts_h, neg_tts_h,
):
    """Splice a voice preset into slot `slot` of a multi-session state:
    overwrite the slot's KV prefix with the preset rows, set its lengths,
    zero its streaming-decoder conv state, install the preset hidden states,
    and un-finish it. jit with donate_argnums=(0,) — every update lowers to
    an in-place dynamic-update-slice on the donated buffers. Residual rows
    from a previous session beyond the preset length are never read
    (valid-prefix attention)."""

    def put_cache(cache: qwen2.KVCache, k_new, v_new, ln):
        if cache.quantized:
            # quantize the preset rows into the slot (same per-(head, token)
            # row scales as quantize-on-write in qwen2.forward); lane-padding
            # zero rows get scale 0 and dequantize to zero
            ks, kss, vs, vss = [], [], [], []
            for bufs, sbufs, out, outs, x in (
                (cache.k, cache.k_scale, ks, kss, k_new),
                (cache.v, cache.v_scale, vs, vss, v_new),
            ):
                for i, (c, sc) in enumerate(zip(bufs, sbufs)):
                    q, s = qwen2.quantize_kv_rows(x[i].astype(jnp.float32))
                    out.append(
                        jax.lax.dynamic_update_slice(c, q[None], (slot, 0, 0, 0))
                    )
                    outs.append(
                        jax.lax.dynamic_update_slice(
                            sc, s[None, :, None, :], (slot, 0, 0, 0)
                        )
                    )
            return cache._replace(
                k=tuple(ks), v=tuple(vs), k_scale=tuple(kss), v_scale=tuple(vss),
                length=cache.length.at[slot].set(ln),
            )
        ks = tuple(
            jax.lax.dynamic_update_slice(c, k_new[i][None].astype(c.dtype), (slot, 0, 0, 0))
            for i, c in enumerate(cache.k)
        )
        vs = tuple(
            jax.lax.dynamic_update_slice(c, v_new[i][None].astype(c.dtype), (slot, 0, 0, 0))
            for i, c in enumerate(cache.v)
        )
        return cache._replace(k=ks, v=vs, length=cache.length.at[slot].set(ln))

    dec_state = jax.tree.map(
        lambda buf: jax.lax.dynamic_update_slice(
            buf, jnp.zeros((1,) + buf.shape[1:], buf.dtype), (slot,) + (0,) * (buf.ndim - 1)
        ),
        state.dec_state,
    )
    dt = state.tts_h.dtype
    return StreamState(
        lm_cache=put_cache(state.lm_cache, lm_k, lm_v, lm_len),
        tts_cache=put_cache(state.tts_cache, tts_k, tts_v, tts_len),
        neg_tts_cache=put_cache(state.neg_tts_cache, ng_k, ng_v, ng_len),
        dec_state=dec_state,
        tts_h=state.tts_h.at[slot].set(tts_h.astype(dt)),
        neg_tts_h=state.neg_tts_h.at[slot].set(neg_tts_h.astype(dt)),
        finished=state.finished.at[slot].set(False),
    )


def build_voice_preset(
    cfg: VibeVoiceStreamingConfig,
    params: Params,
    prompt_ids: np.ndarray,
    *,
    neg_prompt_id: int,
    max_len: int = 512,
) -> VoicePreset:
    """Prefill all four streams from a voice-prompt token sequence (the
    framework-native analog of building the reference's `.pt` presets;
    negative prompt is a single pad token, reference :467, :483-507)."""
    dtype = params["language_model"]["embed"].dtype
    lcfg, ucfg = _lower_cfg(cfg), _upper_cfg(cfg)
    ids = jnp.asarray(prompt_ids, jnp.int32).reshape(1, -1)

    def prefill(token_ids):
        embeds = qwen2.embed_tokens(params["language_model"], token_ids)
        lm_cache = qwen2.make_cache(lcfg, 1, max_len, dtype)
        h, lm_cache = qwen2.forward(
            lcfg, params["language_model"], embeds, cache=lm_cache, skip_final_norm=True
        )
        tts_in = h + params["tts_input_types"][1][None, None, :].astype(h.dtype)
        tts_cache = qwen2.make_cache(ucfg, 1, max_len, dtype)
        th, tts_cache = qwen2.forward(ucfg, params["tts_language_model"], tts_in, cache=tts_cache)
        return lm_cache, tts_cache, h[:, -1], th[:, -1]

    lm_cache, tts_cache, lm_h, tts_h = prefill(ids)
    neg_ids = jnp.full((1, 1), neg_prompt_id, jnp.int32)
    _, neg_tts_cache, _, neg_tts_h = prefill(neg_ids)

    def kv(c):
        # slice to the TRUE head_dim (make_cache lane-pads to 128 for the
        # flash kernel; a preset saved padded would crash on a flash-off
        # backend and double the file size) and fetch the whole cache in ONE
        # jax.device_get (each separate fetch costs ~25 ms RTT on the
        # remote-TPU transport)
        ln = int(c.length[0])
        d = cfg.decoder_config.head_dim
        k, v = jax.device_get(
            ([x[:, :, :ln, :d] for x in c.k], [x[:, :, :ln, :d] for x in c.v])
        )
        return (
            np.stack([np.asarray(x, np.float32) for x in k]),
            np.stack([np.asarray(x, np.float32) for x in v]),
            np.asarray(c.length),
        )

    return VoicePreset(
        lm_kv=kv(lm_cache),
        tts_kv=kv(tts_cache),
        neg_tts_kv=kv(neg_tts_cache),
        lm_h=np.asarray(lm_h, np.float32),
        tts_h=np.asarray(tts_h, np.float32),
        neg_tts_h=np.asarray(neg_tts_h, np.float32),
    )


# ---------------------------------------------------------------------------
# Jitted window functions
# ---------------------------------------------------------------------------


def make_window_fns(cfg: VibeVoiceStreamingConfig, opts, inject: bool = False):
    """Returns (text_window_fn, speech_window_fn, single_frame_fn), all jitted
    with donated state. `opts` is inference.GenerateOptions
    (cfg_scale/ddpm_steps used). Memoized on the frozen configs (host-only
    opt fields are projected out of the key): a fresh jax.jit wrapper per
    generate() call re-traces the window programs
    (see inference.make_step_fn).

    With inject=True the speech-window fns take an extra `noise` argument
    {"init": (W, B, D)[, "sde": (W, S, B, D)]} consumed one row per frame —
    the fidelity-harness analog of the reference's per-frame torch.randn
    (reference modeling_vibevoice_streaming_inference.py:727-751)."""
    from .inference import _trace_opts

    return _make_window_fns_cached(cfg, _trace_opts(opts), inject)[:3]


def make_session_fns(
    cfg: VibeVoiceStreamingConfig, opts, inject: bool = False,
    quantum: int = TTS_SPEECH_WINDOW_SIZE,
):
    """Multi-session (batched) streaming window fns: (text_window_fn,
    speech_window_fn). text_window takes per-slot (B, 5) ids + valid masks
    (all-invalid rows are no-ops); speech_window takes an `active` (B,) bool
    gating which slots commit and runs `quantum` frames per dispatch
    (6 % quantum == 0; the engine keeps the model's 5-text/6-speech cadence
    per slot across quanta — a sub-window quantum only changes how often the
    host can admit joiners and deliver audio, not what any row computes).
    Shares the compiled-program memo with make_window_fns. The reference
    hard-caps streaming at batch 1 (reference
    modeling_vibevoice_streaming_inference.py:511); this is the capability
    it leaves on the table."""
    from .inference import _trace_opts

    if TTS_SPEECH_WINDOW_SIZE % quantum != 0:
        raise ValueError(f"quantum must divide {TTS_SPEECH_WINDOW_SIZE}, got {quantum}")
    fns = _make_window_fns_cached(cfg, _trace_opts(opts), inject)
    return fns[0], fns[3](quantum)


@functools.lru_cache(maxsize=16)
def _make_window_fns_cached(cfg: VibeVoiceStreamingConfig, opts, inject: bool):
    lcfg, ucfg = _lower_cfg(cfg), _upper_cfg(cfg)
    acfg = cfg.acoustic_tokenizer_config
    hcfg = cfg.diffusion_head_config
    coeffs = dpm.make_solver(
        opts.ddpm_steps,
        num_train_timesteps=hcfg.ddpm_num_steps,
        beta_schedule=hcfg.ddpm_beta_schedule,
        prediction_type=hcfg.prediction_type,
        algorithm_type="sde-dpmsolver++" if opts.sde else "dpmsolver++",
    )

    def text_window(params, state: StreamState, text_ids, valid):
        """Feed a (B, W<=5) text window through lm -> tts_lm (reference
        :590-610). Slots whose window is ALL-invalid (multi-session: a
        session out of text while others still feed) keep their previous
        tts_h — the speculative cache write is not committed (advance=0)
        and is overwritten by the next window."""
        embeds = qwen2.embed_tokens(params["language_model"], text_ids)
        h, lm_cache = qwen2.forward(
            lcfg, params["language_model"], embeds, valid_mask=valid,
            cache=state.lm_cache, skip_final_norm=True,
        )
        tts_in = h + params["tts_input_types"][1][None, None, :].astype(h.dtype)
        th, tts_cache = qwen2.forward(
            ucfg, params["tts_language_model"], tts_in, valid_mask=valid, cache=state.tts_cache
        )
        # last VALID hidden (right-padded window)
        last = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0)
        tts_h = th[jnp.arange(th.shape[0]), last]
        any_valid = jnp.any(valid, axis=1)
        tts_h = jnp.where(any_valid[:, None], tts_h, state.tts_h)
        return state._replace(lm_cache=lm_cache, tts_cache=tts_cache, tts_h=tts_h)

    def speech_frame(params, carry, key, frame_noise=None, active=None):
        """One diffusion frame. `active` (B,) bool (multi-session mode) gates
        COMMITMENT: inactive slots (free, finished, or capacity-stopped)
        still compute — batch elements are independent — but their cache
        lengths do not advance (speculative write, overwritten later) and
        their tts_h/neg_tts_h/finished carry through unchanged. active=None
        is the batch-1 trace (everything commits, as before)."""
        state = carry
        b = state.tts_h.shape[0]
        dtype = params["language_model"]["embed"].dtype
        k_lat, k_sde = jax.random.split(key)
        # hoisted AdaLN modulations (see models/inference.py step 4)
        mods = dh.precompute_mods(
            params["diffusion_head"], hcfg, coeffs.timesteps,
            jnp.concatenate([state.tts_h, state.neg_tts_h], axis=0),
        )
        head_fn = lambda x, t, e: dh.apply_with_mods(params["diffusion_head"], hcfg, x, e)
        if inject:
            x_init = frame_noise["init"].astype(jnp.float32)
            sde_noise = frame_noise["sde"].astype(jnp.float32) if opts.sde else None
            sde_key = None
        else:
            x_init = jax.random.normal(k_lat, (b, cfg.acoustic_vae_dim), jnp.float32)
            sde_noise = None
            sde_key = k_sde if opts.sde else None
        latent = dpm.cfg_sample(
            coeffs, head_fn, state.tts_h, state.neg_tts_h, opts.cfg_scale, x_init,
            key=sde_key, noise=sde_noise, extras=mods,
        )
        scaled = latent / params["speech_scaling_factor"] - params["speech_bias_factor"]
        audio, dec_state = tok.decode(
            acfg, params["acoustic_tokenizer"], scaled[:, None, :].astype(dtype), state.dec_state
        )
        acoustic_embed = vv.connector_apply(params["acoustic_connector"], latent.astype(dtype))
        tts_in = (acoustic_embed + params["tts_input_types"][0][None, :].astype(dtype))[:, None, :]
        live = None if active is None else (active & ~state.finished)
        adv = None if live is None else live.astype(jnp.int32)
        th, tts_cache = qwen2.forward(
            ucfg, params["tts_language_model"], tts_in, cache=state.tts_cache, advance=adv
        )
        nh, neg_tts_cache = qwen2.forward(
            ucfg, params["tts_language_model"], tts_in, cache=state.neg_tts_cache, advance=adv
        )
        eos_p = jax.nn.sigmoid(eos_logit(params, th[:, 0]).astype(jnp.float32))[:, 0]
        if live is None:
            tts_h, neg_tts_h = th[:, 0], nh[:, 0]
            finished = state.finished | (eos_p > 0.5)
        else:
            tts_h = jnp.where(live[:, None], th[:, 0], state.tts_h)
            neg_tts_h = jnp.where(live[:, None], nh[:, 0], state.neg_tts_h)
            finished = state.finished | (live & (eos_p > 0.5))
        new_state = state._replace(
            tts_cache=tts_cache,
            neg_tts_cache=neg_tts_cache,
            dec_state=dec_state,
            tts_h=tts_h,
            neg_tts_h=neg_tts_h,
            finished=finished,
        )
        return new_state, (audio, eos_p)

    def speech_window(params, state: StreamState, key, noise=None, active=None):
        """Six diffusion frames as a lax.scan (reference :613-694).
        Returns (state, audio (6, B, hop, 1), eos_probs (6, B))."""
        keys = jax.random.split(key, TTS_SPEECH_WINDOW_SIZE)
        if inject:
            state, (audio, eos) = jax.lax.scan(
                lambda c, x: speech_frame(params, c, x[0], x[1], active), state, (keys, noise)
            )
        else:
            state, (audio, eos) = jax.lax.scan(
                lambda c, k: speech_frame(params, c, k, None, active), state, keys
            )
        return state, audio, eos

    def single_frame(params, state: StreamState, key, noise=None):
        """One diffusion frame (for minimum time-to-first-audio)."""
        fn = None if not inject else jax.tree.map(lambda a: a[0], noise)
        state, (audio, eos) = speech_frame(params, state, key, fn)
        return state, audio, eos

    def _session_window_n(n):
        """n-frame session speech window (n = the engine's admission quantum).
        Splitting the 6-frame scan into 6/n scans of n is computation-
        identical per row (the scan carry chains through); only the host-side
        dispatch cadence changes."""

        def fn(params, state: StreamState, key, active, noise=None):
            keys = jax.random.split(key, n)
            if inject:
                state, (audio, eos) = jax.lax.scan(
                    lambda c, x: speech_frame(params, c, x[0], x[1], active),
                    state, (keys, noise),
                )
            else:
                state, (audio, eos) = jax.lax.scan(
                    lambda c, k: speech_frame(params, c, k, None, active), state, keys
                )
            return state, audio, eos

        return jax.jit(fn, donate_argnums=(1,))

    session_fns: Dict[int, object] = {}

    def get_session_window(n=TTS_SPEECH_WINDOW_SIZE):
        if n not in session_fns:
            session_fns[n] = _session_window_n(n)
        return session_fns[n]

    return (
        jax.jit(text_window, donate_argnums=(1,)),
        jax.jit(speech_window, donate_argnums=(1,)),
        jax.jit(single_frame, donate_argnums=(1,)),
        get_session_window,
    )


# ---------------------------------------------------------------------------
# Host generate loop
# ---------------------------------------------------------------------------


def generate(
    cfg: VibeVoiceStreamingConfig,
    params: Params,
    *,
    tts_text_ids: np.ndarray,
    preset: VoicePreset,
    opts=None,
    max_len: int = 2048,
    seed: int = 0,
    audio_streamer=None,
    stop_check_fn=None,
    window_fns=None,
    noise_bank=None,
):
    """Windowed streaming generation, batch 1 (reference :412-725).

    noise_bank (fidelity-harness hook): {"init": (E, 1, D)[, "sde":
    (E, S, 1, D)]} consumed one row per speech frame in order — the frames
    a window runs after EOS still consume rows, matching the reference's
    draw order (reference :613-694 keeps sampling after finished_tags)."""
    from .inference import GenerateOptions, GenerationOutput

    opts = opts or GenerateOptions(cfg_scale=1.5, ddpm_steps=5)
    from .inference import resolve_kv_int8

    opts = resolve_kv_int8(opts, max_len)
    inject = noise_bank is not None
    if window_fns is None:
        window_fns = make_window_fns(cfg, opts, inject)
    text_window_fn, speech_window_fn, _ = window_fns
    frame_counter = 0
    if inject:
        bank_init = jnp.asarray(noise_bank["init"])
        if opts.sde and "sde" not in noise_bank:
            raise ValueError("injection with opts.sde requires noise_bank['sde']")
        bank_sde = jnp.asarray(noise_bank["sde"]) if opts.sde else None

    state = init_stream_state(cfg, params, preset, max_len, kv_int8=opts.kv_int8)
    key = jax.random.PRNGKey(seed)

    text = np.asarray(tts_text_ids).reshape(1, -1)
    n_text = text.shape[1]
    w = TTS_TEXT_WINDOW_SIZE
    audio_chunks: List[np.ndarray] = []
    text_pos = 0
    max_steps = max_len - int(preset.tts_kv[2][0])
    steps = 0
    sequences = [text]

    finished_np = np.asarray(state.finished)  # refreshed by the window fetch
    while True:
        if stop_check_fn is not None and stop_check_fn():
            break
        if bool(finished_np.all()):
            break
        if steps + w + TTS_SPEECH_WINDOW_SIZE > max_steps:
            # the next text+speech window would advance the tts caches past
            # max_len: dynamic_update_slice would CLAMP those writes onto
            # committed KV slots (silent corruption) — stop cleanly instead
            break

        if text_pos < n_text:
            chunk = text[:, text_pos : text_pos + w]
            text_pos += chunk.shape[1]
            pad = w - chunk.shape[1]
            valid = np.ones((1, w), bool)
            if pad:
                valid[:, chunk.shape[1] :] = False
                chunk = np.pad(chunk, ((0, 0), (0, pad)))
            state = text_window_fn(params, state, jnp.asarray(chunk, jnp.int32), jnp.asarray(valid))
            steps += int(valid.sum())

        key, sk = jax.random.split(key)
        if inject:
            w6 = TTS_SPEECH_WINDOW_SIZE
            if frame_counter + w6 > bank_init.shape[0]:
                raise ValueError(
                    f"noise_bank['init'] has {bank_init.shape[0]} rows but frame "
                    f"{frame_counter + w6} is needed; enlarge the bank"
                )
            noise = {"init": bank_init[frame_counter : frame_counter + w6]}
            if opts.sde:
                if frame_counter + w6 > bank_sde.shape[0]:
                    raise ValueError(
                        f"noise_bank['sde'] has {bank_sde.shape[0]} rows but frame "
                        f"{frame_counter + w6} is needed; enlarge the bank"
                    )
                noise["sde"] = bank_sde[frame_counter : frame_counter + w6]
            frame_counter += w6
            state, audio, eos = speech_window_fn(params, state, sk, noise)
        else:
            state, audio, eos = speech_window_fn(params, state, sk)
        steps += TTS_SPEECH_WINDOW_SIZE
        # one transport round-trip per window (separate fetches cost ~25 ms
        # each on the remote tunnel); finished is re-checked at the loop top
        audio_np, eos_np, finished_np = jax.device_get((audio, eos, state.finished))
        # audio (6, 1, hop, 1); eos (6, 1)
        # frames after the first EOS-triggering frame are discarded
        keep = TTS_SPEECH_WINDOW_SIZE
        hit = np.nonzero(eos_np[:, 0] > 0.5)[0]
        if hit.size:
            keep = int(hit[0]) + 1
        for f in range(keep):
            audio_chunks.append(audio_np[f, 0, :, 0])
            if audio_streamer is not None:
                audio_streamer.put([audio_np[f, 0, :, 0]], [0])
        if audio_streamer is not None and hit.size:
            audio_streamer.end([0])

    if audio_streamer is not None:
        audio_streamer.end()

    return GenerationOutput(
        sequences=np.asarray(sequences[0]),
        speech_outputs=[np.concatenate(audio_chunks) if audio_chunks else None],
        reach_max_step_sample=np.asarray([steps >= max_steps]),
    )
