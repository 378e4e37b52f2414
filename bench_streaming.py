"""Streaming-0.5B time-to-first-audio benchmark (BASELINE.md target:
<300 ms p50 on one v5e chip).

Measures, over N trials on the full-size 0.5B config (random bf16 weights,
precompiled functions — steady-state serving):
  TTFA = first text window (5 tokens through both LM stacks) + one diffusion
         frame (5 DDPM steps + CFG) + streaming vocode of 3200 samples,
         including the host dispatch that delivers the audio.

Prints one JSON line like bench.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    from vibevoice_tpu.configs import VibeVoiceStreamingConfig
    from vibevoice_tpu.models import streaming as st
    from vibevoice_tpu.models.inference import GenerateOptions

    cfg = VibeVoiceStreamingConfig.from_json_file(
        os.path.join(os.path.dirname(__file__), "vibevoice_tpu", "configs", "qwen2.5_0.5b_streaming.json")
    )
    dtype = jnp.bfloat16
    params = st.init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if os.environ.get("BENCH_NO_FUSE") != "1":
        params = st.fuse_vocoder(params, cfg, quantize=True)
    kv_int8 = os.environ.get("BENCH_KV_INT8") == "1"
    opts = GenerateOptions(cfg_scale=1.5, ddpm_steps=5, max_length=2048, kv_int8=kv_int8)
    text_window_fn, speech_window_fn, single_frame_fn = st.make_window_fns(cfg, opts)

    prompt = np.random.RandomState(0).randint(10, 1000, (1, 64))
    preset = st.build_voice_preset(cfg, params, prompt, neg_prompt_id=151655, max_len=2048)

    text = jnp.asarray(np.random.RandomState(1).randint(10, 1000, (1, 5)), jnp.int32)
    valid = jnp.ones((1, 5), bool)

    # compile both stages
    state = st.init_stream_state(cfg, params, preset, 2048, kv_int8=kv_int8)
    state = text_window_fn(params, state, text, valid)
    state, audio, eos = single_frame_fn(params, state, jax.random.PRNGKey(1))
    np.asarray(audio)

    trials = int(os.environ.get("BENCH_TRIALS", "20"))
    ttfas = []
    for i in range(trials):
        state = st.init_stream_state(cfg, params, preset, 2048, kv_int8=kv_int8)
        np.asarray(state.tts_h)  # settle the fresh state on device before timing
        t0 = time.perf_counter()
        state = text_window_fn(params, state, text, valid)
        state, audio, eos = single_frame_fn(params, state, jax.random.PRNGKey(i))
        np.asarray(audio)  # audio delivered to host
        ttfas.append(time.perf_counter() - t0)

    p50 = float(np.median(ttfas) * 1000)
    print(
        json.dumps(
            {
                "metric": "TTFA_streaming_0.5B_p50",
                "value": round(p50, 2),
                "unit": "ms",
                "vs_baseline": round(300.0 / p50, 3),  # >1 means better than target
            }
        )
    )


def sessions_sweep():
    """Multi-session real-time capacity sweep (BENCH_SESSIONS=1): for each
    slot count N, run N concurrent sessions through the batched
    StreamingSessionEngine on the full-size 0.5B config and measure the
    6-frame window wall time (budget: 6*3200/24000 = 0.8 s of audio per
    window per session) and per-session TTFA with staggered admission.

    Prints one JSON line per N plus the headline: the max N where window p95
    fits the real-time budget AND TTFA p95 < 300 ms. The reference streaming
    model serves exactly ONE session per GPU (reference
    modeling_vibevoice_streaming_inference.py:511).

    Env: BENCH_SESSION_NS (slot counts), BENCH_SESSION_QUANTUM (admission
    quantum, default 3), BENCH_SESSION_KV8=1 (int8 KV), BENCH_SESSION_VOICES=V
    (V distinct presets round-robin — exercises the per-voice device-resident
    preset cache at capacity; default 1), BENCH_SESSION_FRAMES,
    BENCH_SESSION_SPACING_S."""
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    from vibevoice_tpu.configs import VibeVoiceStreamingConfig
    from vibevoice_tpu.models import streaming as st
    from vibevoice_tpu.models.inference import GenerateOptions
    from vibevoice_tpu.serving.streaming_sessions import StreamingSessionEngine

    cfg = VibeVoiceStreamingConfig.from_json_file(
        os.path.join(os.path.dirname(__file__), "vibevoice_tpu", "configs", "qwen2.5_0.5b_streaming.json")
    )
    params = st.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if os.environ.get("BENCH_NO_FUSE") != "1":
        params = st.fuse_vocoder(params, cfg, quantize=True)
    # BENCH_SESSION_KV8=1: int8 KV caches (the long-context memory knob;
    # costs quantize-on-write latency at short fills — not the default)
    kv8 = os.environ.get("BENCH_SESSION_KV8") == "1"
    opts = GenerateOptions(cfg_scale=1.5, ddpm_steps=5, kv_int8=kv8)
    prompt = np.random.RandomState(0).randint(10, 1000, (1, 64))
    preset = st.build_voice_preset(cfg, params, prompt, neg_prompt_id=151655, max_len=2048)
    # BENCH_SESSION_VOICES=V: V distinct voice presets (different prompt
    # lengths), sessions assigned round-robin — exercises the per-voice
    # device-resident preset cache + per-slot cache-length bookkeeping at
    # capacity (the default single-voice sweep always hits one cache entry)
    n_voices = int(os.environ.get("BENCH_SESSION_VOICES", "1"))
    presets = [preset] + [
        st.build_voice_preset(
            cfg, params,
            np.random.RandomState(100 + v).randint(10, 1000, (1, 48 + 16 * v)),
            neg_prompt_id=151655, max_len=2048,
        )
        for v in range(1, n_voices)
    ]

    quantum = int(os.environ.get("BENCH_SESSION_QUANTUM", "3"))
    budget_s = quantum * 3200 / 24000.0  # audio seconds produced per dispatch
    frames = int(os.environ.get("BENCH_SESSION_FRAMES", "120"))
    ns = [int(x) for x in os.environ.get("BENCH_SESSION_NS", "1,2,4,8,16").split(",")]
    rng = np.random.RandomState(7)
    headline = 0
    per_n = []
    for n in ns:
        eng = StreamingSessionEngine(
            cfg, params, n_slots=n, max_len=2048, opts=opts,
            default_preset=preset, ignore_eos=True, quantum=quantum,
        )
        try:
            # warm the compiled window programs + admit shape
            eng.submit(rng.randint(10, 1000, (40,)), max_new_frames=12).result(timeout=900)
            eng.window_times.clear()
            # staggered admission at ~2-window inter-arrival spacing: every
            # session's TTFA is the MARGINAL cost of joining a RUNNING loop
            # (the serving-realistic number; an all-at-once burst instead
            # serializes N admit dispatches ahead of the first window and
            # reports the burst drain, not per-session latency)
            # distinct-voice warm admits: first use of a voice pays its
            # host->device preset transfer; the sweep measures steady-state
            # (cache-hit) joins, like the single-voice path does
            for p in presets[1:]:
                eng.submit(rng.randint(10, 1000, (40,)), p, max_new_frames=6).result(
                    timeout=900
                )
            eng.window_times.clear()
            handles = []
            n_frames = max(frames, n * 24)  # lifetimes must span the arrival ramp
            for i in range(n):
                handles.append(
                    eng.submit(
                        rng.randint(10, 1000, (600,)),
                        presets[i % n_voices],
                        max_new_frames=n_frames,
                    )
                )
                time.sleep(float(os.environ.get("BENCH_SESSION_SPACING_S", "0.25")))
            for h in handles:
                h.result(timeout=900)
            wt = np.asarray(eng.window_times[2:])  # drop ramp-up windows
            ttfa = np.asarray([h.ttfa_ms for h in handles])
            w_p50, w_p95 = float(np.percentile(wt, 50)), float(np.percentile(wt, 95))
            t_p50, t_p95 = float(np.percentile(ttfa, 50)), float(np.percentile(ttfa, 95))
            rt_ok = w_p95 < budget_s and t_p95 < 300.0
            if rt_ok:
                headline = max(headline, n)
            per_n.append(dict(n=n, window_p50_ms=round(w_p50 * 1e3, 1),
                              window_p95_ms=round(w_p95 * 1e3, 1),
                              ttfa_p50_ms=round(t_p50, 1), ttfa_p95_ms=round(t_p95, 1),
                              realtime=bool(rt_ok)))
            suffix = ("_kv8" if kv8 else "") + (f"_v{n_voices}" if n_voices > 1 else "")
            print(json.dumps({"metric": f"streaming_sessions_n{n}" + suffix,
                              "value": round(w_p95 * 1e3, 1), "unit": "ms_window_p95",
                              "quantum_frames": quantum,
                              "budget_ms": round(budget_s * 1e3, 1),
                              "ttfa_p95_ms": round(t_p95, 1),
                              "realtime": bool(rt_ok)}))
        finally:
            eng.shutdown(drain=False)
    if len(ns) > 1:
        # "max sustained" is only meaningful over a sweep (the bench.py suite
        # records an 8,16,24 sweep); a single-point run reports just its point
        print(json.dumps({
            "metric": "streaming_realtime_sessions_max"
                      + (f"_v{n_voices}" if n_voices > 1 else ""),
            "value": headline,
            "unit": "concurrent_sessions_per_chip",
            # reference serves 1 session per device (batch-1 hard cap)
            "vs_baseline": float(headline),
            "detail": per_n,
        }))
    else:
        n, rec = ns[0], per_n[0] if per_n else None
        if rec:
            print(json.dumps({
                "metric": "streaming_realtime_sessions",
                "value": n if rec["realtime"] else 0,
                "unit": "concurrent_sessions_per_chip",
                # reference serves 1 session per device (batch-1 hard cap)
                "vs_baseline": float(n if rec["realtime"] else 0),
                "detail": per_n,
            }))


if __name__ == "__main__":
    if os.environ.get("BENCH_SESSIONS") == "1":
        sessions_sweep()
    else:
        main()
