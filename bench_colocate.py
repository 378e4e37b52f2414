"""Co-located deployment benchmark: real-time 0.5B sessions + bulk 1.5B
serving on ONE chip, one process — the `demo/serve.py --rt_sessions N`
production shape (both engines share the device; a v5e core executes
dispatched programs serially, so each side's latency includes the other's
in-flight work).

Measures, same-session:
  1. bulk alone        — ServingEngine aggregate RTF (control)
  2. sessions alone    — window/TTFA percentiles at N sessions (control)
  3. co-located        — both at once: do the sessions stay real-time, and
                         what does the bulk aggregate degrade to?

The interesting quantities are (3) vs (1)/(2): the bulk throughput cost of
keeping N listeners real-time, and the session-latency cost of filling the
chip's leftover cycles with bulk work. The reference cannot express this
shape at all (one model per process, batch-1 streaming:
/root/reference/vibevoice/modular/modeling_vibevoice_streaming_inference.py:511).

Env overrides:
  COLO_CONFIG=7b     7B bulk engine (int8 inline-init + int8 KV; the 1.5B
                     default otherwise). 7B K=8 dispatches are ~200 ms of
                     device time — the head-of-line blocking the sessions
                     must absorb; COLO_K trades bulk throughput for finer
                     interleave granularity.
  COLO_K=N           bulk frames per dispatch       (default 8)
  COLO_SLOTS=N       bulk engine slots              (default 4)
  COLO_REQS=N        bulk requests per phase        (default 3*slots)
  COLO_FRAMES=N      frames per bulk request        (default 256 ~ 34 s)
  COLO_SESSIONS=N    concurrent rt sessions         (default 8)
  COLO_SESSION_FRAMES=N  frames per session         (default 180 ~ 24 s)
  COLO_QUANTUM=N     session admission quantum      (default 3)

Prints one JSON line per phase (bench.py suite format)."""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    from vibevoice_tpu.configs import VibeVoiceConfig, VibeVoiceStreamingConfig
    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import streaming as st
    from vibevoice_tpu.models import vibevoice as vv
    from vibevoice_tpu.serving import Request, ServingEngine
    from vibevoice_tpu.serving.streaming_sessions import StreamingSessionEngine

    here = os.path.dirname(os.path.abspath(__file__))
    slots = int(os.environ.get("COLO_SLOTS", "4"))
    n_reqs = int(os.environ.get("COLO_REQS", str(3 * slots)))
    frames = int(os.environ.get("COLO_FRAMES", "256"))
    n_sessions = int(os.environ.get("COLO_SESSIONS", "8"))
    s_frames = int(os.environ.get("COLO_SESSION_FRAMES", "180"))
    quantum = int(os.environ.get("COLO_QUANTUM", "3"))
    k = int(os.environ.get("COLO_K", "8"))
    max_len = int(os.environ.get("COLO_MAX_LEN", "4096"))
    model = os.environ.get("COLO_CONFIG", "1.5b")  # "1.5b" | "7b"

    # ---- bulk engine: int8, the serving default ----
    kv_int8 = None
    if model == "7b":
        from bench import _load  # layer-by-layer inline int8 init (never bf16)

        cfg, params = _load("qwen2.5_7b_32k.json", lm_int8_inline=True)
        # bf16 KV is fine at <=4 slots/4K (the round-4b 20.9x config);
        # COLO_KV_INT8=1 for higher slot counts (the 8-slot memory rule)
        if os.environ.get("COLO_KV_INT8") == "1":
            kv_int8 = True
    else:
        cfg = VibeVoiceConfig.from_json_file(
            os.path.join(here, "vibevoice_tpu", "configs", "qwen2.5_1.5b_64k.json")
        )
        params = vv.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params = vv.quantize_for_inference(params, components=("lm", "lm_head"))
    params = vv.fuse_for_serving(params, cfg, quantize=True)
    tokens = inf.SpecialTokens()
    opts = inf.GenerateOptions(ddpm_steps=10, max_length=max_len, kv_int8=kv_int8)
    eng = ServingEngine(
        cfg, params, tokens=tokens, opts=opts, max_batch=slots,
        max_len=max_len, frames_per_dispatch=k, pipeline=True,
    )
    # random weights never argmax to speech_diffusion: force a diffusion
    # frame every step (identical device work — masks, not branches — but
    # audio flows every dispatch, exactly like a real serve); same device
    # as bench_serving.py
    init = jnp.asarray(
        np.random.RandomState(0).randn(256, slots, cfg.acoustic_vae_dim).astype(np.float32)
    )
    real = inf.make_multi_step_fn(cfg, tokens, opts, k, inject=True)
    forced = jnp.full((k, slots), tokens.speech_diffusion, jnp.int32)
    eng.step_fn = lambda p, c, key, ext: real(p, c, key, ext, {"forced": forced, "init": init})

    def make_request(seed):
        ids = np.random.RandomState(seed).randint(10, 1000, (1, 64)).astype(np.int64)
        ids[0, -1] = tokens.speech_start
        return Request(
            input_ids=ids, valid_mask=np.ones((1, 64), bool), seed=seed,
            max_length_times=frames / 64,
        )

    # ---- session engine: 0.5B streaming, fused vocoder ----
    scfg = VibeVoiceStreamingConfig.from_json_file(
        os.path.join(here, "vibevoice_tpu", "configs", "qwen2.5_0.5b_streaming.json")
    )
    sparams = st.init(jax.random.PRNGKey(1), scfg, dtype=jnp.bfloat16)
    sparams = st.fuse_vocoder(sparams, scfg, quantize=True)
    sopts = inf.GenerateOptions(cfg_scale=1.5, ddpm_steps=5)
    prompt = np.random.RandomState(0).randint(10, 1000, (1, 64))
    preset = st.build_voice_preset(scfg, sparams, prompt, neg_prompt_id=151655, max_len=2048)
    seng = StreamingSessionEngine(
        scfg, sparams, n_slots=n_sessions, max_len=2048, opts=sopts,
        default_preset=preset, ignore_eos=True, quantum=quantum,
    )
    budget_ms = quantum * 3200 / 24000.0 * 1e3

    rng = np.random.RandomState(7)

    def run_bulk():
        """Submit the bulk wave, return (rtf, wall_s, audio_s)."""
        t0 = time.perf_counter()
        handles = [eng.submit(make_request(1000 + i)) for i in range(n_reqs)]
        total = 0
        for h in handles:
            total += len(h.result(timeout=1800))
        wall = time.perf_counter() - t0
        audio = total / 24_000.0
        return audio / wall, wall, audio

    def run_sessions():
        """Staggered-join session wave, return (w_p50, w_p95, t_p50, t_p95, wall)."""
        eng_wt_start = len(seng.window_times)
        t0 = time.perf_counter()
        handles = []
        n_frames = max(s_frames, n_sessions * 24)
        for _ in range(n_sessions):
            handles.append(seng.submit(rng.randint(10, 1000, (600,)), max_new_frames=n_frames))
            time.sleep(0.25)
        for h in handles:
            h.result(timeout=900)
        wall = time.perf_counter() - t0
        wt = np.asarray(seng.window_times[eng_wt_start + 2:])  # drop ramp-up
        ttfa = np.asarray([h.ttfa_ms for h in handles])
        return (float(np.percentile(wt, 50) * 1e3), float(np.percentile(wt, 95) * 1e3),
                float(np.percentile(ttfa, 50)), float(np.percentile(ttfa, 95)), wall)

    try:
        # warm both engines: compile prefill + full-batch step (bulk), admit
        # + window programs (sessions)
        warm = [eng.submit(make_request(100 + i)) for i in range(slots)]
        for h in warm:
            h.result(timeout=1800)
        seng.submit(rng.randint(10, 1000, (40,)), max_new_frames=12).result(timeout=1800)

        # phase 1: bulk alone (control)
        bulk_rtf0, bulk_wall0, _ = run_bulk()

        # phase 2: sessions alone (control)
        sw50, sw95, st50, st95, sess_wall0 = run_sessions()

        # phase 3: co-located — bulk wave launched first, sessions join while
        # it runs; bulk work is sized to outlast the session wave so every
        # session window contends with bulk dispatches
        bulk_out = {}

        def bulk_thread():
            bulk_out["res"] = run_bulk()

        bt = threading.Thread(target=bulk_thread, daemon=True)
        bt.start()
        time.sleep(0.5)  # let the bulk wave occupy its slots first
        cw50, cw95, ct50, ct95, sess_wall = run_sessions()
        bt.join(timeout=1800)
        bulk_rtf, bulk_wall, bulk_audio = bulk_out["res"]
        overlap = min(bulk_wall, 0.5 + sess_wall) - 0.5
    finally:
        eng.shutdown()
        seng.shutdown(drain=False)

    rt_ok = cw95 < budget_ms and ct95 < 300.0
    print(json.dumps({
        "metric": f"colocated_sessions_n{n_sessions}_plus_{model}_{slots}slot_bulk"
                  + (f"_k{k}" if k != 8 else ""),
        "value": round(cw95, 1), "unit": "ms_window_p95",
        "budget_ms": round(budget_ms, 1), "realtime": bool(rt_ok),
        "ttfa_p50_ms": round(ct50, 1), "ttfa_p95_ms": round(ct95, 1),
        "solo_window_p95_ms": round(sw95, 1), "solo_ttfa_p95_ms": round(st95, 1),
        "window_p50_ms": round(cw50, 1), "solo_window_p50_ms": round(sw50, 1),
        "vs_baseline": float(n_sessions if rt_ok else 0),
    }))
    print(json.dumps({
        "metric": f"colocated_serving_aggregate_{model}_{slots}slot"
                  + (f"_k{k}" if k != 8 else ""),
        "value": round(bulk_rtf, 2), "unit": "audio-sec/wall-sec/chip",
        "vs_baseline": round(bulk_rtf / 5.0, 4),
        "solo_aggregate": round(bulk_rtf0, 2),
        "bulk_wall_sec": round(bulk_wall, 2),
        "session_overlap_sec": round(max(overlap, 0.0), 2),
        "audio_sec": round(bulk_audio, 2),
    }))


if __name__ == "__main__":
    main()
