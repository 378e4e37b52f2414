"""Sustained co-located soak: minutes of churning bulk requests + rt session
joins/leaves/cancels against BOTH engines in one process (the
`serve.py --rt_sessions` production shape). bench_colocate.py measures one
clean wave; this drives continuous ragged traffic — random lengths, random
voices, random mid-stream cancels — and asserts NOTHING fails: every request
ends in completed or cancelled, no handle hangs, both engines drain cleanly.

Env:
  SOAK_S=600            soak duration (seconds of submitted traffic)
  SOAK_BULK_WORKERS=5   concurrent bulk submitters (4-slot engine: keeps the
                        queue non-empty without unbounded backlog)
  SOAK_SESS_WORKERS=6   concurrent session clients (8-slot session engine)
  SOAK_CANCEL_PCT=15    chance a client cancels its request mid-stream

Exit 0 + one JSON summary line on success; exit 1 with the first error on
any failed request or hung handle."""

import json
import os
import random
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    soak_s = float(os.environ.get("SOAK_S", "600"))
    n_bulk = int(os.environ.get("SOAK_BULK_WORKERS", "5"))
    n_sess = int(os.environ.get("SOAK_SESS_WORKERS", "6"))
    cancel_pct = float(os.environ.get("SOAK_CANCEL_PCT", "15")) / 100.0
    slots, k, max_len = 4, 8, 4096

    # ---- bulk engine: 1.5B int8 (same construction as bench_colocate) ----
    cfg = VibeVoiceConfig.from_json_file(
        os.path.join(here, "vibevoice_tpu", "configs", "qwen2.5_1.5b_64k.json")
    )
    params = vv.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = vv.quantize_for_inference(params, components=("lm", "lm_head"))
    params = vv.fuse_for_serving(params, cfg, quantize=True)
    tokens = inf.SpecialTokens()
    opts = inf.GenerateOptions(ddpm_steps=10, max_length=max_len)
    eng = ServingEngine(
        cfg, params, tokens=tokens, opts=opts, max_batch=slots,
        max_len=max_len, frames_per_dispatch=k, pipeline=True,
    )
    init = jnp.asarray(
        np.random.RandomState(0).randn(256, slots, cfg.acoustic_vae_dim).astype(np.float32)
    )
    real = inf.make_multi_step_fn(cfg, tokens, opts, k, inject=True)
    forced = jnp.full((k, slots), tokens.speech_diffusion, jnp.int32)
    eng.step_fn = lambda p, c, key, ext: real(p, c, key, ext, {"forced": forced, "init": init})

    # ---- session engine: 0.5B, 3 distinct voices ----
    scfg = VibeVoiceStreamingConfig.from_json_file(
        os.path.join(here, "vibevoice_tpu", "configs", "qwen2.5_0.5b_streaming.json")
    )
    sparams = st.init(jax.random.PRNGKey(1), scfg, dtype=jnp.bfloat16)
    sparams = st.fuse_vocoder(sparams, scfg, quantize=True)
    sopts = inf.GenerateOptions(cfg_scale=1.5, ddpm_steps=5)
    presets = [
        st.build_voice_preset(
            scfg, sparams,
            np.random.RandomState(v).randint(10, 1000, (1, 48 + 16 * v)),
            neg_prompt_id=151655, max_len=2048,
        )
        for v in range(3)
    ]
    seng = StreamingSessionEngine(
        scfg, sparams, n_slots=8, max_len=2048, opts=sopts,
        default_preset=presets[0], ignore_eos=True, quantum=3,
    )

    counts = {"bulk_completed": 0, "bulk_cancelled": 0, "bulk_failed": 0,
              "sess_completed": 0, "sess_cancelled": 0, "sess_failed": 0}
    lock = threading.Lock()
    errors = []
    stop_at = [0.0]  # set after warmup

    def tally(key_):
        with lock:
            counts[key_] += 1

    def bulk_worker(wid):
        rng = random.Random(1000 + wid)
        while time.monotonic() < stop_at[0]:
            frames = rng.randint(48, 256)
            ids = np.random.RandomState(rng.randint(0, 1 << 30)).randint(
                10, 1000, (1, 64)).astype(np.int64)
            ids[0, -1] = tokens.speech_start
            h = eng.submit(Request(
                input_ids=ids, valid_mask=np.ones((1, 64), bool),
                seed=wid, max_length_times=frames / 64,
            ))
            do_cancel = rng.random() < cancel_pct
            if do_cancel:
                time.sleep(rng.uniform(0.1, 1.0))
                h.cancel()
            try:
                h.result(timeout=900)
                tally("bulk_cancelled" if do_cancel else "bulk_completed")
            except Exception as e:  # noqa: BLE001 — soak: categorize everything
                if do_cancel:
                    tally("bulk_cancelled")  # cancel may surface as an error result
                else:
                    tally("bulk_failed")
                    errors.append(f"bulk[{wid}]: {type(e).__name__}: {e}")

    def sess_worker(wid):
        rng = random.Random(2000 + wid)
        while time.monotonic() < stop_at[0]:
            frames = rng.randint(36, 180)
            text = np.random.RandomState(rng.randint(0, 1 << 30)).randint(10, 1000, (600,))
            h = seng.submit(text, presets[rng.randrange(3)], max_new_frames=frames)
            do_cancel = rng.random() < cancel_pct
            if do_cancel:
                time.sleep(rng.uniform(0.1, 1.5))
                h.cancel()
            try:
                h.result(timeout=900)
                tally("sess_cancelled" if do_cancel else "sess_completed")
            except Exception as e:  # noqa: BLE001
                if do_cancel:
                    tally("sess_cancelled")
                else:
                    tally("sess_failed")
                    errors.append(f"sess[{wid}]: {type(e).__name__}: {e}")

    rc = 1
    try:
        # warmup both engines (compile outside the soak clock)
        ids = np.random.RandomState(9).randint(10, 1000, (1, 64)).astype(np.int64)
        ids[0, -1] = tokens.speech_start
        warm = [eng.submit(Request(input_ids=ids, valid_mask=np.ones((1, 64), bool),
                                   seed=i, max_length_times=1.0))
                for i in range(slots)]
        for h in warm:
            h.result(timeout=1800)
        for p in presets:
            seng.submit(np.arange(40) + 10, p, max_new_frames=6).result(timeout=1800)
        seng.window_times.clear()

        t0 = time.monotonic()
        stop_at[0] = t0 + soak_s
        workers = [threading.Thread(target=bulk_worker, args=(i,), daemon=True)
                   for i in range(n_bulk)]
        workers += [threading.Thread(target=sess_worker, args=(i,), daemon=True)
                    for i in range(n_sess)]
        for w in workers:
            w.start()
        for w in workers:
            # generous join: last submits land just under the deadline and
            # must still finish; a hung handle trips this and fails the soak
            w.join(timeout=soak_s + 900)
            if w.is_alive():
                errors.append("worker did not finish: hung handle")
        wall = time.monotonic() - t0

        eng.shutdown(drain=True)
        seng.shutdown(drain=True, timeout=300)

        wt = np.asarray(seng.window_times) if seng.window_times else np.zeros(1)
        est = eng.stats()
        ok = not errors and counts["bulk_failed"] == 0 and counts["sess_failed"] == 0
        rc = 0 if ok else 1
        print(json.dumps({
            "metric": "soak_colocated",
            "value": round(wall, 1), "unit": "s",
            "ok": ok,
            **counts,
            "session_window_p95_ms": round(float(np.percentile(wt, 95)) * 1e3, 1),
            "bulk_audio_seconds": round(est.audio_seconds_emitted, 1),
            "bulk_ttfa_p95_ms": round(est.ttfa_p95_ms, 1) if est.ttfa_p95_ms else None,
            "errors": errors[:5],
        }))
    finally:
        # idempotent: already shut down on the happy path
        eng.shutdown()
        seng.shutdown(drain=False)
    sys.exit(rc)


if __name__ == "__main__":
    main()
