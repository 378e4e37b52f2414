"""Serving-engine throughput benchmark: continuous batching on one chip.

End-to-end serving RTF: N concurrent requests through the ServingEngine
(prefill on its own thread, K-frame-dispatch decode, per-dispatch host audio
fetch + streamer delivery, ragged admission/finish). Unlike bench.py — which
times the bare device step — this number includes everything a real server
pays between the HTTP layer and the chip.

Random weights never argmax to speech_diffusion, so the engine's step fn is
swapped for the inject-mode step forcing a diffusion frame every step. The
fused step computes identical work regardless of the token chosen
(masks-not-branches), but forcing makes audio fetch + delivery happen every
dispatch, exactly like a real serve.

Env overrides:
  BENCH_CONFIG=7b  serve the 7B config (int8 LM inline-quantized at init —
                   the bf16 7B LM must never materialize on a 16 GB chip;
                   incompatible with BENCH_BF16=1)
  BENCH_BF16=1     bf16 LM instead of the int8 serving default
  BENCH_KV_INT8=1  force the int8 KV cache (default: tri-state auto policy,
                   off below 16K slots) — the 7B memory knob at high slot
                   counts (8 bf16-KV slots + staged prefill carries OOM 16 GB)
  BENCH_SLOTS=N    engine max_batch            (default 4)
  BENCH_REQS=N     total requests submitted    (default 2*slots)
  BENCH_K=N        frames per dispatch         (default 8)
  BENCH_MAX_LEN=N  KV cache length             (default 4096)
  BENCH_PROMPT=N   prompt tokens per request   (default 64; generation is
                   held at ~128 frames regardless, so larger prompts stress
                   the prefill thread, not the decode volume)
  BENCH_FRAMES=N   frames generated per request (default 128 ~ 17 s of
                   audio; larger values amortize slot-turnover idle — a
                   freed slot sits empty ~1.5 dispatch windows because the
                   pipelined loop learns of a finish one fetch late — so
                   long streams expose the steady-state engine efficiency,
                   short ones the admission overhead)
  BENCH_NO_PIPELINE=1  sequential fetch (latency mode: with BENCH_K=1 and
                   BENCH_REQS=1 this measures single-stream serving TTFA)
  BENCH_PRIORITY=N reserve N express slots (engine reserved_slots=N) and,
                   while the bulk load runs, submit 3 staggered
                   Request(priority=True) requests; emits a second line with
                   their TTFA p50/max vs the bulk ttfa_p50 — the measured
                   cost/benefit of the latency lane (bulk throughput drops
                   toward the (slots-N)-slot aggregate)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5.0 (BASELINE.md: >=5x realtime per chip).
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

    from vibevoice_tpu.configs import VibeVoiceConfig
    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import vibevoice as vv
    from vibevoice_tpu.serving import Request, ServingEngine

    slots = int(os.environ.get("BENCH_SLOTS", "4"))
    n_reqs = int(os.environ.get("BENCH_REQS", str(2 * slots)))
    k = int(os.environ.get("BENCH_K", "8"))
    max_len = int(os.environ.get("BENCH_MAX_LEN", "4096"))
    use_int8 = os.environ.get("BENCH_BF16") != "1"

    model = os.environ.get("BENCH_CONFIG", "1.5b")  # "1.5b" | "7b"
    if model == "7b":
        if not use_int8:
            raise SystemExit("BENCH_CONFIG=7b requires int8 (bf16 7B LM is ~14 GB)")
        from bench import _load  # layer-by-layer inline int8 init (never bf16)

        cfg, params = _load("qwen2.5_7b_32k.json", lm_int8_inline=True)
    else:
        cfg = VibeVoiceConfig.from_json_file(
            os.path.join(
                os.path.dirname(__file__), "vibevoice_tpu", "configs", "qwen2.5_1.5b_64k.json"
            )
        )
        params = vv.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        if use_int8:
            params = vv.quantize_for_inference(params, components=("lm", "lm_head"))
    params = vv.fuse_for_serving(params, cfg, quantize=use_int8)

    tokens = inf.SpecialTokens()
    # BENCH_KV_INT8=1 forces the int8 KV cache (otherwise the tri-state auto
    # policy: off below 16K slots). Memory knob for 7B at high slot counts —
    # each staged prefill carry holds a full batch-2 x max_len cache.
    kv_int8 = True if os.environ.get("BENCH_KV_INT8") == "1" else None
    opts = inf.GenerateOptions(ddpm_steps=10, max_length=max_len, kv_int8=kv_int8)
    pipeline = os.environ.get("BENCH_NO_PIPELINE") != "1"
    reserved = int(os.environ.get("BENCH_PRIORITY", "0"))
    eng = ServingEngine(
        cfg,
        params,
        tokens=tokens,
        opts=opts,
        max_batch=slots,
        max_len=max_len,
        frames_per_dispatch=k,
        pipeline=pipeline,
        reserved_slots=reserved,
    )

    # Force speech_diffusion every frame (see module docstring): same device
    # work as the production step, but audio flows every dispatch.
    init = jnp.asarray(
        np.random.RandomState(0).randn(256, slots, cfg.acoustic_vae_dim).astype(np.float32)
    )
    if k > 1:
        real = inf.make_multi_step_fn(cfg, tokens, opts, k, inject=True)
        forced = jnp.full((k, slots), tokens.speech_diffusion, jnp.int32)
    else:
        real = inf.make_step_fn(cfg, tokens, opts, inject=True)
        forced = jnp.full((slots,), tokens.speech_diffusion, jnp.int32)
    eng.step_fn = lambda p, c, key, ext: real(p, c, key, ext, {"forced": forced, "init": init})

    prompt = int(os.environ.get("BENCH_PROMPT", "64"))
    frames = int(os.environ.get("BENCH_FRAMES", "128"))  # ~17 s of audio at 7.5 Hz

    def make_request(seed, priority=False):
        ids = np.random.RandomState(seed).randint(10, 1000, (1, prompt)).astype(np.int64)
        ids[0, -1] = tokens.speech_start
        return Request(
            input_ids=ids,
            valid_mask=np.ones((1, prompt), bool),
            seed=seed,
            max_length_times=frames / prompt,
            priority=priority,
        )

    try:
        # warmup: compile prefill (prompt bucket) + the K-frame step at full
        # batch, then drain
        warm = [eng.submit(make_request(100 + i)) for i in range(slots)]
        for h in warm:
            h.result(timeout=1800)

        import threading

        ttfa = {}

        def consume(idx, h, t_submit):
            for _ in h.stream():
                ttfa[idx] = time.perf_counter() - t_submit
                break

        t0 = time.perf_counter()
        handles, watchers = [], []
        for i in range(n_reqs):
            h = eng.submit(make_request(i))
            w = threading.Thread(target=consume, args=(i, h, time.perf_counter()), daemon=True)
            w.start()
            handles.append(h)
            watchers.append(w)
        pri_ttfa, pri_handles = {}, []
        if reserved:
            # 3 staggered priority arrivals while the bulk queue is full: the
            # latency-lane claim is their TTFA under load, not in isolation.
            # Submitted from their own thread so the 2 s staggers never sit
            # in the bulk-wall measurement (an earlier version slept on the
            # main thread before result collection and billed ~6 s of sleep
            # as serving time).
            def submit_priority():
                for j in range(3):
                    time.sleep(2.0)
                    hp = eng.submit(make_request(1000 + j, priority=True))
                    wp = threading.Thread(
                        target=consume, args=(f"p{j}", hp, time.perf_counter()),
                        daemon=True,
                    )
                    wp.start()
                    pri_handles.append(hp)
                    watchers.append(wp)

            pt = threading.Thread(target=submit_priority, daemon=True)
            pt.start()
        # In priority mode the aggregate is computed over the BULK requests
        # only (t0 -> last bulk completion): the priority streams share the
        # device, so their cost shows up in the bulk wall — but the 2 s
        # arrival staggers must not be billed as serving time (they sit
        # inside the window while bulk decode proceeds underneath).
        total_samples = 0
        for h in handles:
            audio = h.result(timeout=1800)
            total_samples += len(audio)
        wall = time.perf_counter() - t0
        if reserved:
            pt.join(timeout=60)
        for hp in pri_handles:
            hp.result(timeout=1800)
        for w in watchers:
            w.join(timeout=10)
        if reserved:
            pri_ttfa = {kk: v for kk, v in ttfa.items() if isinstance(kk, str)}
            ttfa = {kk: v for kk, v in ttfa.items() if not isinstance(kk, str)}
    finally:
        eng.shutdown()

    audio_sec = total_samples / 24_000.0
    rtf = audio_sec / wall
    suffix = "" if use_int8 else "_bf16"
    if kv_int8:
        suffix += "_kv8"
    if not pipeline:
        suffix += "_nopipe"
    if reserved:
        suffix += f"_r{reserved}"
    if frames != 128:
        suffix += f"_f{frames}"
    print(
        json.dumps(
            {
                "metric": f"SERVE_{model.upper()}_{slots}slot_{n_reqs}req_k{k}_p{prompt}{suffix}",
                "value": round(rtf, 4),
                "unit": "audio-sec/wall-sec/chip",
                "vs_baseline": round(rtf / 5.0, 4),
                "audio_sec": round(audio_sec, 2),
                "wall_sec": round(wall, 2),
                # submit -> first audio chunk (includes queueing behind the
                # prefill thread and K-frame + pipeline delivery granularity)
                "ttfa_p50_ms": round(
                    sorted(ttfa.values())[len(ttfa) // 2] * 1e3, 1
                ) if ttfa else None,
                # first request sees no queueing: the single-stream TTFA
                "ttfa_min_ms": round(min(ttfa.values()) * 1e3, 1) if ttfa else None,
            }
        )
    )
    if reserved and pri_ttfa:
        vals = sorted(pri_ttfa.values())
        print(
            json.dumps(
                {
                    "metric": f"SERVE_priority_ttfa_under_load_{slots}slot{suffix}",
                    "value": round(vals[len(vals) // 2] * 1e3, 1),
                    "unit": "ms_p50",
                    "max_ms": round(vals[-1] * 1e3, 1),
                    # the bulk queue's TTFA p50 under the same load = what the
                    # lane saves; the aggregate line above = what it costs
                    "bulk_ttfa_p50_ms": round(
                        sorted(ttfa.values())[len(ttfa) // 2] * 1e3, 1
                    ) if ttfa else None,
                    "vs_baseline": 1.0,
                }
            )
        )


if __name__ == "__main__":
    main()
