"""Full-length long-form rehearsal: ONE real `generate()` run that fills the
entire 64K cache (BASELINE config 3; the reference's "~90 min" headline,
reference README.md:21,54).

Unlike bench.py's long-form line (prefill + midpoint-fill extrapolation),
this drives the ACTUAL host loop end-to-end: 8K-token synthetic prompt →
chunked prefill → ~57K forced-diffusion frames (≈127 minutes of audio) with
speech_end/speech_start segment boundaries every ~3000 frames so the
negative-stream reset and conv-state reset bookkeeping are exercised at
40K+ steps. Records the RTF trajectory vs cache fill (decode slows as the
flash kernel's valid prefix grows), peak HBM when the backend reports it,
and end-of-run bookkeeping invariants.

Env: BENCH_CONFIG=7b (the 7B @ 32K rehearsal: inline int8 LM + int8 KV — the
reference's "~45 min" 7B claim, reference README.md:55), BENCH_MAX_LEN
(default 65536; 32768 at 7B), BENCH_PROMPT (8192), BENCH_SEGMENT (3000),
BENCH_BF16=1 (1.5b only), BENCH_KV_INT8 (default on — the auto policy).

Prints one JSON headline line + a trajectory line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


class _TrajectoryStreamer:
    """AudioStreamer-shaped sink that records (wall time, frames delivered)
    and drops the audio (57K frames would be ~730 MB host-side)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.marks = []  # (seconds since start, total frames)
        self.frames = 0
        self.finished_flags = [False]

    def put(self, frames, indices):
        self.frames += len(frames)
        self.marks.append((time.perf_counter() - self.t0, self.frames))

    def end(self, indices=None):
        pass


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax

    from bench import _load  # same inline-int8-aware loader as the main bench
    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import vibevoice as vv

    model = os.environ.get("BENCH_CONFIG", "1.5b")  # "1.5b" | "7b"
    max_len = int(
        os.environ.get("BENCH_MAX_LEN", "32768" if model == "7b" else "65536")
    )
    prompt_len = int(os.environ.get("BENCH_PROMPT", "8192"))
    segment = int(os.environ.get("BENCH_SEGMENT", "3000"))
    use_int8 = os.environ.get("BENCH_BF16") != "1"
    kv_int8 = os.environ.get("BENCH_KV_INT8", "1") == "1"

    if model == "7b":
        if not use_int8:
            raise SystemExit("BENCH_CONFIG=7b requires int8 (bf16 7B LM is ~14 GB)")
        # inline int8 init: the 7B bf16 LM must never materialize on 16 GB
        cfg, params = _load("qwen2.5_7b_32k.json", lm_int8_inline=True)
    else:
        cfg, params = _load("qwen2.5_1.5b_64k.json")
        if use_int8:
            params = vv.quantize_for_inference(params)
    if os.environ.get("BENCH_NO_FUSE") != "1":
        params = vv.fuse_for_serving(params, cfg, quantize=use_int8)

    tokens = inf.SpecialTokens()
    ids = np.full((1, prompt_len), 30, np.int64)
    ids[0, -1] = tokens.speech_start

    gen_frames = max_len - prompt_len
    # forced script: diffusion frames with segment boundaries — each boundary
    # is <speech_end> then <speech_start> (resets negative stream + conv
    # states, reference :542-546), exercising the bookkeeping all the way up
    forced = np.full((gen_frames, 1), tokens.speech_diffusion, np.int32)
    for s in range(segment, gen_frames - 2, segment):
        forced[s, 0] = tokens.speech_end
        forced[s + 1, 0] = tokens.speech_start

    opts = inf.GenerateOptions(
        ddpm_steps=10,
        max_length=max_len,
        max_length_times=float(max_len) / prompt_len + 1,
        frames_per_dispatch=8,
        kv_int8=kv_int8,
    )

    # warmup: a tiny bounded generate() pays the one-time jit trace + compile
    # (~2 min at 1.5B on the remote tunnel) outside the timed run — the
    # metric is generation speed, not first-call latency
    # (same max_length -> same compiled cache shapes; the 16/prompt ratio
    # bounds the warmup at 16 frames via the max_length_times cap)
    warm_opts = inf.GenerateOptions(
        ddpm_steps=10, max_length=max_len, max_length_times=16.0 / prompt_len,
        frames_per_dispatch=8, kv_int8=kv_int8,
    )
    inf.generate(
        cfg, params, input_ids=ids, tokens=tokens, opts=warm_opts, seed=0,
        forced_tokens=forced[:16],
    )

    streamer = _TrajectoryStreamer()
    t0 = time.perf_counter()
    out = inf.generate(
        cfg,
        params,
        input_ids=ids,
        tokens=tokens,
        opts=opts,
        seed=0,
        audio_streamer=streamer,
        forced_tokens=forced,
    )
    wall = time.perf_counter() - t0

    n_frames = streamer.frames
    audio_sec = n_frames * 3200 / 24_000
    rtf = audio_sec / wall

    # bookkeeping invariants after 40K+ steps
    seq = out.sequences[0]
    gen = seq[prompt_len:]
    n_diffusion = int((gen == tokens.speech_diffusion).sum())
    assert n_frames == n_diffusion, (n_frames, n_diffusion)
    # ended at the GLOBAL cache bound: the sequence fills max_len exactly
    # (the global bound intentionally does not set reach_max_step_sample —
    # that flag is the PER-SAMPLE cap, inference.py host loop)
    assert seq.shape[0] == max_len, (seq.shape[0], max_len)
    assert not bool((gen == tokens.eos).any())  # never chose EOS (forced)

    # RTF trajectory vs fill: per ~4K-frame block
    marks = np.asarray(streamer.marks)
    traj = []
    block = 4096
    for b0 in range(0, n_frames - block // 2, block):
        sel = (marks[:, 1] > b0) & (marks[:, 1] <= b0 + block)
        if sel.sum() < 2:
            continue
        seg_t = marks[sel][-1, 0] - marks[sel][0, 0]
        seg_f = marks[sel][-1, 1] - marks[sel][0, 1]
        traj.append(
            {
                "fill": int(prompt_len + b0 + block // 2),
                "rtf": round(seg_f * 3200 / 24_000 / seg_t, 2),
            }
        )

    hbm_peak = None
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms:
            hbm_peak = int(ms.get("peak_bytes_in_use", 0))
    except Exception:
        pass

    suffix = "" if use_int8 else "_bf16"
    print(
        json.dumps(
            {
                "metric": f"RTF_{model.upper()}_longform_full{max_len // 1024}k_e2e{suffix}",
                "value": round(rtf, 4),
                "unit": "audio-sec/wall-sec/chip",
                "vs_baseline": round(rtf / 5.0, 4),
                "frames": n_frames,
                "audio_minutes": round(audio_sec / 60, 1),
                "wall_minutes": round(wall / 60, 1),
                "hbm_peak_gb": round(hbm_peak / 2**30, 2) if hbm_peak else None,
            }
        )
    )
    print(json.dumps({"metric": "longform_rtf_trajectory", "blocks": traj}))


if __name__ == "__main__":
    main()
