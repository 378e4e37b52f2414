"""Benchmark: single-chip real-time factor of VibeVoice-1.5B synthesis.

Measures the steady-state fused decode step (LM step + CFG diffusion scan +
streaming vocoder + semantic re-encode) on the flagship 1.5B config with
random weights, 10 DDPM steps (the file-CLI default, reference
demo/inference_from_file.py:365). One 7.5 Hz frame = 3200 samples of 24 kHz
audio, so RTF = (3200/24000) / step_time.

The headline config is weight-only int8 LM + lm_head (parity-tested in
tests/test_flash_attention.py and tests/test_generate.py), batch 1 — the
repo's best honest single-stream serving config. Env overrides:

  BENCH_BF16=1           bench the bf16 path instead of int8
  BENCH_KV_INT8=1        int8 KV cache (per-row scales; halves KV HBM bytes —
                         the 7B @ 32K single-chip config)
  BENCH_BATCH=N          batch size (default 1)
  BENCH_MAX_LEN=N        KV cache length (default 4096; 65536 = 64K config)
  BENCH_PREFILL=N        ALSO run an N-token chunked prefill and fold its
                         cost into a long-form RTF line
  BENCH_ALL=1            print extra config lines (bs4, bf16) after the
                         headline; the FIRST line remains the headline

Prints ONE JSON line (first): {"metric", "value", "unit", "vs_baseline"}
where vs_baseline is value / 5.0 (BASELINE.md target: >=5x realtime/chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load(cfg_name="qwen2.5_1.5b_64k.json", lm_int8_inline=False):
    """lm_int8_inline: initialise the LM layer-by-layer straight into int8
    (7B bf16 is ~14 GB — it cannot coexist with its int8 copy on a 16 GB
    v5e, so the quantized model must never materialise the bf16 LM)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.configs import VibeVoiceConfig
    from vibevoice_tpu.models import qwen2
    from vibevoice_tpu.models import vibevoice as vv
    from vibevoice_tpu.ops.quant import quantize_weight

    cfg = VibeVoiceConfig.from_json_file(
        os.path.join(os.path.dirname(__file__), "vibevoice_tpu", "configs", cfg_name)
    )
    if not lm_int8_inline:
        return cfg, vv.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    dc = cfg.decoder_config
    small = dataclasses.replace(dc, num_hidden_layers=0)
    small_cfg = dataclasses.replace(cfg, decoder_config=small)
    params = vv.init(jax.random.PRNGKey(0), small_cfg, dtype=jnp.bfloat16)

    h, i = dc.hidden_size, dc.intermediate_size
    kh = dc.num_key_value_heads * dc.head_dim
    key = jax.random.PRNGKey(7)
    # BENCH_INT4=1: experimental int4 LM storage probe (perf only — per-channel
    # int4 is not accuracy-qualified; see quantize_weight bits=4)
    bits = 4 if os.environ.get("BENCH_INT4") == "1" else 8

    def qlin(k, cin, cout, bias=False):
        w = jax.random.normal(k, (cin, cout), jnp.bfloat16) * dc.initializer_range
        p = quantize_weight(w, bits=bits)
        jax.block_until_ready(p)  # free the bf16 draw before the next one
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.bfloat16)
        return p

    layers = []
    for _ in range(dc.num_hidden_layers):
        key, *ks = jax.random.split(key, 8)
        layers.append(
            {
                "input_norm": {"w": jnp.ones((h,), jnp.bfloat16)},
                "attn": {
                    "q": qlin(ks[0], h, h, bias=True),
                    "k": qlin(ks[1], h, kh, bias=True),
                    "v": qlin(ks[2], h, kh, bias=True),
                    "o": qlin(ks[3], h, h),
                },
                "post_norm": {"w": jnp.ones((h,), jnp.bfloat16)},
                "mlp": {
                    "gate": qlin(ks[4], h, i),
                    "up": qlin(ks[5], h, i),
                    "down": qlin(ks[6], i, h),
                },
            }
        )
    params["lm"]["layers"] = layers
    # untied 7B lm_head: its own quantized (H, V) projection
    params["lm_head_q"] = quantize_weight(
        jax.random.normal(key, (h, dc.vocab_size), jnp.bfloat16) * dc.initializer_range,
        bits=bits,
    )
    params.pop("lm_head", None)
    return cfg, params


def run_decode(
    cfg, params, *, batch, max_len, ddpm_steps=10, frames_per_dispatch=8, steps=32, fill=0,
    kv_int8=False,
):
    """Steady-state decode RTF (audio-sec per wall-sec per chip).

    `fill` pre-sets the positive-stream cache length so the flash kernel's
    valid-prefix reads are costed at a realistic long-form fill level (decode
    cost grows with generated length; measuring at length~0 flatters RTF)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import qwen2
    from vibevoice_tpu.models import tokenizer as tok

    dtype = jnp.bfloat16
    tokens = inf.SpecialTokens()
    opts = inf.GenerateOptions(
        ddpm_steps=ddpm_steps, max_length=max_len, frames_per_dispatch=frames_per_dispatch,
        kv_int8=kv_int8,
    )
    step = inf.make_multi_step_fn(cfg, tokens, opts, frames_per_dispatch)

    cache = qwen2.make_cache(cfg.decoder_config, 2 * batch, max_len, dtype, quantized=kv_int8)
    if fill:
        # positive rows at `fill`; negative rows stay short (they reset at
        # segment starts, so their live prefix is frames-since-speech_start)
        length = jnp.concatenate(
            [jnp.full((batch,), fill, jnp.int32), jnp.full((batch,), 64, jnp.int32)]
        )
        cache = cache._replace(length=length)
    carry = inf.DecodeCarry(
        cache=cache,
        dec_state=tok.init_decoder_state(cfg.acoustic_tokenizer_config, batch, dtype),
        sem_state=tok.init_encoder_state(cfg.semantic_tokenizer_config, batch, dtype),
        h_pos=jnp.zeros((batch, cfg.decoder_config.hidden_size), dtype),
        h_neg=jnp.zeros((batch, cfg.decoder_config.hidden_size), dtype),
        finished=jnp.zeros((batch,), bool),
        n_diff=jnp.zeros((batch,), jnp.int32),
    )
    ext = jnp.zeros((frames_per_dispatch, batch), bool)
    key = jax.random.PRNGKey(1)

    for _ in range(2):  # warmup / compile
        key, sk = jax.random.split(key)
        carry, out = step(params, carry, sk, ext)
    jax.block_until_ready(out.audio)

    n_dispatch = max(1, steps // frames_per_dispatch)
    # best of 2 steady-state passes: the remote-tunnel transport adds
    # occasional multi-ms hiccups; the faster pass is the honest steady state
    wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            key, sk = jax.random.split(key)
            carry, out = step(params, carry, sk, ext)
        # force a real device round-trip (block_until_ready alone can return
        # early through remote-tunnel transports)
        np.asarray(out.audio).sum()
        wall = min(wall, time.perf_counter() - t0)

    frame_sec = 3200 / 24_000
    audio_sec = n_dispatch * frames_per_dispatch * frame_sec * batch
    return audio_sec / wall, wall / (n_dispatch * frames_per_dispatch)


def run_prefill(cfg, params, *, prompt_len, max_len, chunk=2048, kv_int8=False):
    """Chunked-prefill wall time for a prompt_len prompt (64K long-form)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.models import inference as inf

    tokens = inf.SpecialTokens()
    ids = np.full((1, prompt_len), 30, np.int64)
    ids[:, -1] = tokens.speech_start
    valid = jnp.ones((1, prompt_len), bool)

    def go():
        # text-only prompt: no speech_args (chunked_prefill's 7th parameter is
        # speech_args since the key param was removed — tests/test_bench_plumbing.py
        # pins this signature so drift can't silently kill the record again)
        carry = inf.chunked_prefill(
            cfg, params, jnp.asarray(ids, jnp.int32), valid, max_len, tokens, chunk=chunk,
            kv_int8=kv_int8,
        )
        np.asarray(carry.h_pos).sum()
        return carry

    go()  # compile
    t0 = time.perf_counter()
    go()
    return time.perf_counter() - t0


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    t_start = time.perf_counter()
    # Total-suite wall budget: the driver runs `python bench.py` under an
    # external timeout (BENCH_r04 was killed at rc=124 with the serving and
    # session lines unemitted). Stages check the remaining budget and are
    # skipped (with a stderr note) rather than letting the whole record die.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))

    def remaining():
        return budget_s - (time.perf_counter() - t_start)
    from vibevoice_tpu.models import vibevoice as vv

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    # 128 frames per timed pass: at 32 the single end-of-pass device fetch
    # (~25-50 ms transport RTT) under-reported steady-state RTF by ~15%
    steps = int(os.environ.get("BENCH_STEPS", "128"))
    max_len = int(os.environ.get("BENCH_MAX_LEN", "4096"))
    ddpm_steps = int(os.environ.get("BENCH_DDPM_STEPS", "10"))
    frames_per_dispatch = int(os.environ.get("BENCH_FRAMES_PER_DISPATCH", "8"))
    use_int8 = os.environ.get("BENCH_BF16") != "1"
    model = os.environ.get("BENCH_CONFIG", "1.5b")  # "1.5b" | "7b"
    cfg_file = {"1.5b": "qwen2.5_1.5b_64k.json", "7b": "qwen2.5_7b_32k.json"}[model]

    # 7B int8 must never materialise the bf16 LM (see _load)
    inline = use_int8 and model == "7b"
    if os.environ.get("BENCH_INT4") == "1" and not inline:
        # bits=4 is applied only on the inline-quantizing 7B loader — anywhere
        # else the _int4probe label would lie about what ran
        raise SystemExit("BENCH_INT4=1 requires BENCH_CONFIG=7b without BENCH_BF16")
    cfg, params = _load(cfg_file, lm_int8_inline=inline)
    if use_int8 and not inline:
        components = ["lm", "lm_head"]
        if os.environ.get("BENCH_INT8_HEAD") == "1":
            components.append("diffusion_head")
        if os.environ.get("BENCH_INT8_TOK") == "1":
            components.append("tokenizers")
        params = vv.quantize_for_inference(params, components=tuple(components))
    if os.environ.get("BENCH_NO_FUSE") != "1":
        # fused Pallas vocoder stages + diffusion-head FFN stack
        # (int8 weights iff the LM is int8)
        params = vv.fuse_for_serving(params, cfg, quantize=use_int8)

    kv_int8 = os.environ.get("BENCH_KV_INT8") == "1"
    kw = dict(max_len=max_len, ddpm_steps=ddpm_steps,
              frames_per_dispatch=frames_per_dispatch, steps=steps, kv_int8=kv_int8)
    fill = int(os.environ.get("BENCH_FILL", "0"))
    rtf, step_time = run_decode(cfg, params, batch=batch, fill=fill, **kw)

    prefill_len = int(os.environ.get("BENCH_PREFILL", "0"))
    # Print each metric line the moment it is known (flushed): if the driver
    # times the run out mid-suite, the headline and every finished sub-metric
    # survive in the record instead of being lost in a buffered batch. The
    # set rides an env var so the transient-error re-exec (below) does not
    # print a second copy of lines that already reached the record.
    emitted = set(filter(None, os.environ.get("_BENCH_EMITTED", "").split(",")))

    def emit(line):
        if line["metric"] not in emitted:
            emitted.add(line["metric"])
            os.environ["_BENCH_EMITTED"] = ",".join(sorted(emitted))
            print(json.dumps(line), flush=True)

    suffix = "" if use_int8 else "_bf16"
    if os.environ.get("BENCH_INT4") == "1":
        suffix += "_int4probe"
    if kv_int8:
        suffix += "_kv8"
    if fill:
        suffix += f"_fill{fill}"
    emit(
        {
            "metric": f"RTF_{model.upper()}_decode_bs{batch}{suffix}",
            "value": round(rtf, 4),
            "unit": "audio-sec/wall-sec/chip",
            "vs_baseline": round(rtf / 5.0, 4),
        }
    )
    if prefill_len:
        # long-form: fold an N-token prompt prefill into the RTF of a
        # generation that fills the remaining cache with speech frames;
        # decode is costed at the run's midpoint fill level
        prefill_wall = run_prefill(
            cfg, params, prompt_len=prefill_len, max_len=max_len, kv_int8=kv_int8
        )
        mid_fill = (prefill_len + max_len) // 2
        _, mid_step = run_decode(cfg, params, batch=batch, fill=mid_fill, **kw)
        gen_frames = max_len - prefill_len
        audio_sec = gen_frames * 3200 / 24_000
        wall = prefill_wall + gen_frames * mid_step
        rtf_lf = audio_sec / wall
        emit(
            {
                "metric": f"RTF_{model.upper()}_longform_{prefill_len}tok_prompt_{max_len}cache{suffix}",
                "value": round(rtf_lf, 4),
                "unit": "audio-sec/wall-sec/chip",
                "vs_baseline": round(rtf_lf / 5.0, 4),
                "prefill_sec": round(prefill_wall, 3),
                "midfill_step_ms": round(mid_step * 1e3, 3),
            }
        )

    # bs4 throughput line by default (compile-cached after the first run);
    # BENCH_QUICK=1 skips it, batch/7B/long-form overrides imply quick mode
    default_run = (
        os.environ.get("BENCH_QUICK") != "1"
        and batch == 1
        and model == "1.5b"
        and not (fill or prefill_len)
    )
    if default_run or os.environ.get("BENCH_ALL") == "1":
        rtf4, _ = run_decode(cfg, params, batch=4, **kw)
        emit(
            {
                "metric": f"RTF_{model.upper()}_decode_bs4{suffix}",
                "value": round(rtf4, 4),
                "unit": "audio-sec/wall-sec/chip",
                "vs_baseline": round(rtf4 / 5.0, 4),
            }
        )

    # Full metric suite on the default (driver) run — the official BENCH
    # record should show the whole framework, not just the decode step:
    # 64K long-form (inline; BASELINE config 3), streaming TTFA, the serving
    # aggregate, and the session-capacity sweep (subprocesses — separate
    # models/backends). Ordered by information value so a budget/driver
    # timeout clips the tail, not the headline results; each stage first
    # checks the remaining wall budget. BENCH_SUITE=0 disables.
    if default_run and os.environ.get("BENCH_SUITE") != "0":
        if remaining() > 120:
            try:
                emit(_longform_64k_line(cfg, params, kw))
            except Exception as e:  # noqa: BLE001 - a sub-metric must not kill the headline
                print(f"suite: 64K long-form failed: {e!r}"[:300], file=sys.stderr)
        else:
            print("suite: skipping 64K long-form (budget)", file=sys.stderr)
        stages = [
            # (script, env, minimum budget to attempt)
            ("bench_streaming.py", {}, 120),
            # 8 slots = the measured aggregate knee (round 4: 4/6/8/12 slots
            # -> 59.7/70.0/78.4/71.9x; raw bs8 device step 107x)
            ("bench_serving.py",
             {"BENCH_SLOTS": os.environ.get("BENCH_SLOTS", "8")}, 240),
            # multi-session real-time capacity: three points so the headline
            # metric (largest n meeting budget) degrades gracefully if the
            # box is contended during the record run — a single-point probe
            # read 0 on a loaded host where the idle-box max is 48 (round 5:
            # the 3-frame admission quantum moved the join-TTFA knee from 24
            # to the 40-56 range; 16/24/32 all pass with >=90 ms margin)
            ("bench_streaming.py",
             {"BENCH_SESSIONS": "1", "BENCH_SESSION_NS": "16,24,32"}, 240),
            # 16-slot steady state (one wave of 512-frame streams, no
            # turnover): the throughput record — 107x measured, 80% of the
            # raw bs16 step. LAST: if the driver's external timeout clips
            # the run, only this line is lost (everything above is flushed).
            ("bench_serving.py",
             {"BENCH_SLOTS": "16", "BENCH_REQS": "16", "BENCH_FRAMES": "512"},
             300),
        ]
        for script, env_extra, min_s in stages:
            rem = remaining()
            if rem < min_s:
                print(f"suite: skipping {script} {env_extra or ''} "
                      f"(budget: {rem:.0f}s left)", file=sys.stderr)
                continue
            for line in _run_sub_bench(script, env_extra, timeout=min(1800, rem)):
                emit(line)


def _longform_64k_line(cfg, params, kw):
    """1.5B 64K long-form: 8K-token prompt prefill + decode costed at the
    midpoint fill of a generation that fills the remaining cache (int8 KV —
    the auto policy at 64K). Mirrors the BENCH_PREFILL branch."""
    kw = dict(kw, max_len=65536, kv_int8=True)
    prompt_len = 8192
    prefill_wall = run_prefill(
        cfg, params, prompt_len=prompt_len, max_len=65536, kv_int8=True
    )
    mid_fill = (prompt_len + 65536) // 2
    _, mid_step = run_decode(cfg, params, batch=1, fill=mid_fill, **kw)
    gen_frames = 65536 - prompt_len
    audio_sec = gen_frames * 3200 / 24_000
    wall = prefill_wall + gen_frames * mid_step
    rtf_lf = audio_sec / wall
    return {
        "metric": "RTF_1.5B_longform_8192tok_prompt_65536cache_kv8",
        "value": round(rtf_lf, 4),
        "unit": "audio-sec/wall-sec/chip",
        "vs_baseline": round(rtf_lf / 5.0, 4),
        "prefill_sec": round(prefill_wall, 3),
        "midfill_step_ms": round(mid_step * 1e3, 3),
    }


def _run_sub_bench(script, env_extra, timeout):
    """Run a sibling bench script and forward its JSON lines; failures are
    logged to stderr and skipped (the headline must survive)."""
    import subprocess

    env = dict(os.environ)
    env.pop("_BENCH_ATTEMPT", None)
    env.update(env_extra)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), script)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        if out.returncode != 0:
            print(f"suite: {script} rc={out.returncode}: {out.stderr[-300:]}", file=sys.stderr)
            return []
        parsed = []
        for ln in out.stdout.strip().splitlines():
            if ln.startswith("{"):
                try:
                    parsed.append(json.loads(ln))
                except json.JSONDecodeError:
                    pass
        return parsed
    except Exception as e:  # noqa: BLE001
        print(f"suite: {script} failed: {e!r}"[:300], file=sys.stderr)
        return []


def _transient(exc: BaseException) -> bool:
    s = repr(exc)
    return any(
        m in s
        for m in (
            "remote_compile",
            "Connection Failed",
            "Connection refused",
            "UNAVAILABLE",
            "DEADLINE_EXCEEDED",
            "Socket closed",
        )
    )


if __name__ == "__main__":
    # The remote-TPU tunnel drops occasionally (compile server restarts with
    # a new port; CLAUDE.md). A poisoned JAX runtime can't retry in-process,
    # so re-exec the interpreter for a clean backend, up to 3 attempts.
    try:
        main()
    except Exception as e:  # noqa: BLE001 - classified below
        attempt = int(os.environ.get("_BENCH_ATTEMPT", "0"))
        if not _transient(e) or attempt >= 3:
            raise
        print(f"transient TPU-transport error (attempt {attempt + 1}/3), "
              f"retrying in 180s: {e!r}"[:400], file=sys.stderr)
        time.sleep(180)
        os.environ["_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
