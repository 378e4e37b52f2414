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


if __name__ == "__main__":
    main()
