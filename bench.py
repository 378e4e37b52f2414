"""Benchmark: single-chip real-time factor of VibeVoice-1.5B synthesis.

Measures the steady-state fused decode step (LM step + CFG diffusion scan +
streaming vocoder + semantic re-encode) on the flagship 1.5B config with
random bf16 weights, batch 1, 10 DDPM steps (the file-CLI default,
reference demo/inference_from_file.py:365). One 7.5 Hz frame = 3200 samples
of 24 kHz audio, so RTF = (3200/24000) / step_time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5.0 (BASELINE.md target: >=5x realtime per chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    from vibevoice_tpu.configs import VibeVoiceConfig
    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import qwen2
    from vibevoice_tpu.models import tokenizer as tok
    from vibevoice_tpu.models import vibevoice as vv

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    max_len = int(os.environ.get("BENCH_MAX_LEN", "4096"))
    ddpm_steps = int(os.environ.get("BENCH_DDPM_STEPS", "10"))
    frames_per_dispatch = int(os.environ.get("BENCH_FRAMES_PER_DISPATCH", "8"))

    cfg = VibeVoiceConfig.from_json_file(
        os.path.join(os.path.dirname(__file__), "vibevoice_tpu", "configs", "qwen2.5_1.5b_64k.json")
    )
    dtype = jnp.bfloat16
    params = vv.init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if os.environ.get("BENCH_INT8") == "1":
        components = ["lm", "lm_head"]
        if os.environ.get("BENCH_INT8_HEAD") == "1":
            components.append("diffusion_head")
        if os.environ.get("BENCH_INT8_TOK") == "1":
            components.append("tokenizers")
        params = vv.quantize_for_inference(params, components=tuple(components))
    tokens = inf.SpecialTokens()
    opts = inf.GenerateOptions(
        ddpm_steps=ddpm_steps, max_length=max_len, frames_per_dispatch=frames_per_dispatch
    )
    step = inf.make_multi_step_fn(cfg, tokens, opts, frames_per_dispatch)

    carry = inf.DecodeCarry(
        cache=qwen2.make_cache(cfg.decoder_config, 2 * batch, max_len, dtype),
        dec_state=tok.init_decoder_state(cfg.acoustic_tokenizer_config, batch, dtype),
        sem_state=tok.init_encoder_state(cfg.semantic_tokenizer_config, batch, dtype),
        h_pos=jnp.zeros((batch, cfg.decoder_config.hidden_size), dtype),
        h_neg=jnp.zeros((batch, cfg.decoder_config.hidden_size), dtype),
        finished=jnp.zeros((batch,), bool),
        n_diff=jnp.zeros((batch,), jnp.int32),
    )
    ext = jnp.zeros((frames_per_dispatch, batch), bool)
    key = jax.random.PRNGKey(1)

    # warmup / compile
    for i in range(2):
        key, sk = jax.random.split(key)
        carry, out = step(params, carry, sk, ext)
    jax.block_until_ready(out.audio)

    import numpy as np

    n_dispatch = max(1, steps // frames_per_dispatch)
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        key, sk = jax.random.split(key)
        carry, out = step(params, carry, sk, ext)
    # force a real device round-trip (block_until_ready alone can return
    # early through remote-tunnel transports)
    np.asarray(out.audio).sum()
    wall = time.perf_counter() - t0

    frame_sec = 3200 / 24_000
    audio_sec = n_dispatch * frames_per_dispatch * frame_sec * batch
    rtf = audio_sec / wall
    print(
        json.dumps(
            {
                "metric": "RTF_1.5B_decode_bs%d" % batch,
                "value": round(rtf, 4),
                "unit": "audio-sec/wall-sec/chip",
                "vs_baseline": round(rtf / 5.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
