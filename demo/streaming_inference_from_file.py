"""Streaming 0.5B inference CLI (parity with reference
demo/streaming_inference_from_file.py): voice preset + text -> real-time
audio with time-to-first-audio (TTFA) and RTF reporting.

Usage:
  python demo/streaming_inference_from_file.py --model_path <ckpt> \
      --voice_preset voice.npz --text "Hello world"

Without --model_path it runs a tiny random-weight model (smoke mode).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--voice_preset", type=str, default=None, help=".npz (native) or .pt (reference)")
    ap.add_argument("--text", type=str, default="Hello, this is a streaming synthesis smoke test.")
    ap.add_argument("--txt_path", type=str, default=None)
    ap.add_argument("--output_path", type=str, default="./outputs/streaming.wav")
    ap.add_argument("--cfg_scale", type=float, default=1.5)
    ap.add_argument("--ddpm_steps", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max_len", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--kv_int8", action=argparse.BooleanOptionalAction, default=None,
                    help="int8 KV caches (halves cache HBM). Default: automatic — "
                    "on at max_len >= 16K, off below (TTFA is better bf16 at low fill)")
    args = ap.parse_args()

    from vibevoice_tpu.utils.platform import honor_platform_request

    honor_platform_request("cpu" if args.cpu else None)

    import jax

    from vibevoice_tpu.models import streaming as st
    from vibevoice_tpu.models.inference import GenerateOptions
    from vibevoice_tpu.processor.streaming_processor import VibeVoiceStreamingProcessor
    from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer
    from vibevoice_tpu.processor.audio import write_wav
    from vibevoice_tpu.streamer import AudioStreamer

    if args.model_path:
        from vibevoice_tpu.utils.hf_interop import load_pretrained

        loaded = load_pretrained(args.model_path)
        if loaded.model_type != "vibevoice_streaming":
            raise SystemExit(
                f"{args.model_path} is a {loaded.model_type} checkpoint; use "
                "demo/inference_from_file.py for multi-speaker models"
            )
        cfg, params, processor = loaded
        sr = 24_000
    else:
        print("No --model_path: tiny random-weight smoke model")
        from vibevoice_tpu.configs import (
            AcousticTokenizerConfig,
            DiffusionHeadConfig,
            Qwen2Config,
            VibeVoiceStreamingConfig,
        )

        cfg = VibeVoiceStreamingConfig(
            acoustic_tokenizer_config=AcousticTokenizerConfig(
                vae_dim=16, encoder_n_filters=4, encoder_ratios=(4, 2),
                encoder_depths=(1, 1, 2), decoder_n_filters=4,
            ),
            decoder_config=Qwen2Config(
                vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=1024, rope_theta=10_000.0,
            ),
            diffusion_head_config=DiffusionHeadConfig(hidden_size=64, head_layers=2, latent_size=16),
            tts_backbone_num_hidden_layers=2,
        )
        params = st.init(jax.random.PRNGKey(0), cfg)
        processor = VibeVoiceStreamingProcessor(FallbackTextTokenizer(vocab_size=256))
        sr = 24_000

    if args.voice_preset:
        if args.voice_preset.endswith(".pt"):
            from vibevoice_tpu.utils.preset_convert import convert_torch_preset

            preset = convert_torch_preset(args.voice_preset)
        else:
            preset = st.VoicePreset.load(args.voice_preset)
    else:
        print("No --voice_preset: prefilling a synthetic prompt")
        prompt = np.random.RandomState(0).randint(10, 200, (1, 16))
        preset = st.build_voice_preset(
            cfg, params, prompt, neg_prompt_id=getattr(processor.tokenizer, "pad_id", 3),
            max_len=args.max_len,
        )

    text = args.text
    if args.txt_path:
        with open(args.txt_path) as f:
            text = f.read()

    proc_out = processor.process_input_with_cached_prompt(text, preset)

    streamer = AudioStreamer(batch_size=1)
    first_chunk_time = [None]
    orig_put = streamer.put

    def timed_put(chunks, idx):
        if first_chunk_time[0] is None:
            first_chunk_time[0] = time.perf_counter()
        orig_put(chunks, idx)

    streamer.put = timed_put

    opts = GenerateOptions(
        cfg_scale=args.cfg_scale, ddpm_steps=args.ddpm_steps, kv_int8=args.kv_int8
    )
    window_fns = st.make_window_fns(cfg, opts)

    # warmup compile (excluded from TTFA, matching steady-state serving)
    _ = st.generate(
        cfg, params, tts_text_ids=proc_out.tts_text_ids[:, :1], preset=preset,
        opts=opts, max_len=args.max_len, seed=args.seed, window_fns=window_fns,
        stop_check_fn=lambda c=iter(range(3)): next(c, None) is None,
    )

    t0 = time.perf_counter()
    out = st.generate(
        cfg, params, tts_text_ids=proc_out.tts_text_ids, preset=preset,
        opts=opts, max_len=args.max_len, seed=args.seed,
        audio_streamer=streamer, window_fns=window_fns,
    )
    wall = time.perf_counter() - t0

    audio = out.speech_outputs[0]
    if audio is None:
        print("No audio generated")
        return
    ttfa = (first_chunk_time[0] - t0) if first_chunk_time[0] else float("nan")
    audio_sec = len(audio) / sr
    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    write_wav(args.output_path, audio, sr)
    print(f"Audio: {audio_sec:.2f}s -> {args.output_path}")
    print(f"Time-to-first-audio: {ttfa * 1000:.1f} ms")
    print(f"Wall: {wall:.2f}s, RTF: {audio_sec / wall:.3f}x realtime")


if __name__ == "__main__":
    main()
