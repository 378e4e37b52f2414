"""Multi-speaker file inference CLI (parity with reference
demo/inference_from_file.py): script file + voice wavs -> 24 kHz WAV, with
RTF and token-count reporting.

Usage:
  python demo/inference_from_file.py --model_path <ckpt_dir> \
      --txt_path script.txt --speaker_names Alice Bob --output_dir ./outputs

Without --model_path it runs a tiny random-weight model end-to-end (smoke
mode) so the full pipeline is exercisable on any host.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class VoiceMapper:
    """Map speaker names to demo voice wav files (reference
    demo/inference_from_file.py:18-91): 'en-Carter_man' -> 'Carter'."""

    def __init__(self, voices_dir: str):
        self.voice_presets = {}
        if os.path.isdir(voices_dir):
            for f in os.listdir(voices_dir):
                if not f.lower().endswith((".wav", ".mp3", ".flac", ".ogg", ".m4a")):
                    continue
                name = os.path.splitext(f)[0]
                # normalize: strip language prefix and gender suffix
                if "-" in name:
                    name = name.split("-", 1)[1]
                name = name.split("_")[0]
                self.voice_presets[name] = os.path.join(voices_dir, f)

    def get_voice_path(self, speaker_name: str) -> str:
        if speaker_name in self.voice_presets:
            return self.voice_presets[speaker_name]
        for k, v in self.voice_presets.items():
            if k.lower() in speaker_name.lower() or speaker_name.lower() in k.lower():
                return v
        if self.voice_presets:
            first = sorted(self.voice_presets)[0]
            print(f"Warning: no voice preset for '{speaker_name}', using '{first}'")
            return self.voice_presets[first]
        raise ValueError(f"No voice presets available for speaker '{speaker_name}'")


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None, help="checkpoint directory")
    ap.add_argument("--txt_path", type=str, default=None, help="script .txt/.json")
    ap.add_argument("--script", type=str, default=None, help="inline script text")
    ap.add_argument("--speaker_names", type=str, nargs="*", default=[])
    ap.add_argument("--voices_dir", type=str, default=os.path.join(os.path.dirname(__file__), "voices"))
    ap.add_argument("--output_dir", type=str, default="./outputs")
    ap.add_argument("--cfg_scale", type=float, default=1.3)
    ap.add_argument("--ddpm_steps", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max_length", type=int, default=None)
    ap.add_argument("--checkpoint_path", type=str, default=None, help="LoRA adapter dir")
    ap.add_argument("--disable_prefill", action="store_true")
    ap.add_argument("--device_dtype", type=str, default="bfloat16")
    ap.add_argument("--frames_per_dispatch", type=int, default=8)
    ap.add_argument("--int8", action="store_true", help="weight-only int8 serving mode")
    ap.add_argument("--kv_int8", action=argparse.BooleanOptionalAction, default=None,
                    help="int8 KV cache (halves cache memory). Default: automatic — "
                    "on at max_length >= 16K, off below (quantize-on-write costs "
                    "~8%% at low fill)")
    ap.add_argument("--random_weights", action="store_true",
                    help="random-init the FULL-SIZE model (pipeline validation without a checkpoint)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    from vibevoice_tpu.utils.platform import honor_platform_request

    honor_platform_request("cpu" if args.cpu else None)

    import jax
    import jax.numpy as jnp

    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import vibevoice as vv
    from vibevoice_tpu.processor.processor import VibeVoiceProcessor
    from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer

    if args.script is not None:
        script = args.script
    elif args.txt_path is not None:
        script = args.txt_path
    else:
        script = "Speaker 1: Hello, this is a smoke test of the VibeVoice TPU framework.\nSpeaker 2: And this is the second speaker replying."

    if args.model_path:
        from vibevoice_tpu.utils.hf_interop import load_pretrained

        # int8 checkpoints quantize on the HOST before device transfer (7B's
        # bf16 LM cannot coexist with its int8 copy on a 16 GB chip);
        # load_pretrained routes by config.json model_type
        loaded = load_pretrained(
            args.model_path, dtype=args.device_dtype, int8=args.int8 and not args.checkpoint_path
        )
        if loaded.model_type != "vibevoice":
            raise SystemExit(
                f"{args.model_path} is a {loaded.model_type} checkpoint; use "
                "demo/streaming_inference_from_file.py for streaming models"
            )
        cfg, params, processor = loaded
        if args.checkpoint_path:
            from vibevoice_tpu.finetune.lora import load_lora_assets

            params = load_lora_assets(params, args.checkpoint_path, cfg)
        tokens = inf.SpecialTokens(
            speech_start=processor.tokenizer.speech_start_id,
            speech_end=processor.tokenizer.speech_end_id,
            speech_diffusion=processor.tokenizer.speech_diffusion_id,
            eos=processor.tokenizer.eos_token_id,
        )
        hop = 3200
    elif args.random_weights:
        print("Random-weight FULL-SIZE 1.5B model (pipeline validation)")
        from vibevoice_tpu.configs import VibeVoiceConfig

        cfg = VibeVoiceConfig.from_json_file(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "vibevoice_tpu", "configs", "qwen2.5_1.5b_64k.json")
        )
        params = vv.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        hop = 3200
        processor = VibeVoiceProcessor(
            tokenizer=FallbackTextTokenizer(
                vocab_size=cfg.decoder_config.vocab_size,
                speech_start_id=151652, speech_end_id=151653,
                speech_diffusion_id=151654, eos_token_id=151643, pad_id=151655,
            )
        )
        tokens = inf.SpecialTokens(
            speech_start=151652, speech_end=151653, speech_diffusion=151654, eos=151643
        )
    else:
        print("No --model_path: running tiny random-weight smoke model")
        from vibevoice_tpu.configs import tiny_config

        cfg = tiny_config()
        params = vv.init(jax.random.PRNGKey(0), cfg)
        hop = cfg.acoustic_tokenizer_config.hop_length
        processor = VibeVoiceProcessor(
            tokenizer=FallbackTextTokenizer(), speech_tok_compress_ratio=hop
        )
        tokens = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)

    voice_samples = None
    if args.speaker_names:
        mapper = VoiceMapper(args.voices_dir)
        voice_samples = [[mapper.get_voice_path(n) for n in args.speaker_names]]
    elif args.model_path is None:
        # smoke mode: synthetic voice prompts
        rng = np.random.RandomState(0)
        voice_samples = [[rng.randn(hop * 4).astype(np.float32) * 0.05 for _ in range(2)]]

    if args.int8 and "lm_head_q" not in params:  # not already host-quantized
        params = vv.quantize_for_inference(params)
    if args.int8:
        params = vv.fuse_vocoder(params, cfg, quantize=True)

    proc_out = processor(text=script, voice_samples=voice_samples)
    prompt_tokens = int(proc_out.attention_mask.sum())

    opts = inf.GenerateOptions(
        cfg_scale=args.cfg_scale,
        ddpm_steps=args.ddpm_steps,
        max_length=args.max_length or (256 if args.model_path is None else None),
        # file mode tolerates ~1 s of delivery granularity; scanning 8 frames
        # per dispatch amortises host round-trips (README perf table)
        frames_per_dispatch=args.frames_per_dispatch,
        kv_int8=args.kv_int8,
    )

    t0 = time.time()
    out = inf.generate(
        cfg,
        params,
        input_ids=proc_out.input_ids,
        valid_mask=proc_out.attention_mask,
        speech_tensors=None if args.disable_prefill else proc_out.speech_tensors,
        speech_frame_valid=None if args.disable_prefill else proc_out.speech_masks,
        speech_input_mask=None if args.disable_prefill else proc_out.speech_input_mask,
        tokens=tokens,
        opts=opts,
        seed=args.seed,
        show_progress_bar=True,
    )
    wall = time.time() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    total_audio_sec = 0.0
    for i, audio in enumerate(out.speech_outputs):
        if audio is None:
            print(f"Sample {i}: no audio generated")
            continue
        sr = 24_000 if args.model_path else 24_000
        total_audio_sec += len(audio) / sr
        path = os.path.join(args.output_dir, f"generated_{i}.wav")
        processor.save_audio(audio, output_path=path)
        print(f"Sample {i}: {len(audio) / sr:.2f}s audio -> {path}")

    gen_tokens = out.sequences.shape[1] - proc_out.input_ids.shape[1]
    print(f"Prefill tokens: {prompt_tokens}")
    print(f"Generated tokens: {gen_tokens}")
    print(f"Wall time: {wall:.2f}s, audio: {total_audio_sec:.2f}s, RTF: "
          f"{total_audio_sec / wall if wall > 0 else 0:.3f}x realtime")


if __name__ == "__main__":
    main()
