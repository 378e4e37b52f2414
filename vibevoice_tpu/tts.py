"""One-call user API: load a checkpoint, synthesize or stream speech.

The reference's UX is two objects (`VibeVoiceProcessor.from_pretrained` +
`VibeVoiceForConditionalGenerationInference.from_pretrained(...).generate`,
reference demo/inference_from_file.py:283-389). This module folds the same
flow into one handle so switching users keep a one-liner:

    from vibevoice_tpu.tts import VibeVoiceTTS

    tts = VibeVoiceTTS.from_pretrained("/ckpts/VibeVoice-1.5B", int8=True)
    audio = tts.synthesize("Speaker 1: Hello!", voices=["alice.wav"])
    tts.save_audio(audio, "hello.wav")

    for chunk in tts.stream("Speaker 1: Hello!", voices=["alice.wav"]):
        play(chunk)                      # 24 kHz float32 frames

    from vibevoice_tpu.tts import StreamingTTS    # 0.5B low-latency model
    rt = StreamingTTS.from_pretrained("/ckpts/VibeVoice-0.5B-rt", voice="v.npz")
    for chunk in rt.stream("Hello!"):
        play(chunk)

Every knob of the underlying engines stays reachable (`opts=GenerateOptions`
overrides), and the raw layers remain public — this is sugar, not a wall.
"""

from __future__ import annotations

import threading
from typing import Iterator, List, Optional, Sequence, Union

import numpy as np

from .models.inference import GenerateOptions, SpecialTokens
from .streamer import AudioStreamer

Audio = Union[str, np.ndarray]  # wav path or waveform array


def _tokens_from_processor(processor) -> SpecialTokens:
    tk = processor.tokenizer
    return SpecialTokens(
        speech_start=tk.speech_start_id,
        speech_end=tk.speech_end_id,
        speech_diffusion=tk.speech_diffusion_id,
        eos=tk.eos_token_id,
    )


class VibeVoiceTTS:
    """Multi-speaker model (1.5B / 7B) behind a one-call API."""

    def __init__(self, cfg, params, processor, tokens: Optional[SpecialTokens] = None):
        self.cfg = cfg
        self.params = params
        self.processor = processor
        self.tokens = tokens or _tokens_from_processor(processor)
        self.sample_rate = 24_000

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        path: str,
        *,
        int8: bool = False,
        dtype: str = "bfloat16",
        lora_path: Optional[str] = None,
    ) -> "VibeVoiceTTS":
        """Load an HF-style checkpoint dir (config.json + safetensors).
        int8=True quantizes LM + lm_head host-side (the 7B-on-16GB config);
        lora_path loads a fine-tune's `lora/` assets on top."""
        from .utils.compile_cache import enable as enable_cache
        from .utils.hf_interop import load_pretrained

        enable_cache()
        loaded = load_pretrained(path, dtype=dtype, int8=int8 and not lora_path)
        if loaded.model_type != "vibevoice":
            raise ValueError(
                f"{path} is a {loaded.model_type} checkpoint; use "
                "StreamingTTS.from_pretrained for streaming models"
            )
        cfg, params, processor = loaded
        if lora_path:
            from .finetune.lora import load_lora_assets

            params = load_lora_assets(params, lora_path, cfg)
            if int8:
                # quantize AFTER the (dense) LoRA merge so int8=True keeps
                # its meaning with a fine-tune loaded on top
                from .models.vibevoice import quantize_for_inference

                params = quantize_for_inference(params)
        return cls(cfg, params, processor)

    @classmethod
    def smoke(cls) -> "VibeVoiceTTS":
        """Tiny random-weight instance (tests/demos on any host)."""
        import jax

        from .configs import tiny_config
        from .models import vibevoice as vv
        from .processor.processor import VibeVoiceProcessor
        from .processor.text_tokenizer import FallbackTextTokenizer

        cfg = tiny_config()
        params = vv.init(jax.random.PRNGKey(0), cfg)
        processor = VibeVoiceProcessor(
            tokenizer=FallbackTextTokenizer(),
            speech_tok_compress_ratio=cfg.acoustic_tokenizer_config.hop_length,
        )
        tokens = SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)
        return cls(cfg, params, processor, tokens)

    # -- synthesis ---------------------------------------------------------

    def _generate(
        self,
        script: str,
        voices: Optional[Sequence[Audio]],
        opts: Optional[GenerateOptions],
        seed: int,
        audio_streamer=None,
        stop_check_fn=None,
        **overrides,
    ):
        from .models import inference as inf

        proc_out = self.processor(
            text=script, voice_samples=[list(voices)] if voices else None
        )
        if opts is None:
            opts = GenerateOptions(**overrides)
        elif overrides:
            import dataclasses

            opts = dataclasses.replace(opts, **overrides)
        return inf.generate(
            self.cfg,
            self.params,
            input_ids=proc_out.input_ids,
            valid_mask=proc_out.attention_mask,
            speech_tensors=proc_out.speech_tensors,
            speech_frame_valid=proc_out.speech_masks,
            speech_input_mask=proc_out.speech_input_mask,
            tokens=self.tokens,
            opts=opts,
            seed=seed,
            audio_streamer=audio_streamer,
            stop_check_fn=stop_check_fn,
        )

    def synthesize(
        self,
        script: str,
        *,
        voices: Optional[Sequence[Audio]] = None,
        seed: int = 0,
        opts: Optional[GenerateOptions] = None,
        **overrides,
    ) -> np.ndarray:
        """Script -> 24 kHz float32 waveform. `voices[k]` is speaker k's
        prompt (wav path or array). Keyword overrides go to GenerateOptions
        (cfg_scale, ddpm_steps, max_length, kv_int8, sde, ...)."""
        out = self._generate(script, voices, opts, seed, **overrides)
        audio = out.speech_outputs[0]
        return np.zeros(0, np.float32) if audio is None else np.asarray(audio)

    def stream(
        self,
        script: str,
        *,
        voices: Optional[Sequence[Audio]] = None,
        seed: int = 0,
        opts: Optional[GenerateOptions] = None,
        **overrides,
    ) -> Iterator[np.ndarray]:
        """Incremental synthesize: yields audio frames as they are produced
        (generation runs on a worker thread). Closing the iterator stops the
        device work."""
        streamer = AudioStreamer(batch_size=1)
        stop = threading.Event()
        err: List[BaseException] = []

        def run():
            try:
                self._generate(
                    script, voices, opts, seed,
                    audio_streamer=streamer, stop_check_fn=stop.is_set, **overrides,
                )
            except BaseException as e:
                err.append(e)
            finally:
                streamer.end()

        t = threading.Thread(target=run, daemon=True)
        t.start()
        try:
            yield from streamer.get_stream(0)
            if err:
                raise err[0]
        finally:
            stop.set()
            t.join()

    def save_audio(self, audio: np.ndarray, path: str) -> None:
        self.processor.save_audio(audio, output_path=path)


class StreamingTTS:
    """0.5B streaming model (lowest time-to-first-audio) behind the same
    one-call shape. Batch 1, voice fixed per instance (the reference's
    precomputed-preset design, SURVEY.md §2.6)."""

    def __init__(self, cfg, params, processor, preset, *, max_len: int = 8192):
        from .models import streaming as st

        self.st = st
        self.cfg = cfg
        self.params = params
        self.processor = processor
        self.preset = preset
        self.max_len = max_len
        self.sample_rate = 24_000
        self._lock = threading.Lock()

    @classmethod
    def from_pretrained(
        cls,
        path: str,
        *,
        voice: Optional[str] = None,
        dtype: str = "bfloat16",
        max_len: int = 8192,
    ) -> "StreamingTTS":
        """`voice` is a preset file: .npz (native) or the reference's .pt."""
        from .models import streaming as st
        from .utils.compile_cache import enable as enable_cache
        from .utils.hf_interop import load_pretrained

        enable_cache()
        loaded = load_pretrained(path, dtype=dtype)
        if loaded.model_type != "vibevoice_streaming":
            raise ValueError(
                f"{path} is a {loaded.model_type} checkpoint; use "
                "VibeVoiceTTS.from_pretrained for multi-speaker models"
            )
        cfg, params, processor = loaded
        if voice is None:
            raise ValueError("StreamingTTS needs a voice preset (.npz or .pt)")
        if voice.endswith(".pt"):
            from .utils.preset_convert import convert_torch_preset

            preset = convert_torch_preset(voice)
        else:
            preset = st.VoicePreset.load(voice)
        return cls(cfg, params, processor, preset, max_len=max_len)

    @classmethod
    def smoke(cls, max_len: int = 512) -> "StreamingTTS":
        """Tiny random-weight streaming instance with a synthetic preset."""
        import jax

        from .configs import (
            AcousticTokenizerConfig,
            DiffusionHeadConfig,
            Qwen2Config,
            VibeVoiceStreamingConfig,
        )
        from .models import streaming as st
        from .processor.streaming_processor import VibeVoiceStreamingProcessor
        from .processor.text_tokenizer import FallbackTextTokenizer

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
            diffusion_head_config=DiffusionHeadConfig(
                hidden_size=64, head_layers=2, latent_size=16
            ),
            tts_backbone_num_hidden_layers=2,
        )
        params = st.init(jax.random.PRNGKey(0), cfg)
        processor = VibeVoiceStreamingProcessor(FallbackTextTokenizer(vocab_size=256))
        prompt = np.random.RandomState(0).randint(10, 200, (1, 16))
        preset = st.build_voice_preset(
            cfg, params, prompt,
            neg_prompt_id=getattr(processor.tokenizer, "pad_id", 3),
            max_len=max_len,
        )
        return cls(cfg, params, processor, preset, max_len=max_len)

    def _opts(self, opts, overrides) -> GenerateOptions:
        if opts is None:
            return GenerateOptions(**{"cfg_scale": 1.5, "ddpm_steps": 5, **overrides})
        if overrides:
            import dataclasses

            return dataclasses.replace(opts, **overrides)
        return opts

    def stream(
        self,
        text: str,
        *,
        seed: int = 0,
        opts: Optional[GenerateOptions] = None,
        **overrides,
    ) -> Iterator[np.ndarray]:
        """Text -> audio frames as produced. One stream at a time (bs1)."""
        opts = self._opts(opts, overrides)
        streamer = AudioStreamer(batch_size=1)
        stop = threading.Event()
        err: List[BaseException] = []

        def run():
            try:
                with self._lock:
                    # make_window_fns is lru-cached on (cfg, traced-opts) —
                    # repeated streams reuse the compiled programs
                    window_fns = self.st.make_window_fns(self.cfg, opts)
                    proc_out = self.processor.process_input_with_cached_prompt(
                        text, self.preset
                    )
                    self.st.generate(
                        self.cfg, self.params,
                        tts_text_ids=proc_out.tts_text_ids,
                        preset=self.preset, opts=opts, max_len=self.max_len,
                        seed=seed, audio_streamer=streamer,
                        stop_check_fn=stop.is_set, window_fns=window_fns,
                    )
            except BaseException as e:
                err.append(e)
            finally:
                streamer.end()

        t = threading.Thread(target=run, daemon=True)
        t.start()
        try:
            yield from streamer.get_stream(0)
            if err:
                raise err[0]
        finally:
            stop.set()
            t.join()

    def warmup(self, max_frames: int = 12, **overrides) -> float:
        """Compile the windowed generate path (prefill splice + text window +
        speech window + vocoder) before the first real session, so TTFA on
        that session is steady-state. Drives one short synthetic stream and
        discards the audio; window programs are length-independent, so one
        warmup covers every text. Returns wall seconds spent."""
        import time

        t0 = time.monotonic()
        for i, _ in enumerate(self.stream("Warming up the serving path.", **overrides)):
            if i >= max_frames:  # closing the generator stops generation
                break
        return time.monotonic() - t0

    def synthesize(self, text: str, **kw) -> np.ndarray:
        chunks = list(self.stream(text, **kw))
        return (
            np.concatenate([np.asarray(c).reshape(-1) for c in chunks])
            if chunks
            else np.zeros(0, np.float32)
        )
