"""Streaming 0.5B model tests: split-stack windows, voice presets, EOS,
end-to-end generate (SURVEY.md §2.6, §3.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.configs import (
    AcousticTokenizerConfig,
    DiffusionHeadConfig,
    Qwen2Config,
    VibeVoiceStreamingConfig,
)
from vibevoice_tpu.models import streaming as st
from vibevoice_tpu.models.inference import GenerateOptions
from vibevoice_tpu.processor.streaming_processor import VibeVoiceStreamingProcessor
from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer

CFG = VibeVoiceStreamingConfig(
    acoustic_tokenizer_config=AcousticTokenizerConfig(
        vae_dim=16,
        encoder_n_filters=4,
        encoder_ratios=(4, 2),
        encoder_depths=(1, 1, 2),
        decoder_n_filters=4,
    ),
    decoder_config=Qwen2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=1024,
        rope_theta=10_000.0,
    ),
    diffusion_head_config=DiffusionHeadConfig(hidden_size=64, head_layers=2, latent_size=16),
    tts_backbone_num_hidden_layers=2,
)
HOP = 8


@pytest.fixture(scope="module")
def params():
    return st.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def preset(params):
    prompt = np.random.RandomState(0).randint(10, 200, (1, 12))
    return st.build_voice_preset(CFG, params, prompt, neg_prompt_id=3, max_len=256)


def test_split_stacks(params):
    assert len(params["language_model"]["layers"]) == 2
    assert len(params["tts_language_model"]["layers"]) == 2


def test_preset_roundtrip(tmp_path, preset):
    p = str(tmp_path / "voice.npz")
    preset.save(p)
    back = st.VoicePreset.load(p)
    np.testing.assert_array_equal(back.tts_h, preset.tts_h)
    np.testing.assert_array_equal(back.lm_kv[0], preset.lm_kv[0])
    assert int(back.lm_kv[2][0]) == 12


def test_generate_produces_audio(params, preset):
    tokenizer = FallbackTextTokenizer(vocab_size=256)
    proc = VibeVoiceStreamingProcessor(tokenizer)
    out_proc = proc.process_input_with_cached_prompt("hello streaming world test", preset)
    assert out_proc.tts_text_ids.shape[1] == 4
    assert out_proc.tts_lm_input_ids.shape[1] == 12

    out = st.generate(
        CFG,
        params,
        tts_text_ids=out_proc.tts_text_ids,
        preset=preset,
        opts=GenerateOptions(cfg_scale=1.5, ddpm_steps=3),
        max_len=128,
        seed=0,
    )
    audio = out.speech_outputs[0]
    assert audio is not None
    # every frame contributes exactly `hop` samples; the random-weight EOS
    # classifier may end generation after any frame
    assert len(audio) % HOP == 0
    assert len(audio) >= HOP


def test_generate_deterministic(params, preset):
    tts_text = np.random.RandomState(1).randint(10, 200, (1, 7))
    kw = dict(
        tts_text_ids=tts_text,
        preset=preset,
        opts=GenerateOptions(cfg_scale=1.5, ddpm_steps=3),
        max_len=96,
        seed=3,
    )
    a = st.generate(CFG, params, **kw)
    b = st.generate(CFG, params, **kw)
    np.testing.assert_array_equal(a.speech_outputs[0], b.speech_outputs[0])


def test_streamer_receives_chunks(params, preset):
    from vibevoice_tpu.streamer import AudioStreamer

    streamer = AudioStreamer(batch_size=1)
    tts_text = np.random.RandomState(2).randint(10, 200, (1, 5))
    st.generate(
        CFG,
        params,
        tts_text_ids=tts_text,
        preset=preset,
        opts=GenerateOptions(cfg_scale=1.5, ddpm_steps=3),
        max_len=96,
        audio_streamer=streamer,
    )
    chunks = list(streamer.get_stream(0))
    assert chunks and all(len(c) == HOP for c in chunks)


def test_kv_int8_state_and_generate(params, preset):
    """Streaming int8 KV caches: preset rows survive the quantize-on-load
    roundtrip within per-row int8 error, and windowed generation runs
    deterministically on the quantized caches (GenerateOptions.kv_int8)."""
    from vibevoice_tpu.models import qwen2

    state = st.init_stream_state(CFG, params, preset, 256, kv_int8=True)
    assert state.lm_cache.quantized and state.tts_cache.quantized
    assert state.lm_cache.k[0].dtype == jnp.int8
    # dequantized preset rows track the stored float rows within half a
    # quantization step per row
    k_ref = np.asarray(preset.lm_kv[0][0], np.float32)  # layer 0 (1, KH, s, d)
    s, d = k_ref.shape[2], k_ref.shape[3]
    deq = np.asarray(
        qwen2._dequantize_kv(state.lm_cache.k[0], state.lm_cache.k_scale[0], jnp.float32)
    )[:, :, :s, :d]
    bound = np.abs(k_ref).max(axis=-1, keepdims=True) / 127.0 * 0.5 + 1e-6
    np.testing.assert_array_less(np.abs(deq - k_ref), np.broadcast_to(bound, deq.shape))

    tts_text = np.random.RandomState(4).randint(10, 200, (1, 6))
    kw = dict(
        tts_text_ids=tts_text,
        preset=preset,
        opts=GenerateOptions(cfg_scale=1.5, ddpm_steps=3, kv_int8=True),
        max_len=96,
        seed=5,
    )
    a = st.generate(CFG, params, **kw)
    b = st.generate(CFG, params, **kw)
    audio = a.speech_outputs[0]
    assert audio is not None and len(audio) % HOP == 0
    np.testing.assert_array_equal(audio, b.speech_outputs[0])


def test_text_window_padding(params, preset):
    """Last partial text window (< 5 tokens) is right-padded with a valid
    mask; generation still runs."""
    out = st.generate(
        CFG,
        params,
        tts_text_ids=np.array([[11, 12]]),  # 2 < TTS_TEXT_WINDOW_SIZE
        preset=preset,
        opts=GenerateOptions(cfg_scale=1.5, ddpm_steps=3),
        max_len=96,
    )
    assert out.speech_outputs[0] is not None


def test_generate_stops_before_cache_capacity(params, preset):
    """The window loop stops BEFORE a text+speech window would advance the
    tts caches past max_len (regression: the bound was only checked at the
    loop top, so the final windows clamp-wrote onto committed KV slots)."""
    preset_len = int(preset.tts_kv[2][0])  # 12
    tts_text = np.random.RandomState(2).randint(10, 200, (1, 40))
    for budget in (11, 12, 21, 22):  # exactly one / almost-two window pairs
        out = st.generate(
            CFG,
            params,
            tts_text_ids=tts_text,
            preset=preset,
            opts=GenerateOptions(cfg_scale=1.5, ddpm_steps=2),
            max_len=preset_len + budget,
            seed=0,
        )
        gen_tokens = out.sequences.shape[1] - 40
        # every emitted window fits the budget (5 text + 6 speech = 11)
        assert gen_tokens <= budget, (budget, gen_tokens)
        audio = out.speech_outputs[0]
        n_audio = 0 if audio is None else len(audio)
        assert n_audio <= (budget // 11) * 6 * HOP


def test_streaming_processor_surface(tmp_path):
    """Reference public-API parity (vibevoice_streaming_processor.py:135-421):
    save_pretrained round-trip, prepare_speech_inputs padding + masks across
    np/jax/pt, decode/batch_decode passthroughs, save_audio, model_input_names,
    and the intentionally-raising __call__."""
    tokenizer = FallbackTextTokenizer(vocab_size=256)
    proc = VibeVoiceStreamingProcessor(tokenizer)

    # __call__ raises by design (reference :169-178)
    with pytest.raises(NotImplementedError):
        proc("some text")

    # save_pretrained -> preprocessor_config.json -> from_pretrained round-trip
    d = str(tmp_path / "proc")
    proc.save_pretrained(d)
    import json, os
    with open(os.path.join(d, "preprocessor_config.json")) as f:
        cfg = json.load(f)
    assert cfg["processor_class"] == "VibeVoiceStreamingProcessor"
    assert cfg["speech_tok_compress_ratio"] == 3200
    back = VibeVoiceStreamingProcessor.from_pretrained(d, allow_fallback_tokenizer=True)
    assert back.speech_tok_compress_ratio == 3200
    assert back.db_normalize is True

    # prepare_speech_inputs: ragged batch -> right-padded + frame masks
    rng = np.random.RandomState(0)
    wavs = [rng.randn(6400).astype(np.float32), rng.randn(3200).astype(np.float32)]
    out = proc.prepare_speech_inputs(wavs)
    assert out["padded_speeches"].shape == (2, 6400)
    assert out["speech_masks"].shape == (2, 2)
    np.testing.assert_array_equal(out["speech_masks"], [[True, True], [True, False]])
    np.testing.assert_array_equal(out["padded_speeches"][1, 3200:], 0.0)
    jx = proc.prepare_speech_inputs(wavs, return_tensors="jax")
    assert "jax" in type(jx["padded_speeches"]).__module__
    import torch
    pt = proc.prepare_speech_inputs(wavs, return_tensors="pt")
    assert isinstance(pt["padded_speeches"], torch.Tensor)
    assert pt["speech_masks"].dtype == torch.bool
    empty = proc.prepare_speech_inputs([])
    assert empty == {"padded_speeches": None, "speech_masks": None}

    # decode/batch_decode passthrough
    ids = tokenizer.encode("hello world")
    assert proc.decode(ids) == tokenizer.decode(ids)
    assert proc.batch_decode([ids, ids]) == [tokenizer.decode(ids)] * 2

    # save_audio delegates (single + batch-dir + normalize)
    wav_path = proc.save_audio(np.zeros(2400, np.float32), str(tmp_path / "a.wav"))
    assert os.path.exists(wav_path)
    paths = proc.save_audio(
        rng.randn(2, 2400).astype(np.float32) * 0.01,
        str(tmp_path / "batch"), normalize=True,
    )
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    names = proc.model_input_names
    assert "speech_inputs" in names and "speech_input_mask" in names
