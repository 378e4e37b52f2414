"""One-call facade API (vibevoice_tpu.tts): synthesize/stream on tiny models,
matching the lower-level generate() outputs."""

import numpy as np
import pytest

from vibevoice_tpu.tts import StreamingTTS, VibeVoiceTTS

SCRIPT = "Speaker 1: Hello facade world."


@pytest.fixture(scope="module")
def tts():
    return VibeVoiceTTS.smoke()


def test_synthesize_matches_generate(tts):
    hop = tts.cfg.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(0)
    voices = [rng.randn(hop * 4).astype(np.float32) * 0.05]
    audio = tts.synthesize(
        SCRIPT, voices=voices, ddpm_steps=2, max_length=96, seed=3
    )
    assert audio.dtype == np.float32
    assert len(audio) % hop == 0

    # identical call through the raw layers gives the identical waveform
    from vibevoice_tpu.models import inference as inf

    proc_out = tts.processor(text=SCRIPT, voice_samples=[voices])
    out = inf.generate(
        tts.cfg, tts.params,
        input_ids=proc_out.input_ids,
        valid_mask=proc_out.attention_mask,
        speech_tensors=proc_out.speech_tensors,
        speech_frame_valid=proc_out.speech_masks,
        speech_input_mask=proc_out.speech_input_mask,
        tokens=tts.tokens,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=96),
        seed=3,
    )
    ref = out.speech_outputs[0]
    ref = np.zeros(0, np.float32) if ref is None else np.asarray(ref)
    np.testing.assert_array_equal(audio, ref)


def test_stream_concatenates_to_synthesize(tts):
    hop = tts.cfg.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(1)
    voices = [rng.randn(hop * 4).astype(np.float32) * 0.05]
    kw = dict(voices=voices, ddpm_steps=2, max_length=96, seed=5)
    whole = tts.synthesize(SCRIPT, **kw)
    chunks = [np.asarray(c).reshape(-1) for c in tts.stream(SCRIPT, **kw)]
    got = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    np.testing.assert_array_equal(got, whole)


def test_stream_early_close_stops_worker(tts):
    hop = tts.cfg.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(2)
    voices = [rng.randn(hop * 4).astype(np.float32) * 0.05]
    it = tts.stream(SCRIPT, voices=voices, ddpm_steps=2, max_length=96)
    for _ in it:
        break  # consumer walks away after (at most) one chunk
    it.close()  # must not hang: stop_check_fn ends the generate loop


def test_streaming_tts_smoke():
    rt = StreamingTTS.smoke()
    audio = rt.synthesize("hello streaming", ddpm_steps=2)
    assert audio.dtype == np.float32
    hop = rt.cfg.acoustic_tokenizer_config.hop_length
    assert len(audio) % hop == 0
    assert len(audio) > 0  # EOS classifier on random weights still emits >=1 window


def test_streaming_tts_warmup():
    """warmup() compiles the windowed generate path by driving (and bounding)
    one synthetic stream; a real stream afterwards behaves normally."""
    rt = StreamingTTS.smoke()
    assert rt.warmup(max_frames=3, ddpm_steps=2) > 0
    audio = rt.synthesize("hello after warmup", ddpm_steps=2)
    assert len(audio) > 0
