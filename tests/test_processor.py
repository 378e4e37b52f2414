"""Processor + streamer tests: prompt format, script parsing, audio
normalization, padding (SURVEY.md §4 item 1)."""

import queue
import numpy as np
import pytest

from vibevoice_tpu.processor.audio import AudioNormalizer, write_wav, read_wav, resample
from vibevoice_tpu.processor.processor import VibeVoiceProcessor
from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer
from vibevoice_tpu.streamer import AudioStreamer


@pytest.fixture
def proc():
    return VibeVoiceProcessor(tokenizer=FallbackTextTokenizer())


def test_parse_script_basic(proc):
    parsed = proc._parse_script("Speaker 1: hello there\nSpeaker 2: hi!")
    assert parsed == [(0, " hello there"), (1, " hi!")]


def test_parse_script_zero_based_kept(proc):
    parsed = proc._parse_script("Speaker 0: a\nSpeaker 1: b")
    assert [s for s, _ in parsed] == [0, 1]


def test_parse_script_multiple_colons(proc):
    parsed = proc._parse_script("Speaker 1: time: 10:30 pm")
    assert parsed == [(0, " time: 10:30 pm")]


def test_parse_script_rejects_empty(proc):
    with pytest.raises(ValueError):
        proc._parse_script("no speakers here")


def test_prompt_structure(proc):
    tk = proc.tokenizer
    wav = np.random.RandomState(0).randn(3200 * 3 + 100).astype(np.float32) * 0.05
    out = proc(text="Speaker 1: hello world", voice_samples=[[wav]])
    ids = out.input_ids[0]
    # voice prompt: ceil(len/3200)=4 diffusion placeholders, masked True
    assert out.speech_input_mask.sum() == 4
    masked_ids = ids[out.speech_input_mask[0]]
    assert (masked_ids == tk.speech_diffusion_id).all()
    # prompt ends with <speech_start>
    n_valid = out.attention_mask[0].sum()
    assert ids[n_valid - 1] == tk.speech_start_id
    # speech tensors carry the wav; frame mask has 4 valid frames
    assert out.speech_tensors.shape[0] == 1
    assert out.speech_masks.sum() == 4


def test_right_padding_batch(proc):
    out = proc(text=["Speaker 1: one two three four five", "Speaker 1: hi"])
    assert out.input_ids.shape[0] == 2
    # right padding: valid prefix then pads
    for b in range(2):
        m = out.attention_mask[b]
        n = m.sum()
        assert m[:n].all() and not m[n:].any()
    assert out.attention_mask[0].sum() > out.attention_mask[1].sum()


def test_txt_file_ingestion(proc, tmp_path):
    p = tmp_path / "script.txt"
    p.write_text("hello without speaker\nSpeaker 2: with speaker\n")
    out = proc(text=str(p))
    assert len(out.parsed_scripts[0]) == 2
    assert out.parsed_scripts[0][0][0] == 0  # "Speaker 1" default -> 0-based


def test_json_file_ingestion(proc, tmp_path):
    p = tmp_path / "script.json"
    p.write_text('[{"speaker": 1, "text": "hello"}, {"speaker": 2, "text": "world"}]')
    out = proc(text=str(p))
    assert [s for s, _ in out.parsed_scripts[0]] == [0, 1]


def test_audio_normalizer_target_db():
    rng = np.random.RandomState(0)
    audio = rng.randn(24000).astype(np.float32) * 0.3
    norm = AudioNormalizer()(audio)
    rms = np.sqrt(np.mean(norm**2))
    db = 20 * np.log10(rms)
    assert abs(db - (-25)) < 0.5 or np.abs(norm).max() <= 1.0


def test_audio_normalizer_anticlip():
    audio = np.ones(1000, np.float32) * 0.001  # quiet -> would amplify over 1
    norm = AudioNormalizer()(audio)
    assert np.abs(norm).max() <= 1.0


def test_wav_roundtrip(tmp_path):
    sig = (np.sin(np.linspace(0, 100, 24000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, sig, 24000)
    back, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(back, sig, atol=1e-3)


def test_resample_length():
    x = np.random.RandomState(0).randn(48000).astype(np.float32)
    y = resample(x, 48000, 24000)
    assert len(y) == 24000


def test_streamer_ordering_and_termination():
    s = AudioStreamer(batch_size=2)
    s.put([np.ones(4), np.ones(4) * 2], [0, 1])
    s.put([np.ones(4) * 3], [0])
    s.end([1])
    s.end([0])
    out0 = list(s.get_stream(0))
    assert len(out0) == 2
    np.testing.assert_array_equal(out0[1], np.ones(4) * 3)
    out1 = list(s.get_stream(1))
    assert len(out1) == 1


def test_streamer_ignores_after_end():
    s = AudioStreamer(batch_size=1)
    s.end([0])
    s.put([np.ones(4)], [0])  # should be dropped
    assert list(s.get_stream(0)) == []


def test_batch_iterator():
    s = AudioStreamer(batch_size=2)
    s.put([np.ones(2), np.ones(2) * 2], [0, 1])
    s.end()
    got = sorted((i, v.sum()) for i, v in s)
    assert got == [(0, 2.0), (1, 4.0)]


def test_async_streamer():
    import asyncio

    from vibevoice_tpu.streamer import AsyncAudioStreamer

    async def run():
        s = AsyncAudioStreamer(batch_size=2, loop=asyncio.get_event_loop())
        s.put([np.ones(4), np.ones(4) * 2], [0, 1])
        s.put([np.ones(4) * 3], [0])
        s.end()
        out0 = [c async for c in s.get_stream(0)]
        out1 = [c async for c in s.get_stream(1)]
        return out0, out1

    out0, out1 = asyncio.run(run())
    assert len(out0) == 2 and len(out1) == 1
    np.testing.assert_array_equal(out0[1], np.ones(4) * 3)


def test_call_kwargs_surface(proc):
    """Reference __call__ kwargs (vibevoice_processor.py:163-244): padding
    strategies, truncation, return_tensors, return_attention_mask."""
    import numpy as np
    import pytest

    texts = ["Speaker 1: short", "Speaker 1: a somewhat longer line of text here"]

    # padding=False -> ragged python lists
    out = proc(texts, padding=False, return_tensors=None)
    assert isinstance(out.input_ids, list) and isinstance(out.input_ids[0], list)
    assert len(out.input_ids[0]) != len(out.input_ids[1])
    assert all(all(m for m in row) for row in out.attention_mask)

    # ragged + tensors is an explicit error
    with pytest.raises(ValueError, match="requires padding"):
        proc(texts, padding=False, return_tensors="np")

    # padding="max_length" pads to the requested length
    out = proc(texts, padding="max_length", max_length=64)
    assert out.input_ids.shape == (2, 64)

    # truncation chops ids + speech mask together
    full = proc(texts)
    out = proc(texts, truncation=True, max_length=5)
    assert out.input_ids.shape == (2, 5)
    np.testing.assert_array_equal(out.input_ids, full.input_ids[:, :5])

    # return_tensors variants
    out = proc(texts, return_tensors="jax")
    import jax.numpy as jnp

    assert isinstance(out.input_ids, jnp.ndarray)
    out = proc(texts, return_tensors="pt")
    import torch

    assert isinstance(out.input_ids, torch.Tensor)
    out = proc(texts, return_tensors=None)
    assert isinstance(out.input_ids, list)

    # no attention mask on request
    out = proc(texts, return_attention_mask=False)
    assert out.attention_mask is None

    # unknown kwargs are loud, not silently ignored (old behavior)
    with pytest.raises(TypeError, match="unsupported processor kwargs"):
        proc(texts, some_unknown_kwarg=1)


def test_decode_passthroughs(proc):
    ids = proc.tokenizer.encode("hello world")
    assert isinstance(proc.decode(ids), str)
    outs = proc.batch_decode([ids, ids])
    assert len(outs) == 2 and outs[0] == outs[1]
