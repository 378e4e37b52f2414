"""Smoke tests for the Gradio demo backend (no gradio needed: build_ui is
not touched). Covers the streaming-consumer generator contract the UI relies
on: buffered streaming yields, then a final complete-audio WAV yield
(reference demo/gradio_demo.py:352-530, :846-868)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))


def test_generate_streaming_yields_chunks_then_complete(tmp_path):
    import gradio_demo as gd

    demo = gd.VibeVoiceDemo(model_path=None, ddpm_steps=2, min_buffer_sec=0.0,
                            min_interval_sec=0.0)
    outs = list(
        demo.generate_streaming(
            "Speaker 1: hello there\nSpeaker 2: hi", None, 1.3, 2, 7, "sess-a"
        )
    )
    assert len(outs) >= 1
    *stream_yields, final = outs
    chunk_samples = 0
    for chunk, complete, log in stream_yields:
        assert complete is None
        sr, arr = chunk
        assert sr == gd.SAMPLE_RATE and arr.dtype == np.int16
        chunk_samples += len(arr)
    f_chunk, f_path, f_log = final
    assert f_chunk is None
    if f_path is not None:  # tiny random weights may emit zero frames
        assert os.path.exists(f_path) and f_path.endswith(".wav")
        from vibevoice_tpu.processor.audio import read_wav

        wav, sr = read_wav(f_path)
        assert sr == gd.SAMPLE_RATE
        assert len(wav) == chunk_samples  # complete take == sum of streamed chunks
        assert "real-time" in f_log
        os.unlink(f_path)


def test_generate_streaming_random_seed_and_stop():
    import gradio_demo as gd

    demo = gd.VibeVoiceDemo(model_path=None, ddpm_steps=2, min_buffer_sec=0.0,
                            min_interval_sec=0.0)
    gen = demo.generate_streaming(
        "Speaker 1: stop me", None, 1.3, 2, -1, "sess-b"  # -1 = random seed
    )
    demo.stop("sess-b")  # stop before consuming: generator must still finish
    outs = list(gen)
    assert outs[-1][0] is None  # final yield is the complete-audio slot
