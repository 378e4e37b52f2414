"""Native C++ audio DSP tests (skipped when native/libaudio_dsp.so is absent;
build with `make -C native`)."""

import numpy as np
import pytest

from vibevoice_tpu.utils import native_dsp

pytestmark = pytest.mark.skipif(
    not native_dsp.available(), reason="native DSP library not built"
)


def test_resample_identity():
    x = np.random.RandomState(0).randn(1000).astype(np.float32)
    y = native_dsp.resample(x, 24000, 24000)
    np.testing.assert_array_equal(x, y)


def test_resample_sine_preserved():
    """A 440 Hz tone survives 48k -> 24k resampling with the right length and
    frequency content."""
    sr_in, sr_out = 48000, 24000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = native_dsp.resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    t2 = np.arange(len(y)) / sr_out
    ref = np.sin(2 * np.pi * 440.0 * t2).astype(np.float32)
    # ignore filter edges
    core = slice(200, len(y) - 200)
    err = np.abs(y[core] - ref[core]).max()
    assert err < 0.02, err


def test_resample_matches_scipy():
    from vibevoice_tpu.processor.audio import resample as scipy_resample

    x = np.random.RandomState(1).randn(48000).astype(np.float32) * 0.3
    a = native_dsp.resample(x, 48000, 24000)
    b = scipy_resample(x, 48000, 24000)
    n = min(len(a), len(b))
    core = slice(500, n - 500)
    # different filter designs: compare energy + rough waveform agreement
    corr = np.corrcoef(a[core], b[core])[0, 1]
    assert corr > 0.99, corr


def test_db_normalize_matches_python():
    from vibevoice_tpu.processor.audio import AudioNormalizer

    x = np.random.RandomState(2).randn(24000).astype(np.float32) * 0.05
    a = native_dsp.db_normalize(x)
    b = AudioNormalizer()(x)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pcm_roundtrip():
    x = (np.random.RandomState(3).rand(1000).astype(np.float32) * 1.8 - 0.9)
    pcm = native_dsp.float_to_pcm16(x)
    back = native_dsp.pcm16_to_float_mono(pcm, 1)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_pcm_stereo_average():
    pcm = np.array([1000, 3000, -2000, -4000], np.int16)  # 2 frames, 2 ch
    mono = native_dsp.pcm16_to_float_mono(pcm, 2)
    np.testing.assert_allclose(mono * 32768.0, [2000, -3000], atol=1.0)
