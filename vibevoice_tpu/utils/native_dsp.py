"""ctypes bindings for the native audio DSP core (native/audio_dsp.cpp).

Falls back to the scipy/numpy implementations in processor/audio.py when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    # explicit override first
    env = os.environ.get("VIBEVOICE_TPU_NATIVE_LIB")
    if env:
        return env if os.path.exists(env) else None
    # repo checkout: `make -C native` drops the .so next to its source
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libaudio_dsp.so")
    if os.path.exists(cand):
        return cand
    # pip install: setup.py builds the same source as a setuptools extension
    # shipped inside the package (vibevoice_tpu/_audio_dsp*.so); it exports
    # plain C symbols and is dlopen'd here, never imported
    import glob

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = sorted(glob.glob(os.path.join(pkg, "_audio_dsp*.so")))
    return hits[0] if hits else None


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.vv_resample.restype = ctypes.c_longlong
    lib.vv_resample.argtypes = [
        f32p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_int, f32p, ctypes.c_longlong,
    ]
    lib.vv_db_normalize.restype = None
    lib.vv_db_normalize.argtypes = [f32p, ctypes.c_longlong, ctypes.c_float, ctypes.c_float]
    lib.vv_pcm16_to_float_mono.restype = None
    lib.vv_pcm16_to_float_mono.argtypes = [i16p, ctypes.c_longlong, ctypes.c_int, f32p]
    lib.vv_float_to_pcm16.restype = None
    lib.vv_float_to_pcm16.argtypes = [f32p, ctypes.c_longlong, i16p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def resample(audio: np.ndarray, sr_in: int, sr_out: int, half_taps: int = 32) -> np.ndarray:
    lib = load()
    assert lib is not None, "native DSP library not built (make -C native)"
    x = np.ascontiguousarray(audio, np.float32)
    n_out = (len(x) * sr_out + sr_in - 1) // sr_in
    out = np.empty(n_out, np.float32)
    written = lib.vv_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr_in, sr_out,
        half_taps, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    if written < 0:
        raise ValueError("vv_resample failed")
    return out[:written]


def db_normalize(audio: np.ndarray, target_db_fs: float = -25.0, eps: float = 1e-6) -> np.ndarray:
    lib = load()
    assert lib is not None, "native DSP library not built (make -C native)"
    x = np.ascontiguousarray(audio, np.float32).copy()
    lib.vv_db_normalize(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        ctypes.c_float(target_db_fs), ctypes.c_float(eps),
    )
    return x


def pcm16_to_float_mono(pcm: np.ndarray, channels: int) -> np.ndarray:
    lib = load()
    assert lib is not None, "native DSP library not built (make -C native)"
    x = np.ascontiguousarray(pcm, np.int16)
    frames = len(x) // channels
    out = np.empty(frames, np.float32)
    lib.vv_pcm16_to_float_mono(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), frames, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def float_to_pcm16(audio: np.ndarray) -> np.ndarray:
    lib = load()
    assert lib is not None, "native DSP library not built (make -C native)"
    x = np.ascontiguousarray(audio, np.float32)
    out = np.empty(len(x), np.int16)
    lib.vv_float_to_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out
