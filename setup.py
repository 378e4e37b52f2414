"""Build hooks for the optional native DSP extension.

All metadata lives in pyproject.toml; this file exists only to compile
native/audio_dsp.cpp into a shared object shipped inside the package
(`vibevoice_tpu/_audio_dsp*.so`). The library exposes plain C symbols and is
loaded via ctypes (utils/native_dsp.py) — it is never imported as a Python
module, so no CPython API is involved.

The build is OPTIONAL: on a machine without a C++ toolchain the install
succeeds anyway and processor/audio.py uses its scipy/numpy fallbacks
(same outputs, slower host DSP). A repo checkout can instead just
`make -C native` — utils/native_dsp.py searches both locations.
"""

import sys

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.extension import Extension


class OptionalBuildExt(build_ext):
    """A failed native build degrades to the pure-Python fallbacks."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # noqa: BLE001 - any toolchain failure is non-fatal
            print(f"vibevoice-tpu: skipping native DSP build ({e!r}); "
                  "scipy/numpy fallbacks will be used", file=sys.stderr)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001
            print(f"vibevoice-tpu: skipping {ext.name} ({e!r})", file=sys.stderr)


setup(
    ext_modules=[
        Extension(
            "vibevoice_tpu._audio_dsp",
            sources=["native/audio_dsp.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17", "-fPIC"],
            # no Python API used: the .so is dlopen'd via ctypes
            py_limited_api=False,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
