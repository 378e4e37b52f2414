"""Persistent XLA compilation cache: first compiles of the big fused programs
take 1-3 minutes on TPU; caching them on disk makes subsequent process starts
near-instant. Called by the demos/benches; safe to call multiple times."""

from __future__ import annotations

import os

_DONE = False


def enable(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    path = cache_dir or os.environ.get(
        "VIBEVOICE_COMPILE_CACHE", os.path.expanduser("~/.cache/vibevoice_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options
