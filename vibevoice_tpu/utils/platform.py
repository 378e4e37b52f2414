"""Platform selection helper.

This image's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel) before
user code runs, so exporting JAX_PLATFORMS=cpu has no effect. The CLIs call
`honor_platform_request()` so an explicit user choice (VIBEVOICE_PLATFORM or
a --cpu flag) still wins via jax.config, which IS authoritative before
backend initialisation."""

from __future__ import annotations

import os


def honor_platform_request(cli_choice: str | None = None) -> None:
    choice = cli_choice or os.environ.get("VIBEVOICE_PLATFORM")
    if not choice:
        return
    import jax

    try:
        jax.config.update("jax_platforms", choice)
    except Exception:
        pass
