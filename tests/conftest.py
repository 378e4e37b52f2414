"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

The real TPU (when present) is deliberately bypassed in unit tests so they run
anywhere and so sharding tests get 8 devices (SURVEY.md §4 item 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment pins JAX_PLATFORMS=axon (real TPU tunnel) via a site hook;
# the config update below is the reliable CPU override.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
