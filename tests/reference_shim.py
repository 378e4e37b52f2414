"""Import helper that makes the read-only PyTorch reference at /root/reference
importable for golden-value tests without installing `diffusers`.

The stub implements just enough of diffusers' config plumbing for the
reference's vendored DPMSolverMultistepScheduler to run. Tests that use this
module must be skipped when the reference checkout is absent.
"""

import enum
import inspect
import os
import sys
import types
from dataclasses import dataclass

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "vibevoice"))


class _Config:
    def __init__(self, d):
        self._d = dict(d)

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e


class ConfigMixin:
    def register_to_config(self, **kwargs):
        self.config._d.update(kwargs)


def register_to_config(init):
    sig = inspect.signature(init)

    def wrapped(self, *args, **kwargs):
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        cfg.pop("kwargs", None)
        self.config = _Config(cfg)
        init(self, *args, **kwargs)

    return wrapped


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch

    diffusers = types.ModuleType("diffusers")
    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config

    utils_mod = types.ModuleType("diffusers.utils")
    utils_mod.deprecate = lambda *a, **k: None

    torch_utils_mod = types.ModuleType("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(shape, generator=generator, device=device, dtype=dtype)

    torch_utils_mod.randn_tensor = randn_tensor
    utils_mod.torch_utils = torch_utils_mod

    sched_mod = types.ModuleType("diffusers.schedulers")
    sched_utils_mod = types.ModuleType("diffusers.schedulers.scheduling_utils")

    class KarrasDiffusionSchedulers(enum.Enum):
        DPMSolverMultistepScheduler = 1

    class SchedulerMixin:
        pass

    @dataclass
    class SchedulerOutput:
        prev_sample: "torch.Tensor"

    sched_utils_mod.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    sched_utils_mod.SchedulerMixin = SchedulerMixin
    sched_utils_mod.SchedulerOutput = SchedulerOutput
    sched_mod.scheduling_utils = sched_utils_mod

    diffusers.configuration_utils = cfg_mod
    diffusers.utils = utils_mod
    diffusers.schedulers = sched_mod

    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cfg_mod
    sys.modules["diffusers.utils"] = utils_mod
    sys.modules["diffusers.utils.torch_utils"] = torch_utils_mod
    sys.modules["diffusers.schedulers"] = sched_mod
    sys.modules["diffusers.schedulers.scheduling_utils"] = sched_utils_mod


def import_reference():
    """Returns the reference `vibevoice` package, stubbing its heavy deps."""
    _install_diffusers_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import vibevoice  # noqa: F401

    return vibevoice
