"""Orbax-backed checkpointing for training state (multi-host-ready).

The reference relies on HF Trainer's `resume_from_checkpoint` and
save_pretrained sharded safetensors (SURVEY.md §5 checkpoint/resume). Here the
native formats are:

* `hf_interop.save_native` — simple pickle+JSON for model params (portable)
* this module — orbax `StandardCheckpointer` for full TrainState pytrees with
  sharding-aware restore (use on pods; falls back cleanly when orbax is
  unavailable)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False


def save_train_state(path: str, state: Any) -> None:
    """Save a TrainState (or any pytree) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, target: Any) -> Any:
    """Restore into the structure (and shardings) of `target`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)
