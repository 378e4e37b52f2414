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


def save_params_sharded(path: str, params: Any) -> None:
    """Save a (possibly mesh-sharded) param pytree. Orbax writes each shard
    from the host that owns it — on a pod this is the multi-host sharded
    model checkpoint (the TPU analog of the reference's sharded safetensors,
    reference scripts/convert_nnscaler_checkpoint_to_transformers.py:119-123);
    every host must call this collectively."""
    save_train_state(path, params)


def restore_params_sharded(path: str, like: Any, shardings: Optional[Any] = None) -> Any:
    """Restore params directly INTO mesh shardings: each host reads only the
    shards it owns (no full-model host copy — required for 7B+ restores).

    `like` supplies shapes/dtypes (real arrays or ShapeDtypeStructs);
    `shardings` is a matching pytree of NamedShardings (defaults to whatever
    sharding `like` itself carries)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if shardings is None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
    else:
        abstract = jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s), like, shardings
        )
    return ckptr.restore(path, abstract)
