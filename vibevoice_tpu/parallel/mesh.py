"""Device-mesh parallelism: DP x TP sharding over ICI.

TPU-native replacement for the reference's parallel surface (SURVEY.md §2.10):
the HF `base_model_tp_plan` colwise/rowwise annotations
(reference configuration_vibevoice.py:175-183) become NamedShardings on the
Qwen2 parameter pytree; DDP/accelerate becomes batch sharding over the "dp"
axis; the one NCCL all_reduce (speech stats) is a psum inside the loss
(finetune/loss.py).

Mesh axes: ("dp", "tp"). Activations are sharded batch-on-dp; TP sharding of
q/k/v/gate/up on the output dim and o/down on the input dim means XLA inserts
exactly one all-reduce per attention block and one per MLP block — the
standard Megatron decomposition, expressed declaratively.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def make_hybrid_mesh(dcn: int = 1, dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """Multi-slice mesh for multi-host training: axes ("dcn", "dp", "tp").

    "dcn" is the slow inter-slice axis — only pure data parallelism rides it
    (batch sharding + the once-per-run speech-stats reduction); "dp"/"tp" stay
    within a slice over ICI, exactly like make_mesh. On real multi-slice
    systems `mesh_utils.create_hybrid_device_mesh` orders devices so the dcn
    axis crosses slices; on flat/virtual device sets (tests, single slice) a
    plain reshape is used — the axis semantics are identical.
    """
    devices = devices if devices is not None else jax.devices()
    n = dcn * dp * tp
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (dp, tp), dcn_mesh_shape=(dcn, 1), devices=devices[:n]
        ).reshape(dcn, dp, tp)
    except Exception:  # virtual CPU meshes have no slice topology
        arr = np.asarray(devices[:n]).reshape(dcn, dp, tp)
    return Mesh(arr, ("dcn", "dp", "tp"))


def data_axes(mesh: Mesh) -> tuple:
    """The mesh axes a batch's leading dim shards over (dcn first, then dp)."""
    return tuple(a for a in ("dcn", "dp") if a in mesh.shape)


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def qwen2_param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """TP plan for the LM (maps the reference colwise/rowwise table)."""
    rep = _ns(mesh)
    col_w = _ns(mesh, None, "tp")  # weights stored (in, out): shard out
    col_b = _ns(mesh, "tp")
    row_w = _ns(mesh, "tp", None)  # shard in; output needs psum (XLA inserts)

    def layer(lp):
        return {
            "input_norm": {"w": rep},
            "attn": {
                "q": {"w": col_w, "b": col_b},
                "k": {"w": col_w, "b": col_b},
                "v": {"w": col_w, "b": col_b},
                "o": {"w": row_w},
            },
            "post_norm": {"w": rep},
            "mlp": {"gate": {"w": col_w}, "up": {"w": col_w}, "down": {"w": row_w}},
        }

    return {
        "embed": rep,
        "layers": [layer(lp) for lp in params["layers"]],
        "final_norm": {"w": rep},
    }


def model_param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """Shardings for the full composite model: LM tensor-parallel, everything
    else (tokenizers, connectors, diffusion head — all small) replicated."""
    rep = _ns(mesh)
    out = jax.tree.map(lambda _: rep, params)
    out["lm"] = qwen2_param_shardings(params["lm"], mesh)
    return out


def fsdp_param_shardings(
    params: Dict,
    mesh: Mesh,
    *,
    axis: str = "dp",
    min_leaf_size: int = 1 << 16,
) -> Dict:
    """FSDP/ZeRO-3 shardings: every large parameter leaf additionally shards
    one dimension over the data axis, on top of the TP plan.

    The reference only gestures at FSDP ("for FSDP compatibility" buffer
    comments, modeling_vibevoice.py:130-132, tie-before-FSDP :239-264); here
    it is the idiomatic GSPMD form: parameters (and therefore the optimizer
    state built from them — AdamW moments are zeros_like the params) live
    sharded over the SAME axis the batch shards over, XLA all-gathers each
    weight just-in-time for its matmul in forward/backward and
    reduce-scatters its gradient. That is exactly ZeRO-3 dataflow, expressed
    declaratively — no wrapper classes, no manual collectives.

    For each leaf the largest dimension not already sharded (by tp) and
    divisible by the axis size is picked; small leaves (< min_leaf_size
    elements — norms, biases, scalars) stay on their TP-plan sharding, their
    all-gather latency would cost more than the memory saved.

    AdamW on a 7B bf16 model carries ~56 GB of f32 moments+master math —
    unshardable on any single 16 GB chip; with fsdp over dp=4 the per-chip
    optimizer-state footprint drops 4x while the tp axis keeps the matmul
    sharding.
    """
    base = model_param_shardings(params, mesh)
    n_shards = mesh.shape.get(axis, 1)
    if n_shards == 1:
        return base

    def upgrade(p, ns):
        if p.size < min_leaf_size:
            return ns
        spec = list(ns.spec) + [None] * (p.ndim - len(ns.spec))
        cands = [
            i for i in range(p.ndim) if spec[i] is None and p.shape[i] % n_shards == 0
        ]
        if not cands:
            return ns
        i = max(cands, key=lambda j: p.shape[j])
        spec[i] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(upgrade, params, base)


def batch_shardings(mesh: Mesh, batch_tree) -> Dict:
    """Shard every batch leaf on its leading (batch) axis over the data axes
    (("dcn", "dp") on a hybrid mesh, "dp" otherwise)."""
    sh = _ns(mesh, data_axes(mesh))
    return jax.tree.map(lambda _: sh, batch_tree)


def shard_params(params: Dict, shardings: Dict) -> Dict:
    return jax.device_put(params, shardings)
