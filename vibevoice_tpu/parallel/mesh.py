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


def batch_shardings(mesh: Mesh, batch_tree) -> Dict:
    """Shard every batch leaf on its leading (batch) axis over dp."""
    dp = _ns(mesh, "dp")
    return jax.tree.map(lambda _: dp, batch_tree)


def shard_params(params: Dict, shardings: Dict) -> Dict:
    return jax.device_put(params, shardings)
