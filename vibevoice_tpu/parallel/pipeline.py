"""Pipeline parallelism (GPipe) for the Qwen2 LM training forward.

The reference has NO pipeline parallelism (SURVEY.md §2.10: PP absent; its
multi-GPU story is DDP + an HF TP plan). This module adds it TPU-natively for
training runs where the layer stack itself must span chips (e.g. 7B+ full
fine-tunes on small-HBM parts where even fsdp+tp leaves too little room for
activations): the LM's layers are split into `pp` contiguous stages, each
stage's parameters live on one mesh slice along a "pp" axis, and micro-batches
flow through the stages GPipe-style with `lax.ppermute` handing activations to
the next stage.

Idiomatic-JAX shape of the thing:
  * stage parameters = ONE stacked pytree with a leading (pp, L/pp) dim,
    sharded P("pp", ...) — no per-stage Python objects;
  * the schedule = a single `lax.scan` over M + pp - 1 ticks inside
    `shard_map`; every device runs the same program (SPMD), devices whose
    tick carries no live micro-batch compute on garbage and the result is
    masked out — branchless, compiler-friendly;
  * activations move stage→stage with `lax.ppermute` (ICI neighbor hop),
    outputs leave the pipe via a `psum` of a buffer only the last stage
    writes. Both collectives are differentiable, so `jax.grad` through this
    forward IS the backward pipeline (reverse schedule, transposed
    ppermute) — no hand-written backward pass.

Bubble fraction is the GPipe (pp-1)/(M+pp-1); pick n_microbatches >= 4*pp to
keep it under ~20%.

Exactness: each micro-batch runs the very same `qwen2._layer` stack with the
same masks/rope as `qwen2.forward` (training path), and the only arithmetic
the pipeline adds is `x + 0` (psum with zero-initialized buffers) — so the
pipelined forward is bit-identical to the dense one and grads match to float
associativity (pinned by tests/test_pipeline.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 (check_vma keyword)
    from jax import shard_map as _jax_shard_map

    def shard_map(f, **kw):
        kw["check_vma"] = kw.pop("check_rep", True)
        return _jax_shard_map(f, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..configs import Qwen2Config
from ..models import qwen2


def make_pp_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """Mesh with a pipeline axis: ("dp", "pp"). Stages should be ICI
    neighbors — the ppermute hop is the only stage-to-stage traffic."""
    devices = devices if devices is not None else jax.devices()
    if dp * pp > len(devices):
        raise ValueError(f"need {dp * pp} devices, have {len(devices)}")
    arr = np.asarray(devices[: dp * pp]).reshape(dp, pp)
    return Mesh(arr, ("dp", "pp"))


def stack_layers(lm_params: Dict, pp: int) -> Dict:
    """Repack the per-layer param list into the pipeline layout:
    {"embed", "final_norm", "layers_stacked"} where every layer leaf gains a
    leading (pp, L/pp) pair of dims (dim 0 shards over "pp")."""
    layers = lm_params["layers"]
    n = len(layers)
    if n % pp != 0:
        raise ValueError(f"{n} layers not divisible by pp={pp}")
    stacked = jax.tree.map(
        lambda *ls: jnp.stack(ls).reshape((pp, n // pp) + ls[0].shape), *layers
    )
    out = {k: v for k, v in lm_params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def unstack_layers(pp_lm_params: Dict) -> Dict:
    """Inverse of stack_layers (checkpoint interop: saves keep the list
    layout)."""
    stacked = pp_lm_params["layers_stacked"]
    any_leaf = jax.tree_util.tree_leaves(stacked)[0]
    pp, per = any_leaf.shape[:2]
    layers = [
        jax.tree.map(lambda l, s=s, i=i: l[s, i], stacked)
        for s in range(pp)
        for i in range(per)
    ]
    out = {k: v for k, v in pp_lm_params.items() if k != "layers_stacked"}
    out["layers"] = layers
    return out


def pp_lm_param_shardings(pp_lm_params: Dict, mesh: Mesh) -> Dict:
    """Stage dim of layers_stacked shards over "pp"; embed/final_norm
    replicate (they run outside the pipe)."""
    rep = NamedSharding(mesh, P())
    out = jax.tree.map(lambda _: rep, pp_lm_params)
    out["layers_stacked"] = jax.tree.map(
        lambda l: NamedSharding(mesh, P("pp")), pp_lm_params["layers_stacked"]
    )
    return out


def pp_model_param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """Full composite model: LM pipelined, everything else replicated."""
    rep = NamedSharding(mesh, P())
    out = jax.tree.map(lambda _: rep, params)
    out["lm"] = pp_lm_param_shardings(params["lm"], mesh)
    return out


def _mb_forward(cfg: Qwen2Config, stage_layers, x, valid, remat: bool, remat_policy=None):
    """One micro-batch through this device's local layers. Mask/rope/flash
    dispatch comes from qwen2.train_attention_inputs — the SAME construction
    as qwen2.forward's training path, so the pipeline also rides the
    differentiable flash kernel at long T."""
    positions, mask, train_valid = qwen2.train_attention_inputs(cfg, valid)
    cos, sin = qwen2.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, x.dtype)

    def body(x, lp):
        def run(lp, x):
            return qwen2._layer(cfg, lp, x, cos, sin, mask=mask, train_valid=train_valid)[0]

        if remat:
            run = jax.checkpoint(run, policy=remat_policy)
        return run(lp, x), None

    x, _ = jax.lax.scan(body, x, stage_layers)
    return x


def pipelined_forward(
    cfg: Qwen2Config,
    pp_lm_params: Dict,
    embeds: jnp.ndarray,
    mesh: Mesh,
    *,
    valid_mask: Optional[jnp.ndarray] = None,
    n_microbatches: int = 4,
    remat: bool = False,
    remat_policy=None,
) -> jnp.ndarray:
    """GPipe forward over the "pp" mesh axis. Returns hidden (B, T, H) after
    the final norm — the pipelined equivalent of
    ``qwen2.forward(cfg, lm_params, embeds, valid_mask=...)[0]``.

    The batch dim must split into n_microbatches (times the dp shards when
    the mesh has a dp axis).
    """
    b, t, h = embeds.shape
    m = n_microbatches
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by n_microbatches={m}")
    if valid_mask is None:
        valid_mask = jnp.ones((b, t), bool)
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    if (b // m) % dp != 0:
        raise ValueError(f"microbatch {b // m} not divisible by dp={dp}")

    xs = embeds.reshape(m, b // m, t, h)
    vs = valid_mask.reshape(m, b // m, t)

    # batch within each microbatch shards over dp, microbatch dim replicated;
    # stage params shard over pp
    x_spec = P(None, "dp")
    l_spec = jax.tree.map(lambda _: P("pp"), pp_lm_params["layers_stacked"])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(l_spec, x_spec, x_spec),
        out_specs=x_spec,
        check_rep=False,
    )
    def pipe(stage_layers, xs, vs):
        # local shapes: stage_layers leaves (1, L/pp, ...), xs (m, bm, t, h)
        stage_layers = jax.tree.map(lambda l: l[0], stage_layers)
        stage = jax.lax.axis_index("pp")
        bm = xs.shape[1]
        state = jnp.zeros((bm, t, h), xs.dtype)
        outputs = jnp.zeros_like(xs)

        def tick(carry, i):
            state, outputs = carry
            my_mb = i - stage  # micro-batch index this stage handles at tick i
            idx = jnp.clip(my_mb, 0, m - 1)
            x_in = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(xs, idx, 0, keepdims=False),
                state,
            )
            v = jax.lax.dynamic_index_in_dim(vs, idx, 0, keepdims=False)
            out = _mb_forward(cfg, stage_layers, x_in, v, remat, remat_policy)
            live = (my_mb >= 0) & (my_mb < m)
            # only the last stage's live outputs leave the pipe
            write = live & (stage == pp - 1)
            updated = jax.lax.dynamic_update_index_in_dim(outputs, out, idx, 0)
            outputs = jnp.where(write, updated, outputs)
            # hand activations to the next stage (ring; stage pp-1 -> 0 link
            # carries garbage that stage 0 ignores)
            state = jax.lax.ppermute(
                out, "pp", [(j, (j + 1) % pp) for j in range(pp)]
            )
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(m + pp - 1)
        )
        # non-final stages hold zeros; psum broadcasts the result (x + 0 is
        # exact in floating point)
        return jax.lax.psum(outputs, "pp")

    hidden = pipe(pp_lm_params["layers_stacked"], xs, vs).reshape(b, t, h)
    return qwen2.rms_norm(
        hidden, pp_lm_params["final_norm"]["w"], cfg.rms_norm_eps
    )


def make_pp_lm_forward(mesh: Mesh, n_microbatches: int = 4):
    """An `lm_forward` hook for finetune.loss.train_forward: routes the LM
    through the pipeline (params["lm"] must be in stack_layers layout)."""

    def lm_forward(cfg, lm_params, embeds, valid_mask, remat, remat_policy=None):
        return pipelined_forward(
            cfg,
            lm_params,
            embeds,
            mesh,
            valid_mask=valid_mask,
            n_microbatches=n_microbatches,
            remat=remat,
            remat_policy=remat_policy,
        )

    return lm_forward
