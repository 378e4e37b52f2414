"""Multi-host (DCN) training surface on the 8-device virtual mesh:
hybrid DCN x DP x TP mesh construction + a full training step over it, the
mesh-aware trainer CLI in smoke mode, and orbax SHARDED checkpoint
save/restore that preserves NamedShardings (the multi-host model-checkpoint
path — SURVEY.md §5 checkpoint/resume, upgraded TPU-native)."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# fast gate (-m "not slow") skips this module: subprocess trainer + hybrid-mesh steps (~157 s serial)
pytestmark = pytest.mark.slow

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.parallel import mesh as pmesh

CFG = tiny_config()


def test_hybrid_mesh_axes():
    mesh = pmesh.make_hybrid_mesh(dcn=2, dp=2, tp=2)
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    assert pmesh.data_axes(mesh) == ("dcn", "dp")
    # plain mesh keeps its dp-only data axis
    assert pmesh.data_axes(pmesh.make_mesh(dp=4, tp=2)) == ("dp",)


def test_hybrid_mesh_train_step():
    """One full training step with batch sharded over (dcn, dp) and params
    TP-sharded: loss finite and equal to the single-device step."""
    from vibevoice_tpu.finetune.loss import Batch, TrainOptions
    from vibevoice_tpu.finetune.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    mesh = pmesh.make_hybrid_mesh(dcn=2, dp=2, tp=2)
    params = vv.init(jax.random.PRNGKey(0), CFG)

    b, t, f = 4, 32, 4
    hop = CFG.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 100, (b, t)).astype(np.int32)
    am = np.zeros((b, t), bool)
    am[:, 8 : 8 + f] = True
    batch = Batch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((b, t), bool),
        speech_tensors=jnp.asarray(rng.randn(b, hop * f).astype(np.float32)),
        speech_masks=jnp.ones((b, f), bool),
        speech_semantic_tensors=jnp.asarray(rng.randn(b, f, CFG.semantic_vae_dim).astype(np.float32)),
        speeches_loss_input=jnp.ones((b,), bool),
        acoustic_input_mask=jnp.asarray(am),
        acoustic_loss_mask=jnp.asarray(am),
    )
    optimizer = make_optimizer()
    step = jax.jit(make_train_step(CFG, optimizer, TrainOptions(dp_axis=None)))

    ref_state = init_train_state(params, optimizer)
    _, ref_out = step(ref_state, batch, jax.random.PRNGKey(1))

    sp = pmesh.shard_params(params, pmesh.model_param_shardings(params, mesh))
    sb = jax.device_put(batch, pmesh.batch_shardings(mesh, batch))
    state = init_train_state(sp, optimizer)
    # the sharded run additionally exercises the 16 GB-chip memory levers
    # (remat + chunked CE) — both exact, so the loss must still match
    mem_step = jax.jit(
        make_train_step(CFG, optimizer, TrainOptions(dp_axis=None, remat=True, ce_chunk_size=8))
    )
    state, out = mem_step(state, sb, jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    np.testing.assert_allclose(float(out.loss), float(ref_out.loss), rtol=1e-4)


def test_orbax_sharded_params_roundtrip(tmp_path):
    """TP-sharded params save + restore INTO shardings: values identical and
    the restored leaves carry the requested NamedShardings."""
    from vibevoice_tpu.utils import checkpoint as ckpt

    if not ckpt.have_orbax():
        pytest.skip("orbax unavailable")

    mesh = pmesh.make_mesh(dp=2, tp=2)
    params = vv.init(jax.random.PRNGKey(0), CFG)
    shardings = pmesh.model_param_shardings(params, mesh)
    sharded = pmesh.shard_params(params, shardings)

    path = os.path.join(str(tmp_path), "params")
    ckpt.save_params_sharded(path, sharded)
    restored = ckpt.restore_params_sharded(path, sharded, shardings)

    flat_a, _ = jax.tree_util.tree_flatten(sharded)
    flat_b, _ = jax.tree_util.tree_flatten(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding == a.sharding, (b.sharding, a.sharding)


def test_trainer_cli_mesh_smoke(tmp_path):
    """The trainer CLI runs end-to-end with a DCN x DP x TP mesh and orbax
    checkpoints on the virtual 8-device mesh."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv = [
        "train",
        "--synthetic_data", "--max_steps", "2", "--save_steps", "2",
        "--per_device_batch_size", "1", "--max_length", "128",
        "--mesh_dcn", "2", "--mesh_dp", "2", "--mesh_tp", "2",
        "--checkpoint_format", "orbax",
        "--output_dir", str(tmp_path / "out"),
    ]
    # the env pins JAX_PLATFORMS=axon via a site hook; the jax.config update
    # below is the only reliable CPU override (see tests/conftest.py)
    prog = (
        "import sys; sys.path.insert(0, %r); import jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "sys.argv = %r; from vibevoice_tpu.finetune.train import main; main()"
        % (repo, argv)
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "mesh: {'dcn': 2, 'dp': 2, 'tp': 2} (4 data shards)" in out.stdout
    ckpts = list((tmp_path / "out").glob("checkpoint-*/orbax"))
    assert ckpts, out.stdout[-2000:]
