"""Mesh-parallelism tests on the 8-device virtual CPU mesh (SURVEY.md §4
item 4): TP-sharded decode matches unsharded, DP x TP training step runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import inference as inf
from vibevoice_tpu.models import qwen2
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.parallel import mesh as pmesh

CFG = tiny_config()
TOKENS = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)


@pytest.fixture(scope="module")
def params():
    return vv.init(jax.random.PRNGKey(0), CFG)


def test_mesh_creation():
    mesh = pmesh.make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_tp_sharded_lm_forward_matches(params):
    """Tensor-parallel Qwen2 forward == replicated forward."""
    mesh = pmesh.make_mesh(dp=1, tp=2)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, CFG.decoder_config.vocab_size)
    x = qwen2.embed_tokens(params["lm"], ids)
    ref, _ = qwen2.forward(CFG.decoder_config, params["lm"], x)

    shardings = pmesh.qwen2_param_shardings(params["lm"], mesh)
    sharded = jax.device_put(params["lm"], shardings)
    out, _ = jax.jit(lambda p, e: qwen2.forward(CFG.decoder_config, p, e))(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tp_sharded_decode_step_matches(params):
    """The FULL fused decode step (LM + diffusion + vocoder) under a TP mesh
    produces the same tokens/audio as single-device execution — the 7B
    multi-chip serving path."""
    mesh = pmesh.make_mesh(dp=1, tp=2)
    opts = inf.GenerateOptions(ddpm_steps=2, max_length=64)
    step = inf.make_step_fn(CFG, TOKENS, opts)

    ids = np.full((2, 6), 30, np.int64)
    ids[:, -1] = TOKENS.speech_start
    key = jax.random.PRNGKey(0)
    carry0 = inf.prefill_fn(
        CFG, params, jnp.asarray(ids, jnp.int32), 64, jnp.ones((2, 6), bool),
        None, False, TOKENS, key,
    )

    ext = jnp.zeros((2,), bool)
    sk = jax.random.PRNGKey(42)
    ref_carry, ref_out = step(params, carry0, sk, ext)

    shardings = pmesh.model_param_shardings(params, mesh)
    sharded_params = jax.device_put(params, shardings)
    carry1 = inf.prefill_fn(
        CFG, sharded_params, jnp.asarray(ids, jnp.int32), 64, jnp.ones((2, 6), bool),
        None, False, TOKENS, key,
    )
    tp_carry, tp_out = step(sharded_params, carry1, sk, ext)

    np.testing.assert_array_equal(np.asarray(ref_out.tokens), np.asarray(tp_out.tokens))
    np.testing.assert_allclose(
        np.asarray(ref_out.audio), np.asarray(tp_out.audio), rtol=5e-4, atol=5e-4
    )


def test_dp_batch_sharding(params):
    """Batch sharded over dp: per-sample results equal replicated run."""
    mesh = pmesh.make_mesh(dp=2, tp=1)
    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, CFG.decoder_config.vocab_size)
    x = qwen2.embed_tokens(params["lm"], ids)
    ref, _ = qwen2.forward(CFG.decoder_config, params["lm"], x)

    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    rep = jax.device_put(params["lm"], jax.tree.map(lambda _: NamedSharding(mesh, P()), params["lm"]))
    out, _ = jax.jit(lambda p, e: qwen2.forward(CFG.decoder_config, p, e))(rep, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
