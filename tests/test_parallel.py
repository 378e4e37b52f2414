"""Mesh-parallelism tests on the 8-device virtual CPU mesh (SURVEY.md §4
item 4): TP-sharded decode matches unsharded, DP x TP training step runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# fast gate (-m "not slow") skips this module: 8-virtual-device shard_map train/decode parity (~145 s serial)
pytestmark = pytest.mark.slow
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
        None, False, TOKENS,
    )

    ext = jnp.zeros((2,), bool)
    sk = jax.random.PRNGKey(42)
    ref_carry, ref_out = step(params, carry0, sk, ext)

    shardings = pmesh.model_param_shardings(params, mesh)
    sharded_params = jax.device_put(params, shardings)
    carry1 = inf.prefill_fn(
        CFG, sharded_params, jnp.asarray(ids, jnp.int32), 64, jnp.ones((2, 6), bool),
        None, False, TOKENS,
    )
    tp_carry, tp_out = step(sharded_params, carry1, sk, ext)

    np.testing.assert_array_equal(np.asarray(ref_out.tokens), np.asarray(tp_out.tokens))
    np.testing.assert_allclose(
        np.asarray(ref_out.audio), np.asarray(tp_out.audio), rtol=5e-4, atol=5e-4
    )


def test_fsdp_train_step_matches(params):
    """FSDP (ZeRO-3) shardings: params + AdamW moments shard over dp on top
    of the TP plan, and one full training step produces the same loss as the
    unsharded step (XLA all-gathers weights just-in-time, reduce-scatters
    gradients — exact dataflow, different layout)."""
    from vibevoice_tpu.finetune.loss import Batch, TrainOptions
    from vibevoice_tpu.finetune.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    mesh = pmesh.make_mesh(dp=2, tp=2)
    full = dict(params)
    full["speech_scaling_factor"] = jnp.asarray(float("nan"))
    full["speech_bias_factor"] = jnp.asarray(float("nan"))

    b, t, f = 4, 32, 4
    hop = CFG.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(0)
    am = np.zeros((b, t), bool)
    am[:, 8 : 8 + f] = True
    batch = Batch(
        input_ids=jnp.asarray(rng.randint(10, 100, (b, t)).astype(np.int32)),
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

    ref_state = init_train_state(full, optimizer)
    _, ref_out = step(ref_state, batch, jax.random.PRNGKey(1))

    # tiny-model leaves are small; drop the size floor so the plan engages
    shardings = pmesh.fsdp_param_shardings(full, mesh, min_leaf_size=1024)
    # at least the embedding and the mlp weights must actually be dp-sharded
    def has_dp(ns):
        return any(
            e == "dp" or (isinstance(e, tuple) and "dp" in e) for e in ns.spec
        )

    flat = jax.tree_util.tree_leaves_with_path(shardings)
    dp_sharded = [s for _, s in flat if has_dp(s)]
    assert len(dp_sharded) >= 4, "fsdp plan sharded almost nothing"

    sp = pmesh.shard_params(full, shardings)
    sb = jax.device_put(batch, pmesh.batch_shardings(mesh, batch))
    state = init_train_state(sp, optimizer)
    # AdamW moments are zeros_like the params — they must inherit the fsdp
    # sharding (that inheritance IS the ZeRO optimizer-state sharding)
    mu = state.opt_state[1][0].mu  # chain(clip, adamw) -> adamw ScaleByAdamState
    mu_emb = mu["lm"]["embed"]
    assert has_dp(mu_emb.sharding), mu_emb.sharding

    state, out = step(state, sb, jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    np.testing.assert_allclose(float(out.loss), float(ref_out.loss), rtol=1e-4)
    # updated params keep their fsdp shardings (no silent re-replication)
    new_emb = state.params["lm"]["embed"]
    assert has_dp(new_emb.sharding), new_emb.sharding


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
