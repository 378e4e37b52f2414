"""GPipe pipeline parallelism (parallel/pipeline.py) on the 8-device virtual
CPU mesh: stacked-layout roundtrip, pipelined LM forward == dense forward,
and a full training step (grads through ppermute/scan) matching the dense
loss. The reference has no PP at all (SURVEY.md §2.10) — this is the
TPU-native capability layer above it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# fast gate (-m "not slow") skips this module: GPipe fwd/bwd vs dense at several geometries (~140 s serial)
pytestmark = pytest.mark.slow

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import qwen2
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.parallel import mesh as pmesh
from vibevoice_tpu.parallel import pipeline as pl

CFG = tiny_config(num_hidden_layers=4)


@pytest.fixture(scope="module")
def params():
    return vv.init(jax.random.PRNGKey(0), CFG)


def test_stack_unstack_roundtrip(params):
    stacked = pl.stack_layers(params["lm"], pp=2)
    assert "layers" not in stacked
    restored = pl.unstack_layers(stacked)
    ref_leaves = jax.tree_util.tree_leaves(params["lm"])
    new_leaves = jax.tree_util.tree_leaves(restored)
    assert len(ref_leaves) == len(new_leaves)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_forward_matches(params):
    """4-stage pipeline x 2-way dp, 2 micro-batches, right-padded batch:
    bitwise-level match with the dense qwen2 forward."""
    mesh = pl.make_pp_mesh(pp=4, dp=2)
    dcfg = CFG.decoder_config
    b, t = 4, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, dcfg.vocab_size)
    valid = np.ones((b, t), bool)
    valid[1, 9:] = False  # padded sample exercises the mask path
    valid = jnp.asarray(valid)
    x = qwen2.embed_tokens(params["lm"], ids)
    ref, _ = qwen2.forward(dcfg, params["lm"], x, valid_mask=valid)

    stacked = pl.stack_layers(params["lm"], pp=4)
    sh = pl.pp_lm_param_shardings(stacked, mesh)
    stacked = jax.device_put(stacked, sh)

    out = jax.jit(
        lambda p, e, v: pl.pipelined_forward(
            dcfg, p, e, mesh, valid_mask=v, n_microbatches=2
        )
    )(stacked, x, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # remat inside the stage scan is exact too
    out_r = jax.jit(
        lambda p, e, v: pl.pipelined_forward(
            dcfg, p, e, mesh, valid_mask=v, n_microbatches=2, remat=True
        )
    )(stacked, x, valid)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipelined_grads_match_dense(params):
    """Gradient parity: jax.grad through the pipelined forward (ppermute +
    scan + psum backward) equals the dense-forward gradients, per stage —
    the pin the docstring's 'grads match to float associativity' claim
    stands on."""
    mesh = pl.make_pp_mesh(pp=4, dp=2)
    dcfg = CFG.decoder_config
    b, t = 4, 12
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, t), 0, dcfg.vocab_size)
    valid = np.ones((b, t), bool)
    valid[2, 7:] = False
    valid = jnp.asarray(valid)
    x = qwen2.embed_tokens(params["lm"], ids)
    # scalar objective touching every position; valid-masked so pad garbage
    # cannot leak into the comparison
    w = jax.random.normal(jax.random.PRNGKey(4), (b, t, dcfg.hidden_size))
    wm = w * valid[..., None]

    def dense_loss(layers, e):
        lm = dict(params["lm"])
        lm["layers"] = layers
        h, _ = qwen2.forward(dcfg, lm, e, valid_mask=valid)
        return jnp.sum(h * wm)

    ref_gl, ref_gx = jax.grad(dense_loss, argnums=(0, 1))(params["lm"]["layers"], x)

    stacked = pl.stack_layers(params["lm"], pp=4)
    sh = pl.pp_lm_param_shardings(stacked, mesh)
    stacked_dev = jax.device_put(stacked, sh)

    def pp_loss(layers_stacked, e):
        lm = dict(stacked)
        lm["layers_stacked"] = layers_stacked
        h = pl.pipelined_forward(dcfg, lm, e, mesh, valid_mask=valid, n_microbatches=2)
        return jnp.sum(h * wm)

    pp_gl, pp_gx = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(
        stacked_dev["layers_stacked"], x
    )
    # f32 associativity: backward reassociates across ppermute/psum/scan,
    # so per-element rel diffs up to ~1e-4 are expected on O(100) grads
    np.testing.assert_allclose(np.asarray(pp_gx), np.asarray(ref_gx), rtol=3e-4, atol=3e-4)
    ref_gl_stacked = pl.stack_layers({"layers": ref_gl}, pp=4)["layers_stacked"]
    for pa, ra in zip(jax.tree_util.tree_leaves(pp_gl), jax.tree_util.tree_leaves(ref_gl_stacked)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(ra), rtol=3e-4, atol=3e-4)


def test_pp_train_step_matches(params):
    """Full training step with the LM routed through the pipeline: loss
    equals the dense step (grads flow through ppermute + scan + psum)."""
    from vibevoice_tpu.finetune.loss import Batch, TrainOptions
    from vibevoice_tpu.finetune.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    mesh = pl.make_pp_mesh(pp=4, dp=2)
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
        speech_semantic_tensors=jnp.asarray(
            rng.randn(b, f, CFG.semantic_vae_dim).astype(np.float32)
        ),
        speeches_loss_input=jnp.ones((b,), bool),
        acoustic_input_mask=jnp.asarray(am),
        acoustic_loss_mask=jnp.asarray(am),
    )
    # warmup_steps=1 so the SECOND step has a non-zero LR (the default
    # warmup starts at lr=0, which would make the update-delta check vacuous)
    optimizer = make_optimizer(warmup_steps=1)

    ref_step = jax.jit(make_train_step(CFG, optimizer, TrainOptions(dp_axis=None)))
    ref_state = init_train_state(full, optimizer)
    _, ref_out = ref_step(ref_state, batch, jax.random.PRNGKey(1))

    pp_params = dict(full)
    pp_params["lm"] = pl.stack_layers(full["lm"], pp=4)
    pp_params = jax.device_put(pp_params, pl.pp_model_param_shardings(pp_params, mesh))
    sb = jax.device_put(batch, pmesh.batch_shardings(mesh, batch))

    step = jax.jit(
        make_train_step(
            CFG,
            optimizer,
            TrainOptions(dp_axis=None),
            lm_forward=pl.make_pp_lm_forward(mesh, n_microbatches=2),
        )
    )
    state = init_train_state(pp_params, optimizer)
    state, out = step(state, sb, jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    np.testing.assert_allclose(float(out.loss), float(ref_out.loss), rtol=1e-4)
    state, _ = step(state, sb, jax.random.PRNGKey(2))  # lr > 0 on this one

    # the updated LM stage params stay pp-sharded and differ from init
    # (gradients really crossed the pipeline into every stage)
    q_new = state.params["lm"]["layers_stacked"]["attn"]["q"]["w"]
    q_old = pp_params["lm"]["layers_stacked"]["attn"]["q"]["w"]
    assert any(
        e == "pp" or (isinstance(e, tuple) and "pp" in e) for e in q_new.sharding.spec
    )
    per_stage_delta = np.abs(np.asarray(q_new) - np.asarray(q_old)).reshape(4, -1).max(1)
    assert (per_stage_delta > 0).all(), per_stage_delta
