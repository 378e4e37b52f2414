"""Qwen2 LM tests: golden parity with HF transformers and KV-cache semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.configs import Qwen2Config
from vibevoice_tpu.models import qwen2

TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rope_theta=10_000.0,
)


@pytest.fixture(scope="module")
def params():
    return qwen2.init(jax.random.PRNGKey(0), TINY)


def test_forward_shapes(params):
    x = qwen2.embed_tokens(params, jnp.arange(12).reshape(2, 6))
    h, _ = qwen2.forward(TINY, params, x)
    assert h.shape == (2, 6, 32)
    logits = qwen2.lm_head_logits(params, h)
    assert logits.shape == (2, 6, 128)


@pytest.mark.slow
def test_remat_forward_matches(params):
    """remat=True is a pure memory lever: identical hidden states and grads."""
    x = qwen2.embed_tokens(params, jnp.arange(12).reshape(2, 6))
    vm = jnp.asarray([[True] * 6, [True] * 4 + [False] * 2])
    ref, _ = qwen2.forward(TINY, params, x, valid_mask=vm)
    out, _ = qwen2.forward(TINY, params, x, valid_mask=vm, remat=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)

    def loss(p, remat):
        h, _ = qwen2.forward(TINY, p, x, valid_mask=vm, remat=remat)
        return jnp.sum(jnp.square(h) * vm[:, :, None])

    g_ref = jax.grad(loss)(params, False)
    g_rm = jax.grad(loss)(params, True)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_rm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_prefill_then_decode_matches_full(params):
    """prefill(T) + N single-token decodes == one full forward."""
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)
    x = qwen2.embed_tokens(params, ids)
    full, _ = qwen2.forward(TINY, params, x)

    cache = qwen2.make_cache(TINY, 2, 32, dtype=jnp.float32)
    h_pre, cache = qwen2.forward(TINY, params, x[:, :6], cache=cache)
    outs = [h_pre]
    for i in range(6, 10):
        h, cache = qwen2.forward(TINY, params, x[:, i : i + 1], cache=cache)
        outs.append(h)
    step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full), rtol=2e-5, atol=2e-5)
    assert np.asarray(cache.length).tolist() == [10, 10]


def test_right_padded_prefill(params):
    """Right-padded batch: each sample's valid positions match its solo run."""
    ids0 = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 128)
    ids1 = jax.random.randint(jax.random.PRNGKey(3), (1, 5), 0, 128)
    solo0, _ = qwen2.forward(TINY, params, qwen2.embed_tokens(params, ids0))
    solo1, _ = qwen2.forward(TINY, params, qwen2.embed_tokens(params, ids1))

    batch_ids = jnp.concatenate(
        [ids0, jnp.pad(ids1, ((0, 0), (0, 3)))], axis=0
    )
    mask = jnp.array([[True] * 8, [True] * 5 + [False] * 3])
    h, _ = qwen2.forward(TINY, params, qwen2.embed_tokens(params, batch_ids), valid_mask=mask)
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(solo0[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h[1, :5]), np.asarray(solo1[0]), rtol=2e-5, atol=2e-5)


def test_cached_right_padded_prefill_then_decode(params):
    """Cache path with ragged lengths: decode continues each sample at its own
    length and matches the solo uncached forward."""
    ids_long = jax.random.randint(jax.random.PRNGKey(4), (1, 7), 0, 128)
    ids_short = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0, 128)
    next_tok = jax.random.randint(jax.random.PRNGKey(6), (2, 1), 0, 128)

    batch = jnp.concatenate([ids_long, jnp.pad(ids_short, ((0, 0), (0, 3)))], axis=0)
    mask = jnp.array([[True] * 7, [True] * 4 + [False] * 3])
    cache = qwen2.make_cache(TINY, 2, 16, dtype=jnp.float32)
    _, cache = qwen2.forward(TINY, params, qwen2.embed_tokens(params, batch), valid_mask=mask, cache=cache)
    assert np.asarray(cache.length).tolist() == [7, 4]
    h_step, cache = qwen2.forward(TINY, params, qwen2.embed_tokens(params, next_tok), cache=cache)

    solo0 = jnp.concatenate([ids_long, next_tok[:1]], axis=1)
    solo1 = jnp.concatenate([ids_short, next_tok[1:]], axis=1)
    ref0, _ = qwen2.forward(TINY, params, qwen2.embed_tokens(params, solo0))
    ref1, _ = qwen2.forward(TINY, params, qwen2.embed_tokens(params, solo1))
    np.testing.assert_allclose(np.asarray(h_step[0, 0]), np.asarray(ref0[0, -1]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_step[1, 0]), np.asarray(ref1[0, -1]), rtol=2e-5, atol=2e-5)


def test_zero_advance_speculative(params):
    """advance=0 evaluates a token without committing it — the functional
    replacement for the reference's negative-cache shift-delete
    (reference modeling_vibevoice_inference.py:594-624)."""
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, 5), 0, 128)
    spec = jax.random.randint(jax.random.PRNGKey(8), (1, 1), 0, 128)
    real = jax.random.randint(jax.random.PRNGKey(9), (1, 1), 0, 128)

    cache = qwen2.make_cache(TINY, 1, 16, dtype=jnp.float32)
    _, cache = qwen2.forward(TINY, params, qwen2.embed_tokens(params, ids), cache=cache)
    # speculative eval, not committed
    _, cache = qwen2.forward(
        TINY, params, qwen2.embed_tokens(params, spec), cache=cache, advance=jnp.zeros(1, jnp.int32)
    )
    assert int(cache.length[0]) == 5
    # now commit a different token; result must equal the clean continuation
    h, cache = qwen2.forward(TINY, params, qwen2.embed_tokens(params, real), cache=cache)
    ref, _ = qwen2.forward(
        TINY, params, qwen2.embed_tokens(params, jnp.concatenate([ids, real], axis=1))
    )
    np.testing.assert_allclose(np.asarray(h[0, 0]), np.asarray(ref[0, -1]), rtol=2e-5, atol=2e-5)


def test_layer_range_split(params):
    """Split-stack execution (streaming model) composes to the full forward."""
    ids = jax.random.randint(jax.random.PRNGKey(10), (1, 6), 0, 128)
    x = qwen2.embed_tokens(params, ids)
    full, _ = qwen2.forward(TINY, params, x)
    lower, _ = qwen2.forward(TINY, params, x, layer_range=(0, 1), skip_final_norm=True)
    upper, _ = qwen2.forward(TINY, params, lower, layer_range=(1, 2))
    np.testing.assert_allclose(np.asarray(upper), np.asarray(full), rtol=2e-5, atol=2e-5)


class TestGoldenVsHF:
    @pytest.fixture(scope="class")
    def hf_model(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from transformers.models.qwen2 import Qwen2Config as HFQwen2Config, Qwen2Model

        hf_cfg = HFQwen2Config(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
            rope_theta=10_000.0,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        return Qwen2Model(hf_cfg).eval()

    def test_forward_matches_hf(self, hf_model):
        import torch
        from vibevoice_tpu.utils.torch_convert import convert_qwen2

        params = convert_qwen2(hf_model.state_dict(), TINY)
        ids = np.random.RandomState(0).randint(0, 128, (2, 9))
        with torch.no_grad():
            ref = hf_model(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
        h, _ = qwen2.forward(TINY, params, qwen2.embed_tokens(params, jnp.asarray(ids)))
        np.testing.assert_allclose(np.asarray(h), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packed_projections_match_unpacked():
    """pack_lm_projections (serving prep): packed int8 qkv/gateup forward
    equals the unpacked int8 forward exactly (per-column scales are preserved
    under concatenation)."""
    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.ops.quant import pack_lm_projections, quantize_lm

    params = qwen2.init(jax.random.PRNGKey(3), TINY)
    qparams = quantize_lm(params, quantize_lm_head=False)
    packed = pack_lm_projections(qparams)
    assert "qkv" in packed["layers"][0]["attn"]
    assert "q" not in packed["layers"][0]["attn"]
    assert "gateup" in packed["layers"][0]["mlp"]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, TINY.hidden_size), jnp.float32)
    cache_a = qwen2.make_cache(TINY, 2, 32, dtype=jnp.float32)
    cache_b = qwen2.make_cache(TINY, 2, 32, dtype=jnp.float32)
    ha, _ = qwen2.forward(TINY, qparams, x, cache=cache_a)
    hb, _ = qwen2.forward(TINY, packed, x, cache=cache_b)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
