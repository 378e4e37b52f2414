"""Sequence-parallel (ring-attention) prefill tests on the 8-device virtual
CPU mesh.

The reference has no context parallelism (SURVEY.md §2.10); ring prefill is
the TPU capability upgrade for 64K prompts. These tests pin exactness: the
ring pipeline (shard_map + ppermute + online softmax) must match single-device
attention / prefill bit-for-tolerance, including right-padded batches, GQA,
and the decode handoff (cache contents + next tokens)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# fast gate (-m "not slow") skips this module: ring SP prefill parity over the CPU mesh (~38 s serial)
pytestmark = pytest.mark.slow

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import inference as inf
from vibevoice_tpu.models import qwen2
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.parallel.mesh import make_mesh
from vibevoice_tpu.parallel.ring_attention import ring_attention
from vibevoice_tpu.parallel.sp_prefill import _sp_forward, ring_prefill_carry

CFG = tiny_config()
TOKENS = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)


@pytest.fixture(scope="module")
def params():
    return vv.init(jax.random.PRNGKey(0), CFG)


def _np_causal_attention(q, k, v, valid):
    b, t, nh, d = q.shape
    kh = k.shape[2]
    g = nh // kh
    out = np.zeros_like(q)
    for bi in range(b):
        for h in range(nh):
            khi = h // g
            for i in range(t):
                ok = (np.arange(t) <= i) & valid[bi]
                sc = np.where(ok, (q[bi, i, h] @ k[bi, :, khi].T) * d**-0.5, -1e30)
                p = np.exp(sc - sc.max())
                p /= p.sum()
                out[bi, i, h] = p @ v[bi, :, khi]
    return out


@pytest.mark.parametrize("shards,q_chunk", [(4, 8), (8, 4), (2, 16)])
def test_ring_attention_matches_full(shards, q_chunk):
    mesh = make_mesh(dp=1, tp=shards)
    rng = np.random.RandomState(0)
    b, t, nh, kh, d = 2, 64, 4, 2, 32
    q = rng.randn(b, t, nh, d).astype(np.float32)
    k = rng.randn(b, t, kh, d).astype(np.float32)
    v = rng.randn(b, t, kh, d).astype(np.float32)
    valid = np.ones((b, t), bool)
    valid[1, 50:] = False
    out = ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid), mesh,
        q_chunk=q_chunk,
    )
    ref = _np_causal_attention(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shards", [2, 4])
def test_ring_attention_pallas_impl_matches_full(shards):
    """The fused flash ring-block hop (ops/flash_attention.flash_ring_block,
    interpret mode on the CPU virtual mesh) == dense causal attention,
    including right padding, GQA folding, and 128-lane head_dim."""
    mesh = make_mesh(dp=1, tp=shards)
    rng = np.random.RandomState(3)
    b, t, nh, kh, d = 2, 64, 4, 2, 128
    q = rng.randn(b, t, nh, d).astype(np.float32) * 0.3
    k = rng.randn(b, t, kh, d).astype(np.float32) * 0.3
    v = rng.randn(b, t, kh, d).astype(np.float32) * 0.3
    valid = np.ones((b, t), bool)
    valid[1, 41:] = False
    out = ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid), mesh,
        impl="pallas", interpret=True,
    )
    ref = _np_causal_attention(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid], rtol=2e-5, atol=2e-5)


def test_sp_forward_matches_single_device(params):
    mesh = make_mesh(dp=1, tp=4)
    lm_cfg = CFG.decoder_config
    rng = np.random.RandomState(1)
    embeds = jnp.asarray(rng.randn(2, 32, lm_cfg.hidden_size), jnp.float32)
    valid = np.ones((2, 32), bool)
    valid[1, 25:] = False

    ref, _ = qwen2.forward(lm_cfg, params["lm"], embeds, valid_mask=jnp.asarray(valid))
    hidden, ks, vs = _sp_forward(lm_cfg, params["lm"], embeds, jnp.asarray(valid), mesh, "tp", 8)
    assert len(ks) == lm_cfg.num_hidden_layers
    # hidden states at VALID positions match the plain causal forward.
    # (pads differ: qwen2.forward clamps pad RoPE positions, sp uses slot
    # index — both are masked out of attention, so only valid slots matter)
    np.testing.assert_allclose(
        np.asarray(hidden)[valid], np.asarray(ref)[valid], rtol=5e-5, atol=5e-5
    )


@pytest.mark.parametrize("kv_int8", [False, True])
def test_ring_prefill_carry_matches_prefill_fn(params, kv_int8):
    """The decode handoff: carry from ring prefill == carry from the standard
    prefill (same cache prefix, lengths, h_pos/h_neg), and one fused decode
    step from each produces identical tokens."""
    mesh = make_mesh(dp=1, tp=4)
    rng = np.random.RandomState(2)
    b, t, max_len = 2, 12, 64
    ids = rng.randint(10, 100, (b, t)).astype(np.int64)
    valid = np.ones((b, t), bool)
    valid[1, 9:] = False
    ids[1, 8] = TOKENS.speech_start
    ids[0, -1] = TOKENS.speech_start
    key = jax.random.PRNGKey(3)

    ref_carry = inf.prefill_fn(
        CFG, params, jnp.asarray(ids, jnp.int32), max_len, jnp.asarray(valid),
        None, False, TOKENS, "audio", kv_int8,
    )
    sp_carry = ring_prefill_carry(
        CFG, params, jnp.asarray(ids, jnp.int32), jnp.asarray(valid), max_len, TOKENS,
        mesh, q_chunk=4, kv_int8=kv_int8,
    )

    np.testing.assert_array_equal(np.asarray(sp_carry.cache.length), np.asarray(ref_carry.cache.length))
    # int8 mode: prefill_fn's multi-token forward ATTENDS THROUGH the
    # quantized cache, while ring prefill attends exactly and quantizes only
    # on write — h_pos differs by (bounded) int8 noise, cache contents differ
    # only by quantizing exact-vs-noisy K/V of later layers.
    tol = dict(rtol=2e-2, atol=2e-2) if kv_int8 else dict(rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(sp_carry.h_pos), np.asarray(ref_carry.h_pos), **tol)
    np.testing.assert_allclose(np.asarray(sp_carry.h_neg), np.asarray(ref_carry.h_neg), **tol)
    # valid cache prefix matches per sample/layer (positive rows 0..B);
    # int8 caches compare dequantized (raw int8 codes can differ by +-1 once
    # upstream layers carry quantization noise)
    lens = np.asarray(ref_carry.cache.length)[:b]

    def cache_vals(cache, li):
        k = np.asarray(cache.k[li], np.float32)
        if kv_int8:
            k = k * np.swapaxes(np.asarray(cache.k_scale[li]), 2, 3)
        return k

    for li in (0, CFG.decoder_config.num_hidden_layers - 1):
        rk = cache_vals(ref_carry.cache, li)
        sk = cache_vals(sp_carry.cache, li)
        for bi in range(b):
            np.testing.assert_allclose(
                sk[bi, :, : lens[bi]], rk[bi, :, : lens[bi]], **tol
            )

    # one fused decode step: identical token choices and cache advance
    step = inf.make_step_fn(CFG, TOKENS, inf.GenerateOptions(ddpm_steps=2, max_length=max_len, kv_int8=kv_int8))
    sk = jax.random.PRNGKey(9)
    ext = jnp.zeros((b,), bool)
    _, ref_out = step(params, ref_carry, sk, ext)
    _, sp_out = step(params, sp_carry, sk, ext)
    np.testing.assert_array_equal(np.asarray(ref_out.tokens), np.asarray(sp_out.tokens))
