"""Pallas flash-attention kernel tests (interpret mode on CPU; the compiled
kernel is validated against the XLA path on real TPU — see README perf notes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.ops.flash_attention import flash_cached_attention


def np_ref(q, k, v, base):
    """k/v in cache layout (B, KH, S, D)."""
    b, w, nh, d = q.shape
    kh = k.shape[1]
    g = nh // kh
    out = np.zeros_like(q)
    for bi in range(b):
        for h in range(nh):
            khi = h // g
            for i in range(w):
                lim = base[bi] + i
                ks = k[bi, khi, : lim + 1]
                sc = (q[bi, i, h] @ ks.T) * d**-0.5
                p = np.exp(sc - sc.max())
                p /= p.sum()
                out[bi, i, h] = p @ v[bi, khi, : lim + 1]
    return out


@pytest.mark.parametrize(
    "b,w,nh,kh,s,lens",
    [
        (1, 1, 4, 2, 256, [100]),  # decode
        (2, 1, 4, 2, 256, [255, 0]),  # ragged, boundary
        (2, 4, 4, 2, 256, [0, 128]),  # prefill chunk (empty + mid)
        (1, 8, 8, 2, 128, [37]),  # block boundary not aligned
    ],
)
def test_flash_matches_reference(b, w, nh, kh, s, lens):
    d = 128
    rng = np.random.RandomState(42)
    q = rng.randn(b, w, nh, d).astype(np.float32)
    k = rng.randn(b, kh, s, d).astype(np.float32)
    v = rng.randn(b, kh, s, d).astype(np.float32)
    base = np.asarray(lens, np.int32)
    out = flash_cached_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(base),
        block_k=128, interpret=True,
    )
    ref = np_ref(q, k, v, base)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_rejects_unaligned_cache():
    q = jnp.zeros((1, 1, 4, 128))
    k = jnp.zeros((1, 2, 100, 128))
    with pytest.raises(ValueError, match="multiple of block_k"):
        flash_cached_attention(q, k, k, jnp.zeros(1, jnp.int32), block_k=64, interpret=True)
