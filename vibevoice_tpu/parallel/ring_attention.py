"""Ring-attention sequence-parallel prefill.

The reference has NO context parallelism (SURVEY.md §2.10 — 64K prompts run
on one GPU); this module is the TPU-native capability upgrade called out in
SURVEY.md §5/§7: shard the *sequence* of a long prompt over a mesh axis so an
N-chip slice prefills a 64K prompt with 1/N of the attention FLOPs (and 1/N of
the activation memory) per chip.

Design (standard ring attention, expressed with shard_map + ppermute over
ICI):

* Queries stay resident: each device owns a contiguous T/N token shard.
* K/V (+ their absolute positions/validity) rotate around the ring; after N
  ppermute hops every device has seen every key block exactly once.
* Per hop, the device folds the visiting block into an online-softmax
  accumulator (running max / normalizer / weighted sum, f32) — numerically
  identical to one global softmax, same trick as the flash kernel.
* Causality and right-padding are enforced by absolute positions: query at
  global slot i attends key slot j iff ``j <= i`` and slot j holds a valid
  (non-pad) token. Right-padded batches keep each sample's tokens in the
  contiguous prefix, so slot index == RoPE position (models/qwen2.py
  invariant).
* Within a hop, queries are processed in chunks of ``q_chunk`` via lax.scan
  so the score matrix never materializes beyond (B, NH, q_chunk, T/N) — the
  64K x 64K full-score tensor never exists.

The hop compute is jnp (XLA fuses the chunk loop well); the Pallas flash
kernel is not reused here because online state (m, l, acc) must cross
pallas_call boundaries between hops — a fused ring-block kernel is a further
optimization, not a capability gap.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exports shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

NEG = -1e30


def _online_update(carry, x, k_blk, v_blk, kpos_blk, kval_blk, scale):
    """Fold one (q_chunk x block) score tile into the online-softmax state."""
    del carry
    q, qpos, m, l, acc = x  # q (B, C, NH, D); m/l (B, KH, G, C, 1); acc (B, C, NH, D)
    b, c, nh, d = q.shape
    kh = k_blk.shape[2]
    g = nh // kh
    qg = q.reshape(b, c, kh, g, d)
    s = jnp.einsum("bckgd,bskd->bkgcs", qg, k_blk, preferred_element_type=jnp.float32)
    s = s * scale
    ok = (kpos_blk[:, None, :] <= qpos[:, :, None]) & kval_blk[:, None, :]  # (B, C, S)
    s = jnp.where(ok[:, None, None, :, :], s, NEG)  # broadcast over (KH, G)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bkgcs,bskd->bckgd", p.astype(v_blk.dtype), v_blk)
    acc_new = acc * corr.transpose(0, 3, 1, 2, 4).reshape(b, c, nh, 1) + pv.reshape(b, c, nh, d)
    return None, (m_new, l_new, acc_new)


def ring_attention_local(
    q: jnp.ndarray,  # (B, Tl, NH, D) local query shard
    k: jnp.ndarray,  # (B, Tl, KH, D) local key shard
    v: jnp.ndarray,
    q_pos: jnp.ndarray,  # (B, Tl) int32 absolute slot of each local query
    k_pos: jnp.ndarray,  # (B, Tl) int32 absolute slot of each local key
    k_valid: jnp.ndarray,  # (B, Tl) bool — local keys that hold real tokens
    *,
    axis_name: str,
    n_shards: int,
    scale: float,
    q_chunk: int = 512,
) -> jnp.ndarray:
    """Runs INSIDE shard_map. Exact causal GQA attention over the full
    (sequence-sharded) sequence; returns (B, Tl, NH, D)."""
    b, tl, nh, d = q.shape
    kh = k.shape[2]
    g = nh // kh
    qc = min(q_chunk, tl)
    if tl % qc != 0:
        raise ValueError(f"local shard {tl} not divisible by q_chunk {qc}")
    nchunks = tl // qc

    qx = q.reshape(b, nchunks, qc, nh, d).transpose(1, 0, 2, 3, 4)
    px = q_pos.reshape(b, nchunks, qc).transpose(1, 0, 2)
    m0 = jnp.full((nchunks, b, kh, g, qc, 1), NEG, jnp.float32)
    l0 = jnp.zeros((nchunks, b, kh, g, qc, 1), jnp.float32)
    a0 = jnp.zeros((nchunks, b, qc, nh, d), jnp.float32)

    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def hop(i, carry):
        k_blk, v_blk, kp_blk, kv_blk, m, l, acc = carry
        upd = functools.partial(
            _online_update, k_blk=k_blk, v_blk=v_blk, kpos_blk=kp_blk, kval_blk=kv_blk,
            scale=scale,
        )
        _, (m, l, acc) = jax.lax.scan(upd, None, (qx, px, m, l, acc))
        # pass the visiting block to the next device (skip after the last fold)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        kp_blk = jax.lax.ppermute(kp_blk, axis_name, perm)
        kv_blk = jax.lax.ppermute(kv_blk, axis_name, perm)
        return k_blk, v_blk, kp_blk, kv_blk, m, l, acc

    _, _, _, _, m, l, acc = jax.lax.fori_loop(
        0, n_shards, hop, (k, v, k_pos, k_valid, m0, l0, a0)
    )
    l_row = l.transpose(0, 1, 4, 2, 3, 5).reshape(nchunks, b, qc, nh, 1)
    out = acc / jnp.maximum(l_row, 1e-30)
    return out.transpose(1, 0, 2, 3, 4).reshape(b, tl, nh, d).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (B, T, NH, D) global (T divisible by mesh axis size)
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,  # (B, T) bool
    mesh: Mesh,
    *,
    axis: str = "tp",
    scale: float | None = None,
    q_chunk: int = 512,
) -> jnp.ndarray:
    """Standalone sequence-sharded causal attention (test/entry surface)."""
    b, t, nh, d = q.shape
    n = mesh.shape[axis]
    scale = d**-0.5 if scale is None else scale
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    fn = functools.partial(
        ring_attention_local, axis_name=axis, n_shards=n, scale=scale, q_chunk=q_chunk
    )
    seq = P(None, axis)
    seq4 = P(None, axis, None, None)
    return _shard_map(
        fn,
        mesh=mesh,
        in_specs=(seq4, seq4, seq4, seq, seq, seq),
        out_specs=seq4,
        check_vma=False,
    )(q, k, v, pos, pos, valid)
