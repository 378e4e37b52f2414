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

Two hop-compute implementations (``impl`` / env ``RING_IMPL``):

* ``"pallas"`` (default on TPU): ``ops/flash_attention.flash_ring_block`` —
  the flash kernel generalized to carry its online-softmax state (m, l, acc)
  across pallas_calls. One kernel pass per hop streams the visiting K/V
  block through VMEM with double-buffered DMA; XLA never materializes a
  (q_chunk x S) score tensor in HBM.
* ``"jnp"`` (default elsewhere): a lax.scan over q chunks with the same
  online update in XLA ops — runs anywhere, used by the CPU virtual-mesh
  tests and the multichip dryrun.
"""

from __future__ import annotations

import functools
import os
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
    impl: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Runs INSIDE shard_map. Exact causal GQA attention over the full
    (sequence-sharded) sequence; returns (B, Tl, NH, D).

    impl: "pallas" | "jnp" | None (auto: pallas on TPU backends). The pallas
    path additionally assumes each visiting block's valid keys form a prefix
    of the block — the framework's right-padding invariant (pad tokens live
    at the global tail, so every contiguous shard is valid-prefix)."""
    b, tl, nh, d = q.shape
    kh = k.shape[2]
    g = nh // kh
    if impl is None:
        impl = os.environ.get("RING_IMPL") or (
            "pallas"
            # Mosaic needs 128-lane trailing dims (CLAUDE.md): head_dim must
            # be 128-aligned AND the shard length 128-divisible (the score
            # tile's lane dim is the K block, which divides tl) — otherwise
            # keep the jnp hop
            if jax.default_backend() == "tpu" and d % 128 == 0 and tl % 128 == 0
            else "jnp"
        )
    if impl == "pallas":
        return _ring_local_pallas(
            q, k, v, q_pos, k_pos, k_valid,
            axis_name=axis_name, n_shards=n_shards, scale=scale, interpret=interpret,
        )
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


def _ring_local_pallas(
    q, k, v, q_pos, k_pos, k_valid, *, axis_name, n_shards, scale, interpret=False
):
    """Hop loop with the fused flash ring-block kernel (state in HBM f32,
    K/V blocks streamed through VMEM per hop)."""
    from ..ops import flash_attention as fa

    b, tl, nh, d = q.shape
    kh = k.shape[2]
    g = nh // kh
    bk = fa.ring_block_k(tl)
    if bk < 128 and not interpret:
        raise ValueError(
            f"pallas ring hop needs a 128-divisible shard length (got {tl}); "
            "use impl='jnp' or pad the sequence"
        )

    # kernel wants the cache layout (B, KH, S, D): trailing (S, D) DMA planes
    kx = k.transpose(0, 2, 1, 3)
    vx = v.transpose(0, 2, 1, 3)
    state = fa.ring_state_init(b, kh, tl * g, d, block_k=bk)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    q_start = q_pos[0, 0]  # shards are contiguous slabs; same start for all b

    def hop(i, carry):
        k_blk, v_blk, kp_blk, kv_blk, state = carry
        k_start = kp_blk[0, 0]
        # right-padding invariant: a block's valid keys are a prefix, so the
        # per-sample global validity horizon is start + count
        k_len = k_start + jnp.sum(kv_blk.astype(jnp.int32), axis=1)
        state = fa.flash_ring_block(
            state, q, k_blk, v_blk,
            q_start=q_start, k_start=k_start, k_len=k_len,
            scale=scale, block_k=bk, interpret=interpret,
        )
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        kp_blk = jax.lax.ppermute(kp_blk, axis_name, perm)
        kv_blk = jax.lax.ppermute(kv_blk, axis_name, perm)
        return k_blk, v_blk, kp_blk, kv_blk, state

    _, _, _, _, state = jax.lax.fori_loop(
        0, n_shards, hop, (kx, vx, k_pos, k_valid, state)
    )
    return fa.ring_state_out(state, b, tl, nh, d, q.dtype)


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
    impl: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Standalone sequence-sharded causal attention (test/entry surface)."""
    b, t, nh, d = q.shape
    n = mesh.shape[axis]
    scale = d**-0.5 if scale is None else scale
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    fn = functools.partial(
        ring_attention_local, axis_name=axis, n_shards=n, scale=scale, q_chunk=q_chunk,
        impl=impl, interpret=interpret,
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
