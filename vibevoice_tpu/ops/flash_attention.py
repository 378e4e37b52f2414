"""Pallas flash attention over the persistent KV cache (TPU).

The TPU-native replacement for the reference's flash-attn-2 CUDA dependency
(SURVEY.md §2.9): one kernel serves both cached prefill chunks and decode
steps. For each (batch, kv-head) grid cell it streams K/V blocks from HBM
with double-buffered DMA, maintaining an online-softmax accumulator in VMEM,
and only reads the *valid* prefix of the cache (per-sample lengths are
scalar-prefetched), so a 64K-slot cache costs only ``len`` worth of bandwidth.

K/V arrive in the cache's (B, KH, S, D) layout so the per-(b,h) DMA slices
address only the trailing (S, D) plane — bf16 sublane tiling constrains the
last two dims of a memref slice.

Masking rule (matches models/qwen2.py): query row i (absolute slot
``base[b] + i``) attends keys ``j <= base[b] + i``. GQA is handled by folding
the G query heads of a KV group into rows of one matmul.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_K = int(os.environ.get("FLASH_BLOCK_K", "0"))  # 0 = adaptive
DEFAULT_HEAD_FOLD = int(os.environ.get("FLASH_HEAD_FOLD", "0"))  # 0 = adaptive


def _pick_block_k(s: int) -> int:
    """Adaptive K-block size: long caches amortize the per-block loop/DMA
    overhead with bigger blocks (measured on v5e @ 36K fill: 512->2048 is
    +9% bs1 decode RTF), short caches keep 512 so a near-empty cache doesn't
    over-read. Env FLASH_BLOCK_K forces a fixed size."""
    if DEFAULT_BLOCK_K:
        return DEFAULT_BLOCK_K
    for cand in (2048, 1024):
        if s >= cand * 16 and s % cand == 0:
            return cand
    return 512


def _pick_head_fold(kh: int, r: int, block_k: int, d: int, kv_bytes: int) -> int:
    """How many KV heads one grid cell processes. Decode steps (few query
    rows) are bound by the per-block-iteration overhead of the K-block loop,
    not by FLOPs or bytes — folding heads runs `hf` heads' matmuls per loop
    iteration off one strided DMA, dividing the iteration count by `hf`.
    Large prefill tiles are matmul-bound and VMEM-hungry, so they stay at 1.
    Env FLASH_HEAD_FOLD forces a value."""
    if DEFAULT_HEAD_FOLD:
        hf = max(1, min(DEFAULT_HEAD_FOLD, kh))
        while kh % hf:  # a non-dividing fold would truncate the head grid
            hf -= 1
        return hf
    if r > 128:  # prefill tiles: per-iteration overhead already amortized
        return 1
    hf = 4 if kh % 4 == 0 else (2 if kh % 2 == 0 else 1)
    # keep the double-buffered K+V scratch under ~8 MB of the 16 MB VMEM
    while hf > 1 and 2 * 2 * hf * block_k * d * kv_bytes > (8 << 20):
        hf //= 2
    return hf
NEG_INF = -1e30


MAX_Q_ROWS = 1024  # per-grid-cell query rows resident in VMEM


def flash_cached_attention(
    q: jnp.ndarray,  # (B, W, NH, D)
    k_cache: jnp.ndarray,  # (B, KH, S, D) — chunk already written at base
    v_cache: jnp.ndarray,
    base_lens: jnp.ndarray,  # (B,) int32
    *,
    k_scale: jnp.ndarray | None = None,  # (B, KH, 1, S) f32 — int8 cache rows
    v_scale: jnp.ndarray | None = None,
    block_k: int | None = None,  # None = adaptive (_pick_block_k)
    interpret: bool = False,
    scale: float | None = None,
) -> jnp.ndarray:
    """Returns (B, W, NH, D). Valid keys for query i: j <= base_lens[b] + i.

    Large chunks (prefill) tile the folded W*G query rows over a third grid
    dimension; each q tile only streams key blocks up to its own causal
    horizon, so a full prefill does the triangular amount of work.

    `scale` overrides the D**-0.5 softmax scale (needed when inputs are
    lane-padded from a smaller true head_dim; see qwen2.make_cache).

    int8 caches: pass ``k_scale``/``v_scale`` (per-key-row dequant scales in
    the trailing-S layout qwen2.make_cache allocates). The kernel streams the
    int8 blocks (half the HBM bytes of bf16 — decode attention is
    bandwidth-bound) and folds the scales in exactly: K's scale multiplies
    score columns post-matmul, V's scale multiplies the softmax probabilities
    before the PV matmul — both algebraically identical to dequantizing the
    block first."""
    b, w, nh, d = q.shape
    kh, s = k_cache.shape[1], k_cache.shape[2]
    g = nh // kh
    r = w * g
    scale = d**-0.5 if scale is None else scale
    quant = k_scale is not None
    if block_k is None:
        block_k = _pick_block_k(s)

    if s % block_k != 0:
        raise ValueError(f"cache length {s} must be a multiple of block_k={block_k}")

    # (B, W, KH, G, D) -> (B, KH, W*G, D): rows of one KV group contiguous
    qg = q.reshape(b, w, kh, g, d).transpose(0, 2, 1, 3, 4).reshape(b, kh, r, d)
    # score/prob tiles are (qb, block_k) f32 in VMEM: shrink the q tile as the
    # K block grows so prefill chunks fit VMEM at large adaptive blocks
    # (shared budget rule with the ring kernel)
    qb = _ring_qb(r, block_k)
    n_qb = -(-r // qb)
    r_pad = n_qb * qb
    if r_pad != r:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))

    hf = _pick_head_fold(kh, r_pad, block_k, d, 1 if quant else k_cache.dtype.itemsize)

    kernel = functools.partial(
        _kernel_zeroed, w=w, g=g, block_k=block_k, scale=scale, qb=qb, quant=quant, hf=hf
    )
    n_any = 4 if quant else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kh // hf, n_qb),
        in_specs=[
            pl.BlockSpec(
                (1, hf, qb, d), lambda i, j, qi, lens: (i, j, qi, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_any)],
        out_specs=pl.BlockSpec(
            (1, hf, qb, d), lambda i, j, qi, lens: (i, j, qi, 0), memory_space=pltpu.VMEM
        ),
    )
    operands = (base_lens.astype(jnp.int32), qg, k_cache, v_cache)
    if quant:
        operands += (k_scale, v_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kh, r_pad, d), q.dtype),
        interpret=interpret,
    )(*operands)
    out = out[:, :, :r]
    return out.reshape(b, kh, w, g, d).transpose(0, 2, 1, 3, 4).reshape(b, w, nh, d)


def _kernel_zeroed(lens_ref, q_ref, k_hbm, v_hbm, *rest, w, g, block_k, scale, qb, quant, hf):
    if quant:
        ks_hbm, vs_hbm, o_ref = rest
    else:
        (o_ref,) = rest
        ks_hbm = vs_hbm = None
    b = pl.program_id(0)
    h0 = pl.program_id(1) * hf  # first KV head of this cell's folded group
    qi = pl.program_id(2)
    base = lens_ref[b]
    r = q_ref.shape[2]  # rows in this q tile
    d = q_ref.shape[-1]
    row0 = qi * qb  # global first row of this tile

    def run(kb_scr, vb_scr, ks_scr, vs_scr, sem, acc_scr, m_scr, l_scr):
        acc_scr[...] = jnp.zeros_like(acc_scr)
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)

        # causal horizon of this tile: its last (global) row attends keys up
        # to base + last_query_index, so later key blocks are never read
        last_q_index = jnp.minimum((row0 + r - 1) // g, w - 1)
        # clamp to the cache size: a FINISHED sample's length can legally sit
        # at S (it wrote its last KV into slot S-1); without the clamp its
        # masked step would DMA a key block starting at slot S (out of
        # bounds). Valid rows always have base + horizon <= S.
        total = jnp.minimum(base + last_q_index + 1, k_hbm.shape[2])
        nblocks = pl.cdiv(total, block_k)
        qs = [q_ref[0, t].astype(jnp.float32) * scale for t in range(hf)]
        row_pos = base + (row0 + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)) // g

        def get_dma(slot, kb):
            start = kb * block_k
            dmas = (
                pltpu.make_async_copy(
                    k_hbm.at[b, pl.ds(h0, hf), pl.ds(start, block_k), :],
                    kb_scr.at[slot], sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(h0, hf), pl.ds(start, block_k), :],
                    vb_scr.at[slot], sem.at[slot, 1],
                ),
            )
            if quant:
                dmas += (
                    pltpu.make_async_copy(
                        ks_hbm.at[b, pl.ds(h0, hf), :, pl.ds(start, block_k)],
                        ks_scr.at[slot], sem.at[slot, 2],
                    ),
                    pltpu.make_async_copy(
                        vs_hbm.at[b, pl.ds(h0, hf), :, pl.ds(start, block_k)],
                        vs_scr.at[slot], sem.at[slot, 3],
                    ),
                )
            return dmas

        for dma in get_dma(0, 0):
            dma.start()

        def body(kb, _):
            slot = kb % 2
            nxt = (kb + 1) % 2

            @pl.when(kb + 1 < nblocks)
            def _():
                for dma in get_dma(nxt, kb + 1):
                    dma.start()

            for dma in get_dma(slot, kb):
                dma.wait()

            jcol = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (r, block_k), 1)
            live = jcol <= row_pos
            # hf heads per iteration: same loop/DMA overhead, hf× the work
            for t in range(hf):
                kblk = kb_scr[slot, t].astype(jnp.float32)
                vblk = vb_scr[slot, t].astype(jnp.float32)
                s = jax.lax.dot_general(
                    qs[t], kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                if quant:
                    s = s * ks_scr[slot, t]  # (1, block_k) key-row dequant scales
                s = jnp.where(live, s, NEG_INF)

                m_prev = m_scr[t, :, :1]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)
                corr = jnp.exp(m_prev - m_new)
                l_scr[t, :, :1] = l_scr[t, :, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
                pv = p * vs_scr[slot, t] if quant else p  # value-row dequant scales
                acc_scr[t] = acc_scr[t] * corr + jax.lax.dot_general(
                    pv, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                m_scr[t, :, :1] = m_new
            return 0

        jax.lax.fori_loop(0, nblocks, body, 0)
        for t in range(hf):
            o_ref[0, t] = (acc_scr[t] / jnp.maximum(l_scr[t, :, :1], 1e-30)).astype(o_ref.dtype)

    scale_scr = (
        pltpu.VMEM((2, hf, 1, block_k), jnp.float32)
        if quant
        else pltpu.VMEM((2, hf, 1, 128), jnp.float32)
    )
    pl.run_scoped(
        run,
        kb_scr=pltpu.VMEM((2, hf, block_k, d), k_hbm.dtype),
        vb_scr=pltpu.VMEM((2, hf, block_k, d), v_hbm.dtype),
        ks_scr=scale_scr,
        vs_scr=scale_scr,
        sem=pltpu.SemaphoreType.DMA((2, 4)),
        acc_scr=pltpu.VMEM((hf, r, d), jnp.float32),
        m_scr=pltpu.VMEM((hf, r, 128), jnp.float32),
        l_scr=pltpu.VMEM((hf, r, 128), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Ring-attention hop kernel: online-softmax state carried ACROSS calls
# ---------------------------------------------------------------------------


def ring_block_k(shard_len: int) -> int:
    """Largest K-block (<=512) dividing a ring hop's shard length.

    Compiled Mosaic needs the score tile's trailing (lane) dim to be a
    multiple of 128, so shard lengths not divisible by 128 return a
    sub-128 block that only works in interpret mode — callers on the TPU
    path must keep shards 128-aligned (ring_attention_local auto-selection
    falls back to the jnp hop otherwise)."""
    bk = min(512, shard_len)
    while shard_len % bk:
        bk //= 2
    return max(bk, 1)


def _ring_qb(r: int, block_k: int) -> int:
    """q-tile rows per grid cell: shrink as the K block grows (score tile is
    (qb, block_k) f32 in VMEM) — same budget rule as the cached kernel."""
    return min(max(128, (MAX_Q_ROWS * 512) // block_k), max(8, -(-r // 8) * 8))


def ring_state_init(b: int, kh: int, r: int, d: int, block_k: int = 512):
    """Fresh (m, l, acc) for flash_ring_block. r = folded query rows (W*G);
    rows are padded to the kernel's q-tile multiple (pass the same block_k as
    the hop calls). m/l keep a 128-lane trailing dim (Mosaic memref tiling);
    only lane 0 is meaningful."""
    qb = _ring_qb(r, block_k)
    r_pad = -(-r // qb) * qb
    return (
        jnp.full((b, kh, r_pad, 128), NEG_INF, jnp.float32),
        jnp.zeros((b, kh, r_pad, 128), jnp.float32),
        jnp.zeros((b, kh, r_pad, d), jnp.float32),
    )


def flash_ring_block(
    state,  # (m, l, acc) from ring_state_init / a previous hop — donated
    q: jnp.ndarray,  # (B, W, NH, D) local query shard (same every hop)
    k_blk: jnp.ndarray,  # (B, KH, S, D) visiting key block
    v_blk: jnp.ndarray,
    *,
    q_start: jnp.ndarray,  # scalar int32: absolute slot of local query row 0
    k_start: jnp.ndarray,  # scalar int32: absolute slot of k_blk column 0
    k_len: jnp.ndarray,  # (B,) int32: keys with absolute slot < k_len are valid
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool = False,
):
    """One ring-attention hop: folds k_blk/v_blk into the online-softmax
    state. Exact same math as one global softmax over all hops (the flash
    trick); causality/right-padding via absolute positions — query row i
    (absolute ``q_start + i``) attends key j iff
    ``k_start + j <= q_start + i`` and ``k_start + j < k_len[b]``.

    Returns the updated (m, l, acc). Finalize with ``ring_state_out``.
    The TPU replacement for the jnp hop in parallel/ring_attention.py: one
    kernel pass per hop instead of XLA materializing (q_chunk x S) score
    tensors through HBM for every chunk of every hop."""
    b, w, nh, d = q.shape
    kh, s = k_blk.shape[1], k_blk.shape[2]
    g = nh // kh
    r = w * g
    scale = d**-0.5 if scale is None else scale
    if s % block_k != 0:
        raise ValueError(
            f"hop block length {s} must be a multiple of block_k={block_k} "
            "(pass block_k=ring_block_k(shard_len) to both ring_state_init "
            "and flash_ring_block)"
        )

    qg = q.reshape(b, w, kh, g, d).transpose(0, 2, 1, 3, 4).reshape(b, kh, r, d)
    m, l, acc = state
    r_pad = m.shape[2]
    qb = _ring_qb(r, block_k)
    if r_pad % qb or r_pad != -(-r // qb) * qb:
        raise ValueError(
            f"state rows {r_pad} inconsistent with q tile {qb} for r={r}: "
            "ring_state_init and flash_ring_block must use the same block_k"
        )
    n_qb = r_pad // qb
    if r_pad != r:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))

    kernel = functools.partial(
        _ring_kernel, w=w, g=g, block_k=block_k, scale=scale, qb=qb
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kh, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, qb, d), lambda i, j, qi, sc: (i, j, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k_blk
            pl.BlockSpec(memory_space=pl.ANY),  # v_blk
            pl.BlockSpec((1, 1, qb, 128), lambda i, j, qi, sc: (i, j, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb, 128), lambda i, j, qi, sc: (i, j, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb, d), lambda i, j, qi, sc: (i, j, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, qb, 128), lambda i, j, qi, sc: (i, j, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb, 128), lambda i, j, qi, sc: (i, j, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb, d), lambda i, j, qi, sc: (i, j, qi, 0), memory_space=pltpu.VMEM),
        ],
    )
    scalars = jnp.concatenate(
        [
            jnp.reshape(q_start, (1,)).astype(jnp.int32),
            jnp.reshape(k_start, (1,)).astype(jnp.int32),
            k_len.astype(jnp.int32),
        ]
    )
    m, l, acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(m.shape, jnp.float32),
            jax.ShapeDtypeStruct(l.shape, jnp.float32),
            jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        ],
        # donate m/l/acc. Alias indices COUNT the scalar-prefetch operand:
        # scalars=0, qg=1, k=2, v=3, m=4, l=5, acc=6
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=interpret,
    )(scalars, qg, k_blk, v_blk, m, l, acc)
    return m, l, acc


def ring_state_out(state, b: int, w: int, nh: int, d: int, dtype) -> jnp.ndarray:
    """Normalize the accumulated state into (B, W, NH, D) attention output."""
    m, l, acc = state
    kh = acc.shape[1]
    g = nh // kh
    r = w * g
    out = acc[:, :, :r] / jnp.maximum(l[:, :, :r, :1], 1e-30)
    return out.reshape(b, kh, w, g, d).transpose(0, 2, 1, 3, 4).reshape(b, w, nh, d).astype(dtype)


def _ring_kernel(sc_ref, q_ref, k_hbm, v_hbm, m_in, l_in, acc_in, m_out, l_out, acc_out,
                 *, w, g, block_k, scale, qb):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    q_start = sc_ref[0]
    k_start = sc_ref[1]
    k_len = sc_ref[2 + b]
    s_total = k_hbm.shape[2]
    r = q_ref.shape[2]
    d = q_ref.shape[-1]
    row0 = qi * qb

    def run(kb_scr, vb_scr, sem, acc_scr, m_scr, l_scr):
        m_scr[...] = m_in[0, 0]
        l_scr[...] = l_in[0, 0]
        acc_scr[...] = acc_in[0, 0]

        # keys this tile can see: absolute slots <= q_start + last_query_index
        # and < max(k_len); blocks past that horizon are never read
        last_q_index = jnp.minimum((row0 + r - 1) // g, w - 1)
        horizon = q_start + last_q_index + 1 - k_start  # exclusive, block-local
        total = jnp.clip(horizon, 0, s_total)
        nblocks = pl.cdiv(total, block_k)
        qs = q_ref[0, 0].astype(jnp.float32) * scale
        row_pos = q_start + (row0 + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)) // g

        def get_dma(slot, kb):
            start = kb * block_k
            return (
                pltpu.make_async_copy(
                    k_hbm.at[b, h, pl.ds(start, block_k), :], kb_scr.at[slot], sem.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    v_hbm.at[b, h, pl.ds(start, block_k), :], vb_scr.at[slot], sem.at[slot, 1]
                ),
            )

        @pl.when(nblocks > 0)
        def _():
            for dma in get_dma(0, 0):
                dma.start()

        def body(kb, _):
            slot = kb % 2
            nxt = (kb + 1) % 2

            @pl.when(kb + 1 < nblocks)
            def _():
                for dma in get_dma(nxt, kb + 1):
                    dma.start()

            for dma in get_dma(slot, kb):
                dma.wait()

            jpos = k_start + kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (r, block_k), 1
            )
            live = (jpos <= row_pos) & (jpos < k_len)
            kblk = kb_scr[slot].astype(jnp.float32)
            vblk = vb_scr[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                qs, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = jnp.where(live, s, NEG_INF)
            m_prev = m_scr[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
                p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_scr[:, :1] = m_new
            return 0

        jax.lax.fori_loop(0, nblocks, body, 0)
        m_out[0, 0] = m_scr[...]
        l_out[0, 0] = l_scr[...]
        acc_out[0, 0] = acc_scr[...]

    pl.run_scoped(
        run,
        kb_scr=pltpu.VMEM((2, block_k, d), k_hbm.dtype),
        vb_scr=pltpu.VMEM((2, block_k, d), v_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2, 2)),
        acc_scr=pltpu.VMEM((r, d), jnp.float32),
        m_scr=pltpu.VMEM((r, 128), jnp.float32),
        l_scr=pltpu.VMEM((r, 128), jnp.float32),
    )
