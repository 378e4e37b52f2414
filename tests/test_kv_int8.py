"""int8 KV cache tests.

The quantized cache (qwen2.make_cache(quantized=True)) stores K/V as int8
with per-(token, kv-head) row scales; it halves KV HBM bytes (decode
attention's bandwidth term) and is what puts 7B @ 32K on a single v5e
(CLAUDE.md memory plan). These tests pin:

* row quantization round-trip error bounds,
* the XLA dequantize path vs an exact float cache,
* the flash kernel's in-kernel scale folding vs the XLA int8 path (bitwise
  same quantized cache content, so tolerances are tight),
* end-to-end generate() smoke with kv_int8 enabled.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# fast gate (-m "not slow") skips this module: int8-KV vs float parity sweeps (~44 s serial)
pytestmark = pytest.mark.slow

from vibevoice_tpu.configs import Qwen2Config
from vibevoice_tpu.models import qwen2

TINY = Qwen2Config(
    vocab_size=64,
    hidden_size=256,
    intermediate_size=512,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    max_position_embeddings=1024,
    rope_theta=10_000.0,
)


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 4, 128).astype(np.float32) * 5.0)
    q, scale = qwen2.quantize_kv_rows(x)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(scale)[..., None]
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    # round-to-nearest: error <= half a quantization step per row
    bound = np.broadcast_to(amax / 127.0 * 0.5 + 1e-6, deq.shape)
    np.testing.assert_array_less(np.abs(deq - np.asarray(x)), bound)


def test_quantize_rows_zero_row():
    x = jnp.zeros((1, 1, 1, 128))
    q, scale = qwen2.quantize_kv_rows(x)
    assert np.asarray(scale).item() == 0.0
    assert np.all(np.asarray(q) == 0)


def _run_forward(cfg, params, chunks, *, quantized, max_len=512):
    cache = qwen2.make_cache(cfg, chunks[0].shape[0], max_len, jnp.float32, quantized=quantized)
    outs = []
    for e in chunks:
        h, cache = qwen2.forward(cfg, params, e, cache=cache)
        outs.append(np.asarray(h))
    return outs, cache


def test_int8_cache_close_to_float_xla():
    """XLA (masked) attention over the int8 cache tracks the exact float
    cache within int8 quantization noise."""
    params = qwen2.init(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(1)
    chunks = [
        jnp.asarray(rng.randn(2, 7, 256), jnp.float32),
        jnp.asarray(rng.randn(2, 1, 256), jnp.float32),
        jnp.asarray(rng.randn(2, 1, 256), jnp.float32),
    ]
    exact, cache_f = _run_forward(TINY, params, chunks, quantized=False)
    quant, cache_q = _run_forward(TINY, params, chunks, quantized=True)
    assert cache_q.k[0].dtype == jnp.int8
    assert cache_q.k_scale[0].shape == (2, TINY.num_key_value_heads, 1, 512)
    for e, q in zip(exact, quant):
        # hidden states are O(10); per-row 8-bit K/V keeps attention outputs
        # within ~1% of exact
        np.testing.assert_allclose(q, e, rtol=0.05, atol=0.15)
        assert np.abs(q - e).mean() < 0.02 * max(np.abs(e).mean(), 1.0)


def test_flash_int8_matches_xla_int8():
    """Forced-flash (interpret) on the SAME int8 cache content must match the
    XLA dequantize path tightly — both read identical quantized values."""
    params = qwen2.init(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(2)
    chunks = [
        jnp.asarray(rng.randn(1, 5, 256), jnp.float32),
        jnp.asarray(rng.randn(1, 1, 256), jnp.float32),
    ]
    try:
        qwen2.set_attention_impl("xla")
        xla_out, xla_cache = _run_forward(TINY, params, chunks, quantized=True)
        qwen2.set_attention_impl("flash")
        fl_out, fl_cache = _run_forward(TINY, params, chunks, quantized=True)
    finally:
        qwen2.set_attention_impl("auto")
    np.testing.assert_array_equal(np.asarray(fl_cache.k[0]), np.asarray(xla_cache.k[0]))
    np.testing.assert_allclose(
        np.asarray(fl_cache.k_scale[0]), np.asarray(xla_cache.k_scale[0]), rtol=1e-6
    )
    for f, x in zip(fl_out, xla_out):
        np.testing.assert_allclose(f, x, rtol=2e-4, atol=2e-4)


def test_flash_int8_padded_head_dim():
    """head_dim 64 lane-padding composes with int8 quantization (pad lanes
    are zero, so row scales are unaffected)."""
    cfg = Qwen2Config(
        vocab_size=64, hidden_size=128, intermediate_size=256, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, max_position_embeddings=1024,
        rope_theta=10_000.0,
    )
    assert cfg.head_dim == 64
    params = qwen2.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(3)
    chunks = [jnp.asarray(rng.randn(1, 4, 128), jnp.float32)]
    try:
        qwen2.set_attention_impl("flash")
        fl_out, fl_cache = _run_forward(cfg, params, chunks, quantized=True)
        qwen2.set_attention_impl("xla")
        xla_out, _ = _run_forward(cfg, params, chunks, quantized=True)
    finally:
        qwen2.set_attention_impl("auto")
    assert fl_cache.k[0].shape[-1] == 128
    assert np.all(np.asarray(fl_cache.k[0][..., 64:]) == 0)
    np.testing.assert_allclose(fl_out[0], xla_out[0], rtol=2e-3, atol=2e-3)


def test_generate_kv_int8_smoke():
    """generate() runs end-to-end with the int8 cache and emits audio obeying
    the same invariants as the float-cache path (constrained tokens, hop-
    aligned audio)."""
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.models import inference as inf
    from vibevoice_tpu.models import vibevoice as vv

    cfg = tiny_config()
    hop = 8  # tiny tokenizer ratios (4, 2)
    toks = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2, bos=None)
    params = vv.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 100, (1, 8)).astype(np.int64)
    ids[:, -1] = toks.speech_start
    out = inf.generate(
        cfg,
        params,
        input_ids=ids,
        valid_mask=np.ones_like(ids, bool),
        tokens=toks,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=64, kv_int8=True),
        seed=0,
    )
    gen = out.sequences[:, 8:]
    assert set(np.unique(gen)).issubset(set(toks.candidates))
    eos_pos = np.nonzero(gen[0] == toks.eos)[0]
    end = eos_pos[0] if len(eos_pos) else gen.shape[1]
    n_diff = int((gen[0, :end] == toks.speech_diffusion).sum())
    audio = out.speech_outputs[0]
    n_audio = 0 if audio is None else len(audio)
    assert n_audio == n_diff * hop
    if audio is not None:
        assert np.isfinite(audio).all()


def test_kv_int8_auto_policy():
    """kv_int8=None resolves automatically: on for long-context caches where
    halved KV bytes dominate, off at short contexts where quantize-on-write
    costs ~8% (VERDICT r2 item 8); explicit True/False always wins."""
    from vibevoice_tpu.models.inference import (
        KV_INT8_AUTO_LEN,
        GenerateOptions,
        resolve_kv_int8,
    )

    assert GenerateOptions().kv_int8 is None
    assert resolve_kv_int8(GenerateOptions(), 4096).kv_int8 is False
    assert resolve_kv_int8(GenerateOptions(), KV_INT8_AUTO_LEN).kv_int8 is True
    assert resolve_kv_int8(GenerateOptions(), 1 << 16).kv_int8 is True
    assert resolve_kv_int8(GenerateOptions(kv_int8=False), 1 << 17).kv_int8 is False
    assert resolve_kv_int8(GenerateOptions(kv_int8=True), 128).kv_int8 is True
