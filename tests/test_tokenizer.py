"""Tokenizer tests: streaming/batch equivalence and golden parity with the
PyTorch reference (SURVEY.md §4 items 1-2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.configs import AcousticTokenizerConfig
from vibevoice_tpu.models import tokenizer as tok

from reference_shim import reference_available

TINY = AcousticTokenizerConfig(
    vae_dim=8,
    encoder_n_filters=4,
    encoder_ratios=(4, 2),
    encoder_depths=(1, 2, 1),
    decoder_n_filters=4,
)
HOP = 8


@pytest.fixture(scope="module")
def params():
    return tok.init_acoustic_tokenizer(jax.random.PRNGKey(0), TINY)


def test_encoder_shapes(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 1))
    mean, _ = tok.encode(TINY, params, x)
    assert mean.shape == (2, 64 // HOP, TINY.vae_dim)


def test_decoder_shapes(params):
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 5, TINY.vae_dim))
    audio, _ = tok.decode(TINY, params, z)
    assert audio.shape == (2, 5 * HOP, 1)


def test_encoder_streaming_equals_batch(params):
    """Chunked streaming encode must bit-match the full-utterance encode —
    the invariant the reference cache design guarantees (SURVEY.md §4)."""
    B, T = 2, 128
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, 1))
    full, _ = tok.encode(TINY, params, x)

    state = tok.init_encoder_state(TINY, B)
    chunks = []
    chunk = 32  # multiple of hop
    for i in range(0, T, chunk):
        y, state = tok.encode(TINY, params, x[:, i : i + chunk], state)
        chunks.append(y)
    streamed = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(streamed), rtol=2e-5, atol=2e-5)


def test_decoder_streaming_equals_batch(params):
    B, T = 2, 12
    z = jax.random.normal(jax.random.PRNGKey(4), (B, T, TINY.vae_dim))
    full, _ = tok.decode(TINY, params, z)

    state = tok.init_decoder_state(TINY, B)
    chunks = []
    for i in range(T):  # one latent frame at a time — the decode hot path
        y, state = tok.decode(TINY, params, z[:, i : i + 1], state)
        assert y.shape == (B, HOP, 1)
        chunks.append(y)
    streamed = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(streamed), rtol=2e-5, atol=2e-5)


def test_state_reset(params):
    """reset_state zeroes only the masked samples' buffers."""
    B = 2
    state = tok.init_decoder_state(TINY, B)
    z = jax.random.normal(jax.random.PRNGKey(5), (B, 1, TINY.vae_dim))
    _, state = tok.decode(TINY, params, z, state)
    reset = tok.reset_state(state, jnp.array([True, False]))
    for k in state:
        assert np.all(np.asarray(reset[k][0]) == 0)
        np.testing.assert_array_equal(np.asarray(reset[k][1]), np.asarray(state[k][1]))


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
class TestGoldenVsReference:
    """Bit-level parity with the PyTorch reference on a tiny config."""

    @pytest.fixture(scope="class")
    def ref_model(self):
        import torch
        from reference_shim import import_reference

        import_reference()
        from vibevoice.modular.modular_vibevoice_tokenizer import (
            VibeVoiceAcousticTokenizerModel,
        )
        from vibevoice.modular.configuration_vibevoice import (
            VibeVoiceAcousticTokenizerConfig,
        )

        torch.manual_seed(0)
        cfg = VibeVoiceAcousticTokenizerConfig(
            vae_dim=8,
            encoder_n_filters=4,
            encoder_ratios=[4, 2],
            encoder_depths="1-2-1",
            decoder_n_filters=4,
        )
        model = VibeVoiceAcousticTokenizerModel(cfg).eval()
        return model

    @pytest.fixture(scope="class")
    def jax_params(self, ref_model):
        from vibevoice_tpu.utils.torch_convert import convert_acoustic_tokenizer

        return convert_acoustic_tokenizer(ref_model.state_dict(), TINY)

    def test_encode_matches(self, ref_model, jax_params):
        import torch

        x = np.random.RandomState(0).randn(2, 1, 96).astype(np.float32)
        with torch.no_grad():
            ref = ref_model.encode(torch.from_numpy(x)).mean.numpy()  # (B, T', D)
        ours, _ = tok.encode(TINY, jax_params, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_decode_matches(self, ref_model, jax_params):
        import torch

        z = np.random.RandomState(1).randn(2, 6, 8).astype(np.float32)
        with torch.no_grad():
            ref = ref_model.decode(torch.from_numpy(z)).numpy()  # (B, 1, T)
        ours, _ = tok.decode(TINY, jax_params, jnp.asarray(z))
        # XLA's dilated-conv lowering accumulates in a different order than
        # torch's ConvTranspose1d; only abs tolerance is meaningful here.
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, rtol=0, atol=3e-4
        )

    def test_streaming_decode_matches_reference_streaming(self, ref_model, jax_params):
        import torch
        from vibevoice.modular.modular_vibevoice_tokenizer import (
            VibeVoiceTokenizerStreamingCache,
        )

        z = np.random.RandomState(2).randn(1, 4, 8).astype(np.float32)
        cache = VibeVoiceTokenizerStreamingCache()
        idx = torch.tensor([0])
        ref_chunks = []
        with torch.no_grad():
            for i in range(4):
                ref_chunks.append(
                    ref_model.decode(
                        torch.from_numpy(z[:, i : i + 1]).transpose(1, 2),
                        cache=cache,
                        sample_indices=idx,
                        use_cache=True,
                    ).numpy()
                )
        ref = np.concatenate(ref_chunks, axis=-1)

        state = tok.init_decoder_state(TINY, 1)
        ours_chunks = []
        for i in range(4):
            y, state = tok.decode(TINY, jax_params, jnp.asarray(z[:, i : i + 1]), state)
            ours_chunks.append(np.asarray(y))
        ours = np.concatenate(ours_chunks, axis=1).transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=3e-4)


def test_dilated_conv_streaming_equals_batch():
    """SConv1d supports dilation (reference :261); streaming context math
    (k-1)*d-(s-1) must hold for d>1 too."""
    from vibevoice_tpu.ops import conv as C

    rng = np.random.RandomState(0)
    k, d = 5, 3
    w = jnp.asarray(rng.randn(k, 2, 3).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(3).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(1, 48, 2).astype(np.float32))
    full = C.causal_conv1d(x, w, b, dilation=d)

    ctx = C.conv_context_size(k, 1, d)
    state = jnp.zeros((1, ctx, 2))
    outs = []
    for i in range(0, 48, 8):
        y, state = C.causal_conv1d_streaming(x[:, i : i + 8], state, w, b, dilation=d)
        outs.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full), rtol=1e-5, atol=1e-5
    )


def test_strided_conv_streaming_equals_batch():
    from vibevoice_tpu.ops import conv as C

    rng = np.random.RandomState(1)
    k, s = 8, 4  # downsample conv shape (ratio*2, ratio)
    w = jnp.asarray(rng.randn(k, 2, 3).astype(np.float32) * 0.2)
    x = jnp.asarray(rng.randn(1, 64, 2).astype(np.float32))
    full = C.causal_conv1d(x, w, None, stride=s)

    ctx = C.conv_context_size(k, s)
    state = jnp.zeros((1, ctx, 2))
    outs = []
    for i in range(0, 64, 16):  # chunk multiple of stride
        y, state = C.causal_conv1d_streaming(x[:, i : i + 16], state, w, None, stride=s)
        outs.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full), rtol=1e-5, atol=1e-5
    )


@pytest.mark.skipif(not reference_available(), reason="reference not importable")
def test_full_conv_mixer_golden():
    """mixer_layer='conv' (full-conv mixer, reference Block1D :632-639 —
    also the reference's getattr fallback when the attr is missing): encode
    and decode must match the torch reference, and streaming must still
    equal batch with the groups=1 conv state."""
    import torch
    from reference_shim import import_reference

    import_reference()
    from vibevoice.modular.modular_vibevoice_tokenizer import (
        VibeVoiceAcousticTokenizerModel,
    )
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceAcousticTokenizerConfig,
    )
    from vibevoice_tpu.utils.torch_convert import convert_acoustic_tokenizer

    cfgkw = dict(
        vae_dim=8,
        encoder_n_filters=4,
        encoder_ratios=[4, 2],
        encoder_depths="1-2-1",
        decoder_n_filters=4,
        mixer_layer="conv",
    )
    torch.manual_seed(0)
    ref_model = VibeVoiceAcousticTokenizerModel(
        VibeVoiceAcousticTokenizerConfig(**cfgkw)
    ).eval()
    ours_cfg = AcousticTokenizerConfig(
        vae_dim=8,
        encoder_n_filters=4,
        encoder_ratios=(4, 2),
        encoder_depths=(1, 2, 1),
        decoder_n_filters=4,
        mixer_layer="conv",
    )
    params = convert_acoustic_tokenizer(ref_model.state_dict(), ours_cfg)
    # full-conv mixer weights really are (k, dim, dim)
    assert params["decoder"]["stages"][0][0]["mixer"]["w"].shape[1] > 1

    x = np.random.RandomState(0).randn(2, 1, 96).astype(np.float32)
    with torch.no_grad():
        ref = ref_model.encode(torch.from_numpy(x)).mean.numpy()
    ours, _ = tok.encode(ours_cfg, params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    z = np.random.RandomState(1).randn(2, 6, 8).astype(np.float32)
    with torch.no_grad():
        refd = ref_model.decode(torch.from_numpy(z)).numpy()
    oursd, _ = tok.decode(ours_cfg, params, jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(oursd).transpose(0, 2, 1), refd, rtol=0, atol=3e-4
    )

    # streaming ≡ batch with the groups=1 mixer
    state = tok.init_decoder_state(ours_cfg, 2)
    chunks = []
    for i in range(z.shape[1]):
        y, state = tok.decode(ours_cfg, params, jnp.asarray(z[:, i : i + 1]), state)
        chunks.append(y)
    streamed = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(oursd), rtol=2e-5, atol=2e-5
    )


@pytest.mark.skipif(not reference_available(), reason="reference not importable")
def test_affine_free_norm_golden():
    """layernorm_elementwise_affine=False (affine-free ConvRMSNorm — no
    weight in the state dict): conversion and forward must still normalize
    and match the reference."""
    import torch
    from reference_shim import import_reference

    import_reference()
    from vibevoice.modular.modular_vibevoice_tokenizer import (
        VibeVoiceAcousticTokenizerModel,
    )
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceAcousticTokenizerConfig,
    )
    from vibevoice_tpu.utils.torch_convert import convert_acoustic_tokenizer

    torch.manual_seed(0)
    # the reference applies the flag only to the encoder/decoder FINAL norm
    # (norm_type partial, :726); Block1D norms are always affine (:628-630),
    # so exercise it with disable_last_norm=False
    ref_model = VibeVoiceAcousticTokenizerModel(
        VibeVoiceAcousticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=[4, 2],
            encoder_depths="1-2-1", decoder_n_filters=4,
            layernorm_elementwise_affine=False, disable_last_norm=False,
        )
    ).eval()
    ours_cfg = AcousticTokenizerConfig(
        vae_dim=8, encoder_n_filters=4, encoder_ratios=(4, 2),
        encoder_depths=(1, 2, 1), decoder_n_filters=4,
        layernorm_elementwise_affine=False, disable_last_norm=False,
    )
    params = convert_acoustic_tokenizer(ref_model.state_dict(), ours_cfg)
    assert "w" in params["encoder"]["stages"][0][0]["norm"]  # blocks: affine
    assert "final_norm" in params["encoder"]
    assert "w" not in params["encoder"]["final_norm"]  # final: affine-free

    x = np.random.RandomState(0).randn(2, 1, 96).astype(np.float32)
    with torch.no_grad():
        ref = ref_model.encode(torch.from_numpy(x)).mean.numpy()
    ours, _ = tok.encode(ours_cfg, params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    z = np.random.RandomState(1).randn(2, 6, 8).astype(np.float32)
    with torch.no_grad():
        refd = ref_model.decode(torch.from_numpy(z)).numpy()
    oursd, _ = tok.decode(ours_cfg, params, jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(oursd).transpose(0, 2, 1), refd, rtol=0, atol=3e-4
    )


def test_unsupported_config_guards_fire_at_construction():
    """causal=False / per-conv norm-module variants are rejected when the
    CONFIG is built, so every path (random init, checkpoint conversion,
    JSON load) fails loudly instead of running silently-wrong semantics."""
    import pytest
    from vibevoice_tpu.configs import AcousticTokenizerConfig, SemanticTokenizerConfig

    for cls in (AcousticTokenizerConfig, SemanticTokenizerConfig):
        with pytest.raises(NotImplementedError, match="non-causal"):
            cls(causal=False)
        with pytest.raises(NotImplementedError, match="conv_norm"):
            cls(conv_norm="time_group_norm")
