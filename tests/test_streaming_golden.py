"""Golden parity for the streaming 0.5B family: reference forward_lm /
forward_tts_lm vs our split-stack forwards with converted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import reference_available

from vibevoice_tpu import configs as C
from vibevoice_tpu.models import qwen2, streaming as st
from vibevoice_tpu.utils.hf_interop import convert_streaming_model

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference checkout absent")

TINY = C.VibeVoiceStreamingConfig(
    acoustic_tokenizer_config=C.AcousticTokenizerConfig(
        vae_dim=8, encoder_n_filters=4, encoder_ratios=(4, 2), encoder_depths=(1, 1, 1),
        decoder_n_filters=4,
    ),
    decoder_config=C.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
        rope_theta=10_000.0,
    ),
    diffusion_head_config=C.DiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=8),
    tts_backbone_num_hidden_layers=2,
)


@pytest.fixture(scope="module")
def ref_model():
    import torch
    from reference_shim import import_reference

    import_reference()
    from transformers.models.qwen2 import Qwen2Config
    from vibevoice.modular.configuration_vibevoice_streaming import VibeVoiceStreamingConfig
    from vibevoice.modular.modeling_vibevoice_streaming_inference import (
        VibeVoiceStreamingForConditionalGenerationInference,
    )
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceAcousticTokenizerConfig,
        VibeVoiceDiffusionHeadConfig,
    )

    cfg = VibeVoiceStreamingConfig(
        acoustic_tokenizer_config=VibeVoiceAcousticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
            decoder_n_filters=4,
        ),
        decoder_config=Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
            rope_theta=10_000.0, attn_implementation="eager",
        ),
        diffusion_head_config=VibeVoiceDiffusionHeadConfig(
            hidden_size=32, head_layers=2, latent_size=8
        ),
        tts_backbone_num_hidden_layers=2,
    )
    torch.manual_seed(0)
    return VibeVoiceStreamingForConditionalGenerationInference(cfg).eval()


@pytest.fixture(scope="module")
def params(ref_model):
    return convert_streaming_model(ref_model.state_dict(), TINY)


def test_split_sizes(ref_model, params):
    assert len(params["language_model"]["layers"]) == 2
    assert len(params["tts_language_model"]["layers"]) == 2


def test_forward_lm_matches(ref_model, params):
    import torch

    ids = np.random.RandomState(0).randint(0, 128, (1, 9))
    with torch.no_grad():
        ref = ref_model.forward_lm(
            input_ids=torch.from_numpy(ids), use_cache=False, return_dict=True
        ).last_hidden_state.numpy()
    lcfg = st._lower_cfg(TINY)
    embeds = qwen2.embed_tokens(params["language_model"], jnp.asarray(ids))
    h, _ = qwen2.forward(lcfg, params["language_model"], embeds, skip_final_norm=True)
    np.testing.assert_allclose(np.asarray(h), ref, rtol=1e-4, atol=1e-4)


def test_forward_tts_lm_matches(ref_model, params):
    """Text-window path: lm hidden spliced in + type embedding + EOS logit
    (reference modeling_vibevoice_streaming_inference.py:243-318)."""
    import torch

    rng = np.random.RandomState(1)
    ids = rng.randint(0, 128, (1, 6))
    lm_hidden = rng.randn(1, 6, 32).astype(np.float32)
    with torch.no_grad():
        out = ref_model.forward_tts_lm(
            input_ids=torch.from_numpy(ids),
            lm_last_hidden_state=torch.from_numpy(lm_hidden),
            tts_text_masks=torch.ones(1, 1, dtype=torch.long),
            use_cache=False,
            return_dict=True,
        )
        ref_h = out.last_hidden_state.numpy()
        ref_eos = out.logits.numpy()

    ucfg = st._upper_cfg(TINY)
    # the reference overwrites ALL new embeddings with lm_hidden here
    tts_in = jnp.asarray(lm_hidden) + params["tts_input_types"][1][None, None, :]
    h, _ = qwen2.forward(ucfg, params["tts_language_model"], tts_in)
    eos = st.eos_logit(params, h[:, -1])
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eos), ref_eos, rtol=1e-4, atol=1e-4)


def test_speech_type_embedding_matches(ref_model, params):
    """Speech-frame path uses type index 0 (reference :659)."""
    import torch

    rng = np.random.RandomState(2)
    acoustic_embed = rng.randn(1, 1, 32).astype(np.float32)
    with torch.no_grad():
        out = ref_model.forward_tts_lm(
            input_ids=torch.zeros(1, 1, dtype=torch.long),
            lm_last_hidden_state=torch.from_numpy(acoustic_embed),
            tts_text_masks=torch.zeros(1, 1, dtype=torch.long),
            use_cache=False,
            return_dict=True,
        )
        ref_h = out.last_hidden_state.numpy()

    ucfg = st._upper_cfg(TINY)
    tts_in = jnp.asarray(acoustic_embed) + params["tts_input_types"][0][None, None, :]
    h, _ = qwen2.forward(ucfg, params["tts_language_model"], tts_in)
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-4, atol=1e-4)
