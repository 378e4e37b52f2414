"""Full-model checkpoint conversion golden test: build the reference
VibeVoice inference model on a tiny config, convert its state dict, and
compare the voice-clone prefill hidden states end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import reference_available

from vibevoice_tpu import configs as C
from vibevoice_tpu.models import qwen2, vibevoice as vv
from vibevoice_tpu.utils.hf_interop import convert_full_model

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference checkout absent")

TINY = C.VibeVoiceConfig(
    acoustic_tokenizer_config=C.AcousticTokenizerConfig(
        vae_dim=8, encoder_n_filters=4, encoder_ratios=(4, 2), encoder_depths=(1, 1, 1),
        decoder_n_filters=4, std_dist_type="fix", fix_std=0.0,
    ),
    semantic_tokenizer_config=C.SemanticTokenizerConfig(
        vae_dim=8, encoder_n_filters=4, encoder_ratios=(4, 2), encoder_depths=(1, 1, 1),
    ),
    decoder_config=C.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
        rope_theta=10_000.0, tie_word_embeddings=True,
    ),
    diffusion_head_config=C.DiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=8),
)


@pytest.fixture(scope="module")
def ref_model():
    import torch
    from reference_shim import import_reference

    import_reference()
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceAcousticTokenizerConfig,
        VibeVoiceConfig,
        VibeVoiceDiffusionHeadConfig,
        VibeVoiceSemanticTokenizerConfig,
    )
    from vibevoice.modular.modeling_vibevoice_inference import (
        VibeVoiceForConditionalGenerationInference,
    )
    from transformers.models.qwen2 import Qwen2Config

    cfg = VibeVoiceConfig(
        acoustic_tokenizer_config=VibeVoiceAcousticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
            decoder_n_filters=4, std_dist_type="fix", fix_std=0.0,
        ),
        semantic_tokenizer_config=VibeVoiceSemanticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
        ),
        decoder_config=Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
            rope_theta=10_000.0, tie_word_embeddings=True,
            attn_implementation="eager",
        ),
        diffusion_head_config=VibeVoiceDiffusionHeadConfig(
            hidden_size=32, head_layers=2, latent_size=8
        ),
    )
    torch.manual_seed(0)
    model = VibeVoiceForConditionalGenerationInference(cfg).eval()
    with torch.no_grad():
        model.model.speech_scaling_factor.fill_(0.5)
        model.model.speech_bias_factor.fill_(0.1)
    return model


def test_prefill_hidden_matches_reference(ref_model):
    import torch

    sd = {k: v for k, v in ref_model.state_dict().items()}
    params = convert_full_model(sd, TINY)
    assert float(params["speech_scaling_factor"]) == 0.5

    rng = np.random.RandomState(0)
    t = 12
    ids = rng.randint(0, 128, (1, t))
    speech_mask = np.zeros((1, t), bool)
    speech_mask[0, 3:7] = True  # 4 voice-latent positions
    wav = rng.randn(1, 4 * 8).astype(np.float32) * 0.1  # 4 frames at hop 8

    with torch.no_grad():
        ref_out = ref_model(
            input_ids=torch.from_numpy(ids),
            speech_tensors=torch.from_numpy(wav),
            speech_masks=torch.ones(1, 4, dtype=torch.bool),
            speech_input_mask=torch.from_numpy(speech_mask),
            logits_to_keep=1,
            return_dict=True,
            use_cache=False,
        )
        ref_h = ref_out.last_hidden_state.numpy()
        ref_logits = ref_out.logits.numpy()

    # ours: encode voice -> splice -> forward (fix_std=0 makes sampling
    # deterministic on both sides)
    feats = vv.encode_voice_features(TINY, params, jnp.asarray(wav), key=jax.random.PRNGKey(0))
    embeds = qwen2.embed_tokens(params["lm"], jnp.asarray(ids))
    embeds = vv.splice_speech_features(
        embeds, jnp.asarray(speech_mask), feats, jnp.ones((1, 4), bool)
    )
    h, _ = qwen2.forward(TINY.decoder_config, params["lm"], embeds)
    logits = vv.lm_logits(params, h[:, -1:]).astype(jnp.float32)

    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-3, atol=2e-4)


def test_load_checkpoint_int8_host_quantized(tmp_path, ref_model):
    """int8 checkpoint loading quantizes on the host (the 7B path where the
    bf16 LM cannot coexist with its int8 copy on-device): the loaded tree
    carries int8 LM linears + lm_head_q and drives a forward step."""
    import json
    import torch
    from vibevoice_tpu.utils.hf_interop import load_checkpoint

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    torch.save(ref_model.state_dict(), ckpt / "pytorch_model.bin")
    import dataclasses

    with open(ckpt / "config.json", "w") as f:
        json.dump(dataclasses.asdict(TINY), f, default=str)
    with open(ckpt / "preprocessor_config.json", "w") as f:
        json.dump({"speech_tok_compress_ratio": 8, "db_normalize": True}, f)

    cfg, params, _ = load_checkpoint(
        str(ckpt), dtype="float32", int8=True, allow_fallback_tokenizer=True
    )
    assert "lm_head_q" in params
    assert params["lm"]["layers"][0]["mlp"]["gate"].get("w8") is not None or (
        # tiny dims below the 512-tile threshold stay dense by design
        "w" in params["lm"]["layers"][0]["mlp"]["gate"]
    )
    h = vv.lm_logits(params, jnp.ones((1, TINY.decoder_config.hidden_size)))
    assert np.isfinite(np.asarray(h)).all()


def test_conv_norm_reparametrization_folding():
    """conv_norm='weight_norm'/'spectral_norm' checkpoints (reference
    apply_parametrization_norm, modular_vibevoice_tokenizer.py:98-107) store
    reparametrized conv tensors; _raw_conv_weight must fold them to the
    exact eval-time weight torch computes."""
    import torch

    from vibevoice_tpu.utils.torch_convert import _raw_conv_weight

    torch.manual_seed(0)

    # legacy weight_norm: weight_g / weight_v
    conv = torch.nn.Conv1d(4, 6, 5)
    wn = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 5))
    wn.load_state_dict(
        {k: v for k, v in torch.nn.utils.weight_norm(conv).state_dict().items()}
    )
    sd = {f"c.{k}": v for k, v in wn.state_dict().items()}
    folded = _raw_conv_weight(sd, "c")
    ref = torch.nn.utils.remove_weight_norm(wn).weight.detach().numpy()
    np.testing.assert_allclose(folded, ref, rtol=1e-6, atol=1e-6)

    # parametrize-API weight_norm: parametrizations.weight.original0/1
    pn = torch.nn.utils.parametrizations.weight_norm(torch.nn.Conv1d(4, 6, 5))
    sd = {f"c.{k}": v for k, v in pn.state_dict().items()}
    folded = _raw_conv_weight(sd, "c")
    torch.nn.utils.parametrize.remove_parametrizations(pn, "weight")
    np.testing.assert_allclose(folded, pn.weight.detach().numpy(), rtol=1e-6, atol=1e-6)

    # legacy spectral_norm: weight_orig + weight_u, eval-time sigma division
    sn = torch.nn.utils.spectral_norm(torch.nn.Conv1d(4, 6, 5))
    sn.eval()
    with torch.no_grad():
        sn(torch.zeros(1, 4, 16))  # settle u/v power iteration state
    sd = {f"c.{k}": v for k, v in sn.state_dict().items()}
    folded = _raw_conv_weight(sd, "c")
    ref = torch.nn.utils.remove_spectral_norm(sn).weight.detach().numpy()
    np.testing.assert_allclose(folded, ref, rtol=1e-5, atol=1e-6)

    # plain weight passes through untouched
    sd = {"c.weight": conv.weight}
    np.testing.assert_allclose(
        _raw_conv_weight(sd, "c"), conv.weight.detach().numpy(), rtol=0, atol=0
    )
