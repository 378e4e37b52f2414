"""Real-checkpoint dress rehearsal (VERDICT r2 item 2): synthetic checkpoints
in the EXACT shipped HF layout — sharded safetensors + model.safetensors.index.json
+ real reference key names — loaded end-to-end through load_checkpoint /
load_streaming_checkpoint, for the tied-1.5B layout, the untied-7B layout
(bf16 shards), and weight_norm-parametrized tokenizer convs
(reference modeling_vibevoice.py:107-142, modular_vibevoice_tokenizer.py:98-124).

Also pins the loud-failure contract: a real checkpoint dir that yields no
text tokenizer must raise, never silently substitute the hash fallback.
"""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import reference_available

from vibevoice_tpu import configs as C
from vibevoice_tpu.models import qwen2, vibevoice as vv

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference checkout absent")


def _tiny_cfg(tie: bool = True, conv_norm: str = "none") -> C.VibeVoiceConfig:
    return C.VibeVoiceConfig(
        acoustic_tokenizer_config=C.AcousticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=(4, 2), encoder_depths=(1, 1, 1),
            decoder_n_filters=4, std_dist_type="fix", fix_std=0.0, conv_norm=conv_norm,
        ),
        semantic_tokenizer_config=C.SemanticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=(4, 2), encoder_depths=(1, 1, 1),
        ),
        decoder_config=C.Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
            rope_theta=10_000.0, tie_word_embeddings=tie,
        ),
        diffusion_head_config=C.DiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=8),
    )


def _ref_model(tie: bool = True, conv_norm: str = "none"):
    import torch
    from reference_shim import import_reference

    import_reference()
    from transformers.models.qwen2 import Qwen2Config
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceAcousticTokenizerConfig,
        VibeVoiceConfig,
        VibeVoiceDiffusionHeadConfig,
        VibeVoiceSemanticTokenizerConfig,
    )
    from vibevoice.modular.modeling_vibevoice_inference import (
        VibeVoiceForConditionalGenerationInference,
    )

    cfg = VibeVoiceConfig(
        acoustic_tokenizer_config=VibeVoiceAcousticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
            decoder_n_filters=4, std_dist_type="fix", fix_std=0.0, conv_norm=conv_norm,
        ),
        semantic_tokenizer_config=VibeVoiceSemanticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
        ),
        decoder_config=Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
            rope_theta=10_000.0, tie_word_embeddings=tie, attn_implementation="eager",
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


def _write_hf_checkpoint(path, ref_model, cfg, n_shards=3, dtype=None, drop_tied_head=True):
    """Write `path` in the exact shipped layout: sharded safetensors named
    model-XXXXX-of-XXXXX.safetensors + model.safetensors.index.json whose
    weight_map names every tensor, config.json, preprocessor_config.json."""
    import torch
    from safetensors.torch import save_file

    path.mkdir(parents=True, exist_ok=True)
    sd = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}
    if drop_tied_head and ref_model.config.decoder_config.tie_word_embeddings:
        # HF save_pretrained drops tied duplicates (safetensors refuses
        # shared tensors) — the shipped tied-1.5B checkpoint has no lm_head key
        sd.pop("lm_head.weight", None)
    if dtype is not None:
        sd = {k: v.to(dtype) for k, v in sd.items()}
    keys = sorted(sd)
    weight_map = {}
    for si in range(n_shards):
        fname = f"model-{si + 1:05d}-of-{n_shards:05d}.safetensors"
        shard = {k: sd[k].contiguous() for k in keys[si::n_shards]}
        if not shard:
            continue
        save_file(shard, str(path / fname))
        weight_map.update({k: fname for k in shard})
    with open(path / "model.safetensors.index.json", "w") as f:
        json.dump(
            {
                "metadata": {"total_size": sum(v.numel() * v.element_size() for v in sd.values())},
                "weight_map": weight_map,
            },
            f,
        )
    with open(path / "config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f, default=str)
    with open(path / "preprocessor_config.json", "w") as f:
        json.dump(
            {"processor_class": "VibeVoiceProcessor", "speech_tok_compress_ratio": 8,
             "db_normalize": True},
            f,
        )


def _write_real_tokenizer(path):
    """A genuine (tiny) HF fast tokenizer with the reference's speech special
    tokens, loadable fully offline — stands in for the Qwen2 BPE files a real
    checkpoint ships."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["Speaker", "Voice", "Text", "Speech", "input", "output", "Hello",
             "world", ":", "0", "1", "2", "3", ",", ".", "\n"]
    vocab = {"<unk>": 0}
    for w in words:
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.add_special_tokens(
        ["<|endoftext|>", "<|vision_start|>", "<|vision_end|>", "<|vision_pad|>", "<|image_pad|>"]
    )
    tok.save(str(path / "tokenizer.json"))
    with open(path / "tokenizer_config.json", "w") as f:
        json.dump(
            {"tokenizer_class": "PreTrainedTokenizerFast", "eos_token": "<|endoftext|>",
             "pad_token": "<|image_pad|>"},
            f,
        )


def _prefill_logits(cfg, params, seed=0):
    rng = np.random.RandomState(seed)
    t = 12
    ids = rng.randint(0, 128, (1, t))
    speech_mask = np.zeros((1, t), bool)
    speech_mask[0, 3:7] = True
    wav = rng.randn(1, 4 * 8).astype(np.float32) * 0.1
    feats = vv.encode_voice_features(cfg, params, jnp.asarray(wav), key=jax.random.PRNGKey(0))
    embeds = qwen2.embed_tokens(params["lm"], jnp.asarray(ids))
    embeds = vv.splice_speech_features(
        embeds, jnp.asarray(speech_mask), feats, jnp.ones((1, 4), bool)
    )
    h, _ = qwen2.forward(cfg.decoder_config, params["lm"], embeds)
    return np.asarray(vv.lm_logits(params, h[:, -1:]).astype(jnp.float32)), ids, speech_mask, wav


def _ref_prefill_logits(ref_model, ids, speech_mask, wav):
    import torch

    with torch.no_grad():
        out = ref_model(
            input_ids=torch.from_numpy(ids),
            speech_tensors=torch.from_numpy(wav),
            speech_masks=torch.ones(1, 4, dtype=torch.bool),
            speech_input_mask=torch.from_numpy(speech_mask),
            logits_to_keep=1,
            return_dict=True,
            use_cache=False,
        )
    return out.logits.numpy()


def test_tied_sharded_safetensors_roundtrip(tmp_path):
    """Tied-1.5B layout: sharded f32 safetensors + index (no lm_head key),
    a REAL offline tokenizer in the dir, loaded via load_checkpoint with NO
    fallback permission — prefill logits must match the live reference."""
    from vibevoice_tpu.processor.text_tokenizer import VibeVoiceTextTokenizer
    from vibevoice_tpu.utils.hf_interop import load_checkpoint

    ref = _ref_model(tie=True)
    ckpt = tmp_path / "ckpt_tied"
    _write_hf_checkpoint(ckpt, ref, _tiny_cfg(tie=True))
    _write_real_tokenizer(ckpt)
    # decoy file NOT in the index: the index must govern what gets loaded
    from safetensors.torch import save_file
    import torch

    save_file({"garbage.weight": torch.full((4,), float("nan"))}, str(ckpt / "decoy.safetensors"))

    cfg, params, processor = load_checkpoint(str(ckpt), dtype="float32")
    assert isinstance(processor.tokenizer, VibeVoiceTextTokenizer)
    assert "lm_head" not in params  # tied: logits ride the embed table
    assert float(params["speech_scaling_factor"]) == 0.5

    logits, ids, sm, wav = _prefill_logits(cfg, params)
    np.testing.assert_allclose(logits, _ref_prefill_logits(ref, ids, sm, wav), rtol=1e-3, atol=2e-4)

    # int8 host-quantized load through the same sharded fixture
    _, params8, _ = load_checkpoint(str(ckpt), dtype="float32", int8=True)
    assert "lm_head_q" in params8
    h = vv.lm_logits(params8, jnp.ones((1, cfg.decoder_config.hidden_size)))
    assert np.isfinite(np.asarray(h)).all()


def test_untied_bf16_sharded_roundtrip(tmp_path):
    """Untied-7B layout: bf16 shards (exercises the safetensors-torch load
    fallback), lm_head.weight present and used for logits."""
    import torch

    from vibevoice_tpu.utils.hf_interop import load_checkpoint

    ref = _ref_model(tie=False)
    ckpt = tmp_path / "ckpt_untied"
    _write_hf_checkpoint(ckpt, ref, _tiny_cfg(tie=False), n_shards=2, dtype=torch.bfloat16)
    _write_real_tokenizer(ckpt)

    cfg, params, _ = load_checkpoint(str(ckpt), dtype="float32")
    assert "lm_head" in params
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]),
        ref.lm_head.weight.detach().float().to(torch.bfloat16).float().numpy(),
        rtol=0, atol=0,
    )
    logits, ids, sm, wav = _prefill_logits(cfg, params)
    # bf16-rounded weights vs the f32 reference: loose tolerance by design
    np.testing.assert_allclose(logits, _ref_prefill_logits(ref, ids, sm, wav), rtol=0.1, atol=0.05)


def test_weight_norm_tokenizer_checkpoint(tmp_path):
    """conv_norm='weight_norm' checkpoints store parametrized conv tensors
    under the real reference key names; conversion folds them exactly and the
    voice-clone prefill still matches the live reference."""
    from vibevoice_tpu.utils.hf_interop import load_checkpoint

    ref = _ref_model(tie=True, conv_norm="weight_norm")
    sd_keys = list(ref.state_dict())
    assert any("weight_g" in k or "parametrizations" in k for k in sd_keys), (
        "reference did not parametrize convs — fixture is not testing folding"
    )
    ckpt = tmp_path / "ckpt_wn"
    _write_hf_checkpoint(ckpt, ref, _tiny_cfg(tie=True, conv_norm="weight_norm"))
    _write_real_tokenizer(ckpt)

    cfg, params, _ = load_checkpoint(str(ckpt), dtype="float32")
    logits, ids, sm, wav = _prefill_logits(cfg, params)
    np.testing.assert_allclose(logits, _ref_prefill_logits(ref, ids, sm, wav), rtol=1e-3, atol=3e-4)


def test_streaming_checkpoint_sharded_roundtrip(tmp_path):
    """Streaming 0.5B family through the same sharded layout: split LM stacks,
    type embeddings, EOS classifier all land via load_streaming_checkpoint."""
    import torch
    from reference_shim import import_reference

    import_reference()
    from transformers.models.qwen2 import Qwen2Config
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceAcousticTokenizerConfig,
        VibeVoiceDiffusionHeadConfig,
    )
    from vibevoice.modular.configuration_vibevoice_streaming import VibeVoiceStreamingConfig
    from vibevoice.modular.modeling_vibevoice_streaming_inference import (
        VibeVoiceStreamingForConditionalGenerationInference,
    )

    from vibevoice_tpu.models import streaming as st
    from vibevoice_tpu.utils.hf_interop import load_streaming_checkpoint

    rcfg = VibeVoiceStreamingConfig(
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
    ref = VibeVoiceStreamingForConditionalGenerationInference(rcfg).eval()

    ours = C.VibeVoiceStreamingConfig(
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
    ckpt = tmp_path / "ckpt_streaming"
    _write_hf_checkpoint(ckpt, ref, ours, n_shards=2)
    _write_real_tokenizer(ckpt)

    cfg, params, _ = load_streaming_checkpoint(str(ckpt), dtype="float32")
    assert len(params["language_model"]["layers"]) == 2
    assert len(params["tts_language_model"]["layers"]) == 2

    ids = np.random.RandomState(0).randint(0, 128, (1, 9))
    with torch.no_grad():
        ref_h = ref.forward_lm(
            input_ids=torch.from_numpy(ids), use_cache=False, return_dict=True
        ).last_hidden_state.numpy()
    embeds = qwen2.embed_tokens(params["language_model"], jnp.asarray(ids))
    h, _ = qwen2.forward(st._lower_cfg(cfg), params["language_model"], embeds, skip_final_norm=True)
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-4, atol=1e-4)


def test_missing_tokenizer_raises_loudly(tmp_path):
    """A real checkpoint dir (weights + config) with NO tokenizer files must
    raise, not silently hash-tokenize (VERDICT r2 weak #2). The escape hatch
    is explicit opt-in."""
    from vibevoice_tpu.processor.processor import VibeVoiceProcessor
    from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer

    ref = _ref_model(tie=True)
    ckpt = tmp_path / "ckpt_notok"
    _write_hf_checkpoint(ckpt, ref, _tiny_cfg(tie=True))

    with pytest.raises(RuntimeError, match="no text tokenizer"):
        VibeVoiceProcessor.from_pretrained(str(ckpt))

    with pytest.warns(RuntimeWarning, match="FALLING BACK"):
        proc = VibeVoiceProcessor.from_pretrained(str(ckpt), allow_fallback_tokenizer=True)
    assert isinstance(proc.tokenizer, FallbackTextTokenizer)


def test_non_checkpoint_dir_stays_quiet(tmp_path):
    """A bare processor dir (no weights/config) keeps the old lenient
    behavior — fixtures and processor-only save/load flows don't need the
    escape hatch."""
    from vibevoice_tpu.processor.processor import VibeVoiceProcessor

    d = tmp_path / "proc_only"
    d.mkdir()
    with open(d / "preprocessor_config.json", "w") as f:
        json.dump({"speech_tok_compress_ratio": 8}, f)
    proc = VibeVoiceProcessor.from_pretrained(str(d))
    assert proc.speech_tok_compress_ratio == 8


def test_load_pretrained_routes_by_model_type(tmp_path):
    """VERDICT r3 item 7: ONE entry point loads any variant — HF-style or
    native dirs, multi-speaker or streaming — routed by config.json's
    model_type (reference Auto-class analog, configuration_vibevoice.py:14-165)."""
    from vibevoice_tpu.models import streaming as st
    from vibevoice_tpu.utils.hf_interop import (
        load_pretrained,
        read_model_type,
        save_native,
    )

    # HF-style multi-speaker fixture (config.json has NO model_type field ->
    # structural fallback must classify it as the full model)
    ref = _ref_model(tie=True)
    ckpt = tmp_path / "full_hf"
    _write_hf_checkpoint(ckpt, ref, _tiny_cfg(tie=True))
    _write_real_tokenizer(ckpt)
    assert read_model_type(str(ckpt)) == "vibevoice"
    loaded = load_pretrained(str(ckpt), dtype="float32")
    assert loaded.model_type == "vibevoice"
    cfg, params, proc = loaded  # unpacks like the legacy 3-tuple loaders
    assert "lm" in params and proc is not None

    # native round-trip: save_native writes model_type, load_pretrained
    # routes back through the native path
    nat = tmp_path / "full_native"
    save_native(str(nat), cfg, params)
    assert read_model_type(str(nat)) == "vibevoice"
    loaded2 = load_pretrained(str(nat), dtype="float32", allow_fallback_tokenizer=True)
    assert loaded2.model_type == "vibevoice"
    np.testing.assert_array_equal(
        np.asarray(loaded2.params["lm"]["layers"][0]["attn"]["q"]["w"]),
        np.asarray(params["lm"]["layers"][0]["attn"]["q"]["w"]),
    )

    # streaming native checkpoint routes to the streaming family
    scfg = C.VibeVoiceStreamingConfig(
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
    sparams = st.init(jax.random.PRNGKey(0), scfg)
    snat = tmp_path / "streaming_native"
    save_native(str(snat), scfg, sparams)
    assert read_model_type(str(snat)) == "vibevoice_streaming"
    sloaded = load_pretrained(str(snat), dtype="float32", allow_fallback_tokenizer=True)
    assert sloaded.model_type == "vibevoice_streaming"
    assert len(sloaded.params["tts_language_model"]["layers"]) == 2
    from vibevoice_tpu.processor.streaming_processor import VibeVoiceStreamingProcessor

    assert isinstance(sloaded.processor, VibeVoiceStreamingProcessor)
