"""END-TO-END fidelity for the streaming 0.5B family: the reference's
windowed generate() (modeling_vibevoice_streaming_inference.py:412-725) vs
ours, with identical weights, identical prefilled voice caches, and a shared
per-frame diffusion-noise bank (replayed through torch.randn on the
reference side, via generate(noise_bank=...) on ours).

Checks: per-frame waveform equality, EOS stopping frame, and the window
interleave (5-text/6-speech) including frames a window keeps computing
after EOS (which consume noise rows on both sides)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import reference_available

from vibevoice_tpu import configs as C
from vibevoice_tpu.models import inference as inf
from vibevoice_tpu.models import streaming as st
from vibevoice_tpu.utils.hf_interop import convert_streaming_model

# fast gate (-m "not slow") skips this module: live-torch-reference streaming parity (~20 s serial)
pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference checkout absent"),
    pytest.mark.slow,
]

VAE_DIM = 8
HOP = 8
STEPS = 4
NEG_ID = 3  # stands in for <|image_pad|>
MAX_FRAMES = 96

TINY = C.VibeVoiceStreamingConfig(
    acoustic_tokenizer_config=C.AcousticTokenizerConfig(
        vae_dim=VAE_DIM, encoder_n_filters=4, encoder_ratios=(4, 2), encoder_depths=(1, 1, 1),
        decoder_n_filters=4,
    ),
    decoder_config=C.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
        rope_theta=10_000.0,
    ),
    diffusion_head_config=C.DiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=VAE_DIM),
    tts_backbone_num_hidden_layers=2,
)


class _FakeTokenizer:
    bos_token_id = None
    eos_token_id = 2
    pad_token_id = 0
    speech_start_id = 5
    speech_end_id = 6
    speech_diffusion_id = 7

    def convert_tokens_to_ids(self, tok):
        assert tok == "<|image_pad|>"
        return NEG_ID


@pytest.fixture(scope="module")
def ref_model():
    import torch
    from reference_shim import import_reference

    import_reference()
    from transformers.models.qwen2 import Qwen2Config
    from transformers.generation.utils import GenerationMixin
    from transformers.cache_utils import DynamicCache
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
            vae_dim=VAE_DIM, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
            decoder_n_filters=4,
        ),
        decoder_config=Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
            rope_theta=10_000.0, attn_implementation="eager",
        ),
        diffusion_head_config=VibeVoiceDiffusionHeadConfig(
            hidden_size=32, head_layers=2, latent_size=VAE_DIM,
        ),
        tts_backbone_num_hidden_layers=2,
    )
    dc = cfg.decoder_config
    for attr in (
        "num_hidden_layers",
        "num_attention_heads",
        "num_key_value_heads",
        "hidden_size",
        "max_position_embeddings",
    ):
        setattr(cfg, attr, getattr(dc, attr))

    torch.manual_seed(0)
    model = VibeVoiceStreamingForConditionalGenerationInference(cfg).eval()
    with torch.no_grad():
        gen = torch.Generator().manual_seed(77)
        for p in model.parameters():
            p.normal_(0, 0.05, generator=gen)
        model.model.speech_scaling_factor.fill_(0.8)
        model.model.speech_bias_factor.fill_(0.1)
    model.set_ddpm_inference_steps(STEPS)

    # transformers 4.51 -> 4.57 drift shims (see test_e2e_fidelity.py)
    def _cache_shim(gc, mk, assistant, batch_size, max_cache_length, device=None):
        return GenerationMixin._prepare_cache_for_generation(
            model, gc, mk, None, batch_size, max_cache_length
        )

    model._prepare_cache_for_generation = _cache_shim
    if not hasattr(DynamicCache, "key_cache"):
        DynamicCache.key_cache = property(lambda self: [l.keys for l in self.layers])
        DynamicCache.value_cache = property(lambda self: [l.values for l in self.layers])
    return model


@pytest.fixture(scope="module")
def params(ref_model):
    return convert_streaming_model(ref_model.state_dict(), TINY)


@pytest.fixture(scope="module")
def ref_prefill(ref_model):
    """Build the four prefilled streams exactly as a reference `.pt` voice
    preset holds them (reference :471-538, streaming CLI :288-319)."""
    import torch

    rng = np.random.RandomState(7)
    prompt = torch.from_numpy(rng.randint(8, 120, (1, 6)))
    neg = torch.full((1, 1), NEG_ID, dtype=torch.long)

    def prefill(ids):
        with torch.no_grad():
            lm = ref_model.forward_lm(input_ids=ids, use_cache=True, return_dict=True)
            tts = ref_model.forward_tts_lm(
                input_ids=ids,
                lm_last_hidden_state=lm.last_hidden_state,
                tts_text_masks=torch.ones_like(ids[:, -1:]),
                use_cache=True,
                return_dict=True,
            )
        return lm, tts

    lm, tts = prefill(prompt)
    neg_lm, neg_tts = prefill(neg)
    return {"lm": lm, "tts_lm": tts, "neg_lm": neg_lm, "neg_tts_lm": neg_tts}, prompt


def _preset_from_ref(ref_prefill) -> st.VoicePreset:
    """Convert the reference's prefilled outputs into our VoicePreset."""
    outs, _ = ref_prefill

    def kv(out):
        # DynamicCache lazily sizes its layer list; unused slots stay None
        layers = [l for l in out.past_key_values.layers if l.keys is not None]
        k = np.stack([l.keys.numpy() for l in layers]).astype(np.float32)
        v = np.stack([l.values.numpy() for l in layers]).astype(np.float32)
        length = np.asarray([k.shape[3]], np.int32)
        return (k, v, length)

    h = lambda out: out.last_hidden_state[:, -1].numpy().astype(np.float32)
    return st.VoicePreset(
        lm_kv=kv(outs["lm"]),
        tts_kv=kv(outs["tts_lm"]),
        neg_tts_kv=kv(outs["neg_tts_lm"]),
        lm_h=h(outs["lm"]),
        tts_h=h(outs["tts_lm"]),
        neg_tts_h=h(outs["neg_tts_lm"]),
    )


class _RandnPatch:
    """Replays the per-frame noise bank through torch.randn — the init draw in
    sample_speech_tokens (:727-751) and, under sde-dpmsolver++, the per-step
    variance noise (randn_tensor -> torch.randn via the shim). Draw order per
    frame: init, then sde_0..sde_{S-1}; every draw is (2, D) with only row 0
    consumed (the CFG duplicate's trajectory is discarded)."""

    def __init__(self, torch, bank, steps: int = 0):
        self.torch = torch
        self.fifo = []
        for e in range(bank["init"].shape[0]):
            self.fifo.append(np.repeat(bank["init"][e], 2, axis=0))
            if "sde" in bank:
                for s in range(steps):
                    self.fifo.append(np.repeat(bank["sde"][e, s], 2, axis=0))
        self.real = torch.randn

    def __enter__(self):
        def randn(*size, **kw):
            if len(size) == 1 and not isinstance(size[0], int):
                size = tuple(size[0])
            assert size == (2, VAE_DIM), f"unexpected torch.randn shape {size}"
            t = self.torch.from_numpy(np.ascontiguousarray(self.fifo.pop(0)))
            dtype = kw.get("dtype")
            return t.to(dtype=dtype) if dtype is not None else t

        self.torch.randn = randn
        return self

    def __exit__(self, *exc):
        self.torch.randn = self.real


def test_streaming_e2e_matches_reference(ref_model, params, ref_prefill):
    import torch
    import copy

    outs, prompt = ref_prefill
    rng = np.random.RandomState(11)
    text = rng.randint(8, 120, (1, 8))  # 2 text windows (5 + 3)
    bank = {"init": rng.randn(MAX_FRAMES, 1, VAE_DIM).astype(np.float32)}

    p = prompt.shape[1]
    ids = torch.zeros(1, p, dtype=torch.long)  # pseudo pad ids (processor :233-240)
    with _RandnPatch(torch, bank), torch.no_grad():
        ref_out = ref_model.generate(
            input_ids=ids,
            attention_mask=torch.ones_like(ids),
            tts_lm_input_ids=ids.clone(),
            tts_lm_attention_mask=torch.ones_like(ids),
            tts_text_ids=torch.from_numpy(text),
            all_prefilled_outputs=copy.deepcopy(outs),
            tokenizer=_FakeTokenizer(),
            cfg_scale=1.5,
            show_progress_bar=False,
        )
    ref_wav = ref_out.speech_outputs[0]
    ref_wav = None if ref_wav is None else ref_wav.numpy().reshape(-1)

    preset = _preset_from_ref(ref_prefill)
    our_out = st.generate(
        TINY,
        params,
        tts_text_ids=text,
        preset=preset,
        opts=inf.GenerateOptions(cfg_scale=1.5, ddpm_steps=STEPS),
        max_len=512,
        noise_bank=bank,
    )
    our_wav = our_out.speech_outputs[0]

    # the first speech window always emits at least one frame, so audio exists
    assert ref_wav is not None and our_wav is not None
    assert ref_wav.shape == our_wav.shape, (ref_wav.shape, our_wav.shape)
    assert len(ref_wav) % HOP == 0 and len(ref_wav) > 0
    np.testing.assert_allclose(our_wav, ref_wav, rtol=5e-3, atol=5e-4)


def test_streaming_e2e_sde_matches_reference(ref_model, params, ref_prefill):
    """SDE variant (VERDICT r2 weak #5): the Gradio runtime mode re-instantiates
    the scheduler as sde-dpmsolver++ (reference demo/gradio_demo.py:142-147);
    the streaming windowed generate must match frame-for-frame under it, with
    both the init latents AND the per-step SDE variance noise shared."""
    import copy

    import torch
    from vibevoice.schedule.dpm_solver import DPMSolverMultistepScheduler

    outs, prompt = ref_prefill
    rng = np.random.RandomState(23)
    text = rng.randint(8, 120, (1, 8))
    bank = {
        "init": rng.randn(MAX_FRAMES, 1, VAE_DIM).astype(np.float32),
        "sde": rng.randn(MAX_FRAMES, STEPS, 1, VAE_DIM).astype(np.float32),
    }

    hc = ref_model.config.diffusion_head_config
    orig_scheduler = ref_model.model.noise_scheduler
    ref_model.model.noise_scheduler = DPMSolverMultistepScheduler(
        num_train_timesteps=hc.ddpm_num_steps,
        beta_schedule=hc.ddpm_beta_schedule,
        prediction_type=hc.prediction_type,
        algorithm_type="sde-dpmsolver++",
    )
    try:
        p = prompt.shape[1]
        ids = torch.zeros(1, p, dtype=torch.long)
        with _RandnPatch(torch, bank, steps=STEPS), torch.no_grad():
            ref_out = ref_model.generate(
                input_ids=ids,
                attention_mask=torch.ones_like(ids),
                tts_lm_input_ids=ids.clone(),
                tts_lm_attention_mask=torch.ones_like(ids),
                tts_text_ids=torch.from_numpy(text),
                all_prefilled_outputs=copy.deepcopy(outs),
                tokenizer=_FakeTokenizer(),
                cfg_scale=1.5,
                show_progress_bar=False,
            )
    finally:
        ref_model.model.noise_scheduler = orig_scheduler
    ref_wav = ref_out.speech_outputs[0]
    ref_wav = None if ref_wav is None else ref_wav.numpy().reshape(-1)

    preset = _preset_from_ref(ref_prefill)
    our_out = st.generate(
        TINY,
        params,
        tts_text_ids=text,
        preset=preset,
        opts=inf.GenerateOptions(cfg_scale=1.5, ddpm_steps=STEPS, sde=True),
        max_len=512,
        noise_bank=bank,
    )
    our_wav = our_out.speech_outputs[0]

    assert ref_wav is not None and our_wav is not None
    assert ref_wav.shape == our_wav.shape, (ref_wav.shape, our_wav.shape)
    np.testing.assert_allclose(our_wav, ref_wav, rtol=5e-3, atol=5e-4)


def test_preset_roundtrip_matches_ref_state(ref_model, params, ref_prefill):
    """Our build_voice_preset prefill from the same prompt ids reproduces the
    reference's prefilled caches/hiddens (the `.pt`-builder parity check)."""
    outs, prompt = ref_prefill
    ours = st.build_voice_preset(
        TINY, params, prompt.numpy(), neg_prompt_id=NEG_ID, max_len=64
    )
    ref = _preset_from_ref(ref_prefill)
    np.testing.assert_allclose(ours.tts_h, ref.tts_h, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours.neg_tts_h, ref.neg_tts_h, rtol=2e-4, atol=2e-4)
    for a, b in zip(ours.tts_kv[:2], ref.tts_kv[:2]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ours.tts_kv[2], ref.tts_kv[2])
