"""END-TO-END waveform fidelity vs the PyTorch reference (BASELINE.md:
"waveform fidelity within tolerance of the PyTorch reference on identical
seeds").

The reference's generate() draws noise at three sites:
  1. sigma-VAE voice-clone sampling (modular_vibevoice_tokenizer.py:977-989)
  2. per-diffusion-event initial latent (modeling_vibevoice_inference.py:701)
  3. per-solver-step SDE variance noise (dpm_solver.py:956-960)
torch and JAX RNGs cannot be synchronised, so both sides replay one shared
numpy noise bank: the reference via a torch.randn monkeypatch (a FIFO in the
reference's draw order), ours via generate(noise_bank=...) which indexes the
bank with a carried per-sample diffusion-event counter.

Covers: natural argmax trajectories, a forced-token script crossing
speech_end -> speech_start segment boundaries (negative-stream commit/reset
timing, conv-cache set_to_zero), and the SDE solver branch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import reference_available

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import inference as inf
from vibevoice_tpu.utils.hf_interop import convert_full_model

# fast gate (-m "not slow") skips this module: live-torch-reference generate parity (~30 s serial)
pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference checkout absent"),
    pytest.mark.slow,
]

TOKENS = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2, bos=None)
HOP = 8  # ratios (4, 2)
VAE_DIM = 8
STEPS = 4  # ddpm inference steps
MAX_EVENTS = 32

OUR_CFG = tiny_config(
    hidden_size=32,
    num_hidden_layers=2,
    vocab_size=256,
    n_filters=4,
    ratios=(4, 2),
    depths=(1, 1, 1),
    vae_dim=VAE_DIM,
    semantic_vae_dim=VAE_DIM,
)


class _FakeTokenizer:
    """The attribute surface generate() reads from its tokenizer argument
    (reference modeling_vibevoice_inference.py:256-280, :383)."""

    bos_token_id = None
    eos_token_id = TOKENS.eos
    pad_token_id = 0
    speech_start_id = TOKENS.speech_start
    speech_end_id = TOKENS.speech_end
    speech_diffusion_id = TOKENS.speech_diffusion


@pytest.fixture(scope="module")
def ref_model():
    import torch
    from reference_shim import import_reference

    import_reference()
    from transformers.models.qwen2 import Qwen2Config
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceAcousticTokenizerConfig,
        VibeVoiceSemanticTokenizerConfig,
        VibeVoiceDiffusionHeadConfig,
        VibeVoiceConfig,
    )
    from vibevoice.modular.modeling_vibevoice_inference import (
        VibeVoiceForConditionalGenerationInference,
    )

    cfg = VibeVoiceConfig(
        acoustic_tokenizer_config=VibeVoiceAcousticTokenizerConfig(
            vae_dim=VAE_DIM, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
            decoder_n_filters=4,
        ),
        semantic_tokenizer_config=VibeVoiceSemanticTokenizerConfig(
            vae_dim=VAE_DIM, encoder_n_filters=4, encoder_ratios=[4, 2], encoder_depths="1-1-1",
        ),
        decoder_config=Qwen2Config(
            vocab_size=256, hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=2048,
            rope_theta=10_000.0, tie_word_embeddings=True, attn_implementation="eager",
        ),
        diffusion_head_config=VibeVoiceDiffusionHeadConfig(
            hidden_size=32, head_layers=2, latent_size=VAE_DIM,
        ),
    )
    # transformers 4.57's cache setup reads LM geometry off the top-level
    # config; the reference (pinned 4.51) relied on decoder_config lookups
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
    model = VibeVoiceForConditionalGenerationInference(cfg).eval()
    with torch.no_grad():
        gen = torch.Generator().manual_seed(1234)
        for p in model.parameters():
            p.normal_(0, 0.05, generator=gen)
        model.model.speech_scaling_factor.fill_(0.8)
        model.model.speech_bias_factor.fill_(0.1)
    model.set_ddpm_inference_steps(STEPS)

    # the reference pins transformers==4.51.3 (reference pyproject.toml:22);
    # the installed 4.57 dropped _prepare_cache_for_generation's device arg
    from transformers.generation.utils import GenerationMixin

    def _cache_shim(gc, mk, assistant, batch_size, max_cache_length, device=None):
        return GenerationMixin._prepare_cache_for_generation(
            model, gc, mk, None, batch_size, max_cache_length
        )

    model._prepare_cache_for_generation = _cache_shim

    # 4.57 renamed DynamicCache.key_cache/value_cache to .layers[i].keys/values;
    # the reference's negative-stream KV surgery mutates them in place
    from transformers.cache_utils import DynamicCache

    if not hasattr(DynamicCache, "key_cache"):
        DynamicCache.key_cache = property(lambda self: [l.keys for l in self.layers])
        DynamicCache.value_cache = property(lambda self: [l.values for l in self.layers])
    return model


@pytest.fixture(scope="module")
def params(ref_model):
    return convert_full_model(ref_model.state_dict(), OUR_CFG)


def _make_bank(seed: int, n_clips: int, n_frames: int, sde: bool, b: int = 1):
    rng = np.random.RandomState(seed)
    bank = {
        "vae_std": rng.randn(n_clips).astype(np.float32),
        "vae_eps": rng.randn(n_clips, n_frames, VAE_DIM).astype(np.float32),
        "init": rng.randn(MAX_EVENTS, b, VAE_DIM).astype(np.float32),
    }
    if sde:
        bank["sde"] = rng.randn(MAX_EVENTS, STEPS, b, VAE_DIM).astype(np.float32)
    return bank


def _build_fifo_scripted(bank, scripts, sde: bool):
    """Precompute the reference's torch.randn draw sequence for a FORCED
    multi-sample script: at each step the diffusing subset D_k (unfinished
    samples whose forced token is <speech_diffusion>) draws one
    (2*|D_k|, VAE_DIM) init latent (sample_speech_tokens duplicates the batch
    for CFG; only the first half is consumed), rows in ascending sample order
    = the reference's diffusion_indices order."""
    scripts = np.asarray(scripts)
    n_steps, b = scripts.shape
    events = np.zeros(b, int)
    finished = np.zeros(b, bool)
    fifo = []
    for k in range(n_steps):
        dif = [s for s in range(b) if not finished[s] and scripts[k, s] == TOKENS.speech_diffusion]
        if dif:
            rows = np.stack([bank["init"][events[s], s] for s in dif])
            fifo.append(np.concatenate([rows, rows], axis=0))
            if sde:
                for st in range(STEPS):
                    rows_s = np.stack([bank["sde"][events[s], st, s] for s in dif])
                    fifo.append(np.concatenate([rows_s, rows_s], axis=0))
            for s in dif:
                events[s] += 1
        finished |= scripts[k] == TOKENS.eos
    return fifo


class _RandnPatch:
    """Replays the noise bank through torch.randn/randn_like in the
    reference's draw order (see module docstring)."""

    def __init__(self, torch, bank, sde: bool, fifo=None):
        self.torch = torch
        self.bank = bank
        self.sde = sde
        self.real_randn = torch.randn
        self.real_randn_like = torch.randn_like
        if fifo is not None:
            # scripted multi-sample draw sequence (see _build_fifo_scripted)
            self.fifo = list(fifo)
        else:
            # B=1 natural trajectory: (2, D) draws in event order
            # [init_0, sde_0_0..sde_0_{S-1}, init_1, ...]
            self.fifo = []
            for e in range(MAX_EVENTS):
                self.fifo.append(np.repeat(bank["init"][e], 2, axis=0))
                if sde:
                    for s in range(STEPS):
                        self.fifo.append(np.repeat(bank["sde"][e, s], 2, axis=0))
        self.vae_std_used = False
        self.vae_eps_used = False

    def randn(self, *size, **kw):
        if len(size) == 1 and not isinstance(size[0], int):
            size = tuple(size[0])
        if self.fifo and size == self.fifo[0].shape:
            out = self.fifo.pop(0)
        elif size == (self.bank["vae_std"].shape[0],):
            assert not self.vae_std_used, "unexpected second vae std draw"
            self.vae_std_used = True
            out = self.bank["vae_std"]
        else:
            raise AssertionError(f"unexpected torch.randn shape {size}")
        t = self.torch.from_numpy(np.ascontiguousarray(out))
        dtype = kw.get("dtype")
        return t.to(dtype=dtype) if dtype is not None else t

    def randn_like(self, x, **kw):
        if tuple(x.shape) == tuple(self.bank["vae_eps"].shape):
            assert not self.vae_eps_used, "unexpected second vae eps draw"
            self.vae_eps_used = True
            return self.torch.from_numpy(self.bank["vae_eps"]).to(dtype=x.dtype)
        raise AssertionError(f"unexpected torch.randn_like shape {tuple(x.shape)}")

    def __enter__(self):
        self.torch.randn = self.randn
        self.torch.randn_like = self.randn_like
        return self

    def __exit__(self, *exc):
        self.torch.randn = self.real_randn
        self.torch.randn_like = self.real_randn_like


def _prompt(rng):
    """1-sample prompt with a 3-frame voice clip spliced at positions 2-4."""
    n_frames = 3
    t_wav = n_frames * HOP
    ids = np.array([[10, 11, 7, 7, 7, 12, TOKENS.speech_start]], np.int64)
    mask = np.zeros_like(ids, bool)
    mask[0, 2:5] = True
    wav = (rng.randn(1, t_wav) * 0.3).astype(np.float32)
    return ids, mask, wav, n_frames


def _run_reference(ref_model, ids, mask, wav, bank, sde, script=None, refresh_negative=True):
    import torch
    from vibevoice.modular import modeling_vibevoice_inference as mvi

    orig_scheduler = ref_model.model.noise_scheduler
    if sde:
        from vibevoice.schedule.dpm_solver import DPMSolverMultistepScheduler

        hc = ref_model.config.diffusion_head_config
        ref_model.model.noise_scheduler = DPMSolverMultistepScheduler(
            num_train_timesteps=hc.ddpm_num_steps,
            beta_schedule=hc.ddpm_beta_schedule,
            prediction_type=hc.prediction_type,
            algorithm_type="sde-dpmsolver++",
        )

    orig_cls = mvi.VibeVoiceTokenConstraintProcessor
    if script is not None:
        t0 = ids.shape[1]
        # (T,) single-sample or (T, B) per-sample forced-token script
        sc = np.asarray(script)
        if sc.ndim == 1:
            sc = sc[:, None]

        class _Scripted(orig_cls):
            def __call__(self, input_ids, scores):
                scores = super().__call__(input_ids, scores)
                step = input_ids.shape[1] - t0
                if step < sc.shape[0]:
                    for s in range(scores.shape[0]):
                        tok_id = int(sc[step, s % sc.shape[1]])
                        if tok_id >= 0:
                            scores[s, tok_id] += 1e9
                return scores

        mvi.VibeVoiceTokenConstraintProcessor = _Scripted
    b = ids.shape[0]
    n_frames = int(mask[0].sum())
    fifo = None
    if script is not None and b > 1:
        fifo = _build_fifo_scripted(bank, np.asarray(script), sde)
    try:
        with _RandnPatch(torch, bank, sde, fifo=fifo), torch.no_grad():
            out = ref_model.generate(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.ones_like(torch.from_numpy(ids)),
                speech_tensors=torch.from_numpy(wav),
                speech_masks=torch.ones(b, n_frames, dtype=torch.bool),
                speech_input_mask=torch.from_numpy(mask),
                tokenizer=_FakeTokenizer(),
                cfg_scale=1.3,
                show_progress_bar=False,
                refresh_negative=refresh_negative,
            )
    finally:
        if sde:
            # the swap is scoped to this run (the module fixture is shared)
            ref_model.model.noise_scheduler = orig_scheduler
            ref_model.set_ddpm_inference_steps(STEPS)
        mvi.VibeVoiceTokenConstraintProcessor = orig_cls
    seq = out.sequences.numpy()
    wavs = [None if w is None else w.numpy().reshape(-1) for w in out.speech_outputs]
    return seq, (wavs if b > 1 else wavs[0])


def _run_ours(params, ids, mask, wav, bank, sde, script=None, refresh_negative=True):
    opts = inf.GenerateOptions(
        cfg_scale=1.3, ddpm_steps=STEPS, sde=sde, refresh_negative=refresh_negative
    )
    b = ids.shape[0]
    n_frames = int(mask[0].sum())
    forced = None
    if script is not None:
        forced = np.asarray(script, np.int32)
        if forced.ndim == 1:
            forced = forced[:, None]  # (T, B=1)
    out = inf.generate(
        OUR_CFG,
        params,
        input_ids=ids,
        speech_tensors=wav,
        speech_frame_valid=np.ones((b, n_frames), bool),
        speech_input_mask=mask,
        tokens=TOKENS,
        opts=opts,
        noise_bank=bank,
        forced_tokens=forced,
    )
    wavs = out.speech_outputs
    return out.sequences, (list(wavs) if b > 1 else wavs[0])


def _assert_match(ref_seq, ref_wav, our_seq, our_wav):
    # token-for-token equality over the full generated trajectory
    n = min(ref_seq.shape[1], our_seq.shape[1])
    np.testing.assert_array_equal(our_seq[:, :n], ref_seq[:, :n])
    assert ref_seq.shape == our_seq.shape
    ref_list = ref_wav if isinstance(ref_wav, list) else [ref_wav]
    our_list = our_wav if isinstance(our_wav, list) else [our_wav]
    assert len(ref_list) == len(our_list)
    for rw, ow in zip(ref_list, our_list):
        if rw is None:
            assert ow is None
            continue
        assert ow is not None
        ow = np.asarray(ow).reshape(-1)
        assert rw.shape == ow.shape
        np.testing.assert_allclose(ow, rw, rtol=5e-3, atol=5e-4)


def test_e2e_forced_script_ode(ref_model, params):
    """Full-pipeline fidelity across speech_end -> speech_start boundaries:
    3 frames, segment reset, 2 more frames, reset, 1 frame, eos."""
    rng = np.random.RandomState(100)
    ids, mask, wav, n_frames = _prompt(rng)
    bank = _make_bank(0, 1, n_frames, sde=False)
    script = [7, 7, 7, 6, 5, 7, 7, 6, 5, 7, 2]
    ref_seq, ref_wav = _run_reference(ref_model, ids, mask, wav, bank, sde=False, script=script)
    our_seq, our_wav = _run_ours(params, ids, mask, wav, bank, sde=False, script=script)
    assert ref_wav is not None and len(ref_wav) == 6 * HOP
    _assert_match(ref_seq, ref_wav, our_seq, our_wav)


def test_e2e_forced_script_sde(ref_model, params):
    """Same boundary-crossing script through the SDE solver branch (the
    reference Gradio default, gradio_demo.py:142-147)."""
    rng = np.random.RandomState(101)
    ids, mask, wav, n_frames = _prompt(rng)
    bank = _make_bank(1, 1, n_frames, sde=True)
    script = [7, 7, 6, 5, 7, 7, 7, 2]
    ref_seq, ref_wav = _run_reference(ref_model, ids, mask, wav, bank, sde=True, script=script)
    our_seq, our_wav = _run_ours(params, ids, mask, wav, bank, sde=True, script=script)
    assert ref_wav is not None and len(ref_wav) == 5 * HOP
    _assert_match(ref_seq, ref_wav, our_seq, our_wav)


def test_e2e_forced_script_batched_mixed(ref_model, params):
    """B=2 with DIVERGENT per-sample scripts — the only way to reach the
    reference's non-diffusion negative-KV correction path
    (modeling_vibevoice_inference.py:590-624, `correct_cnt` shift-delete):
    it runs exactly when a step mixes diffusing and non-diffusing samples.
    The schedule below covers: mixed end/start vs diffusion on the same step
    (corrections for either sample), a speech_start reset racing another
    sample's diffusion, one sample finishing early (finished samples are
    exempt from correction), and a step where nothing diffuses (no negative
    forward at all — our speculative write must not commit)."""
    rng = np.random.RandomState(104)
    n_frames = 3
    t_wav = n_frames * HOP
    ids = np.tile(np.array([[10, 11, 7, 7, 7, 12, TOKENS.speech_start]], np.int64), (2, 1))
    mask = np.zeros_like(ids, bool)
    mask[:, 2:5] = True
    wav = (rng.randn(2, t_wav) * 0.3).astype(np.float32)
    bank = _make_bank(4, 2, n_frames, sde=False, b=2)
    #        step:  0  1  2  3  4  5  6  7  8
    script = np.array(
        [
            [7, 7, 7, 6, 5, 7, 7, 6, 2],  # sample 0
            [7, 6, 5, 7, 7, 7, 2, 2, 2],  # sample 1 (finishes early)
        ],
        np.int64,
    ).T  # (T, B)
    ref_seq, ref_wavs = _run_reference(ref_model, ids, mask, wav, bank, sde=False, script=script)
    our_seq, our_wavs = _run_ours(params, ids, mask, wav, bank, sde=False, script=script)
    assert ref_wavs[0] is not None and len(ref_wavs[0]) == 5 * HOP
    assert ref_wavs[1] is not None and len(ref_wavs[1]) == 4 * HOP
    _assert_match(ref_seq, ref_wavs, our_seq, our_wavs)


def test_e2e_forced_script_no_refresh_negative(ref_model, params):
    """refresh_negative=False mode (reference :503-517): the negative stream
    advances unconditionally every step — no KV surgery, no speech_start
    reset — consuming the same next-step embeds as the positive stream. The
    boundary-crossing script exercises the mode where the two paths differ
    most (the True-mode reset at <speech_start> must NOT fire here)."""
    rng = np.random.RandomState(103)
    ids, mask, wav, n_frames = _prompt(rng)
    bank = _make_bank(3, 1, n_frames, sde=False)
    script = [7, 7, 7, 6, 5, 7, 7, 6, 5, 7, 2]
    ref_seq, ref_wav = _run_reference(
        ref_model, ids, mask, wav, bank, sde=False, script=script, refresh_negative=False
    )
    our_seq, our_wav = _run_ours(
        params, ids, mask, wav, bank, sde=False, script=script, refresh_negative=False
    )
    assert ref_wav is not None and len(ref_wav) == 6 * HOP
    _assert_match(ref_seq, ref_wav, our_seq, our_wav)


def test_e2e_natural_argmax(ref_model, params):
    """No forcing: the model's own constrained argmax trajectory must match
    token-for-token (logits parity through the fused LM/lm_head path)."""
    rng = np.random.RandomState(102)
    ids, mask, wav, n_frames = _prompt(rng)
    bank = _make_bank(2, 1, n_frames, sde=False)
    ref_seq, ref_wav = _run_reference(ref_model, ids, mask, wav, bank, sde=False)
    our_seq, our_wav = _run_ours(params, ids, mask, wav, bank, sde=False)
    _assert_match(ref_seq, ref_wav, our_seq, our_wav)
