"""End-to-end generate() on a tiny random-weight model (SURVEY.md §4 item 3):
token-constraint invariants, audio-length invariants, termination."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import inference as inf
from vibevoice_tpu.models import vibevoice as vv

CFG = tiny_config()
HOP = 8  # ratios (4, 2)
TOKENS = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2, bos=None)


@pytest.fixture(scope="module")
def params():
    return vv.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def step_fn():
    return inf.make_step_fn(CFG, TOKENS, inf.GenerateOptions(ddpm_steps=3, max_length=128))


def test_generate_invariants(params, step_fn):
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 100, (2, 12)).astype(np.int64)
    ids[:, -1] = TOKENS.speech_start
    valid = np.ones((2, 12), bool)
    valid[1, 9:] = False
    ids[1, 9:] = 0
    ids[1, 8] = TOKENS.speech_start

    out = inf.generate(
        CFG,
        params,
        input_ids=ids,
        valid_mask=valid,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=3, max_length=128),
        step_fn=step_fn,
    )
    assert out.sequences.shape[0] == 2
    gen = out.sequences[:, 12:]
    # 1. all generated tokens are in the constrained set
    assert set(np.unique(gen)).issubset(set(TOKENS.candidates))
    # 2. audio length == hop * (#diffusion tokens before finishing)
    for b in range(2):
        toks = gen[b]
        eos_pos = np.nonzero(toks == TOKENS.eos)[0]
        end = eos_pos[0] if len(eos_pos) else len(toks)
        n_diff = int((toks[:end] == TOKENS.speech_diffusion).sum())
        audio = out.speech_outputs[b]
        n_audio = 0 if audio is None else len(audio)
        assert n_audio == n_diff * HOP, (b, n_audio, n_diff)
    # 3. max_length_times cap respected: sample 1 has 9 valid tokens -> <= 18 steps
    assert gen.shape[1] <= int(2.0 * 12)


def test_generate_deterministic(params, step_fn):
    ids = np.full((1, 8), 20, np.int64)
    ids[:, -1] = TOKENS.speech_start
    kw = dict(
        input_ids=ids,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=3, max_length=64),
        seed=7,
        step_fn=step_fn,
    )
    a = inf.generate(CFG, params, **kw)
    b = inf.generate(CFG, params, **kw)
    np.testing.assert_array_equal(a.sequences, b.sequences)
    for x, y in zip(a.speech_outputs, b.speech_outputs):
        if x is None:
            assert y is None
        else:
            np.testing.assert_array_equal(x, y)


def test_generate_with_voice_prompt(params, step_fn):
    """Voice-clone prefill path: speech features spliced at masked positions."""
    rng = np.random.RandomState(1)
    t_wav = 4 * HOP
    n_frames = 4
    ids = rng.randint(10, 100, (1, 10)).astype(np.int64)
    ids[0, 2:6] = TOKENS.speech_diffusion  # voice-prompt placeholder positions
    ids[0, -1] = TOKENS.speech_start
    mask = np.zeros((1, 10), bool)
    mask[0, 2:6] = True

    out = inf.generate(
        CFG,
        params,
        input_ids=ids,
        speech_tensors=rng.randn(1, t_wav).astype(np.float32),
        speech_frame_valid=np.ones((1, n_frames), bool),
        speech_input_mask=mask,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=3, max_length=64),
        step_fn=step_fn,
    )
    assert out.sequences.shape[1] > 10
    assert set(np.unique(out.sequences[:, 10:])).issubset(set(TOKENS.candidates))


def test_splice_speech_features_ordering():
    """splice places feature rows at masked positions in row-major order."""
    b, t, h = 2, 5, 4
    embeds = jnp.zeros((b, t, h))
    mask = jnp.array([[False, True, True, False, False], [True, False, False, True, False]])
    feats = jnp.arange(4 * 3 * h, dtype=jnp.float32).reshape(2, 6, h)[:, :3]
    feats = jnp.stack([jnp.full((3, h), i + 1.0) * jnp.arange(1, 4)[:, None] for i in range(2)])
    valid = jnp.array([[True, True, False], [True, True, False]])
    out = vv.splice_speech_features(embeds, mask, feats, valid)
    # flat order of valid feats: s0f0, s0f1, s1f0, s1f1
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(feats[0, 0]))
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(feats[0, 1]))
    np.testing.assert_allclose(np.asarray(out[1, 0]), np.asarray(feats[1, 0]))
    np.testing.assert_allclose(np.asarray(out[1, 3]), np.asarray(feats[1, 1]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)


def test_generate_multi_frame_dispatch(params):
    """frames_per_dispatch>1 (device-resident scan) keeps all invariants."""
    ids = np.full((2, 10), 30, np.int64)
    ids[:, -1] = TOKENS.speech_start
    opts = inf.GenerateOptions(ddpm_steps=3, max_length=128, frames_per_dispatch=4)
    out = inf.generate(CFG, params, input_ids=ids, tokens=TOKENS, opts=opts, seed=11)
    gen = out.sequences[:, 10:]
    assert set(np.unique(gen)).issubset(set(TOKENS.candidates))
    for b in range(2):
        toks = gen[b]
        eos_pos = np.nonzero(toks == TOKENS.eos)[0]
        end = eos_pos[0] if len(eos_pos) else len(toks)
        n_diff = int((toks[:end] == TOKENS.speech_diffusion).sum())
        audio = out.speech_outputs[b]
        n_audio = 0 if audio is None else len(audio)
        assert n_audio == n_diff * HOP

    # deterministic across runs
    out2 = inf.generate(CFG, params, input_ids=ids, tokens=TOKENS, opts=opts, seed=11)
    np.testing.assert_array_equal(out.sequences, out2.sequences)


def test_chunked_prefill_matches_single_shot(params):
    """Chunked prefill (long-prompt path) produces the same carry state as
    the one-shot prefill."""
    rng = np.random.RandomState(5)
    ids = rng.randint(10, 100, (2, 20)).astype(np.int64)
    valid = np.ones((2, 20), bool)
    valid[1, 15:] = False
    ids_j = jnp.asarray(ids, jnp.int32)
    valid_j = jnp.asarray(valid)
    key = jax.random.PRNGKey(0)

    a = inf.prefill_fn(CFG, params, ids_j, 64, valid_j, None, False, TOKENS)
    b = inf.chunked_prefill(CFG, params, ids_j, valid_j, 64, TOKENS, chunk=6)
    np.testing.assert_allclose(np.asarray(a.h_pos), np.asarray(b.h_pos), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(a.cache.length), np.asarray(b.cache.length))
    # cache contents agree on each sample's valid prefix (pos rows 0..B-1,
    # neg rows B..2B-1)
    for s in range(4):
        n = int(a.cache.length[s])
        for la, lb in zip(a.cache.k, b.cache.k):
            np.testing.assert_allclose(
                np.asarray(la[s, :, :n]), np.asarray(lb[s, :, :n]), rtol=2e-5, atol=2e-5
            )


def test_generate_with_pt_latents(params, step_fn):
    """Voice cloning from precomputed latents (reference speech_type='pt',
    modeling_vibevoice_inference.py:164-174)."""
    rng = np.random.RandomState(2)
    n_frames = 3
    ids = rng.randint(10, 100, (1, 9)).astype(np.int64)
    ids[0, 2:5] = TOKENS.speech_diffusion
    ids[0, -1] = TOKENS.speech_start
    mask = np.zeros((1, 9), bool)
    mask[0, 2:5] = True
    out = inf.generate(
        CFG,
        params,
        input_ids=ids,
        speech_tensors=rng.randn(1, n_frames, CFG.acoustic_vae_dim).astype(np.float32),
        speech_frame_valid=np.ones((1, n_frames), bool),
        speech_input_mask=mask,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=3, max_length=64),
        speech_type="pt",
        step_fn=step_fn,
    )
    assert set(np.unique(out.sequences[:, 9:])).issubset(set(TOKENS.candidates))


@pytest.mark.slow
def test_longform_chunked_prefill_with_boundaries(params):
    """Reduced-scale BASELINE config 3 shape: a prompt longer than
    prefill_chunk (forcing the chunked 64K-prefill path) with voice features,
    then a forced token script crossing several speech_end -> speech_start
    segment boundaries. The negative-stream length bookkeeping and conv-state
    resets must survive the chunked-prefill carry."""
    rng = np.random.RandomState(7)
    t0 = 40
    ids = rng.randint(10, 100, (1, t0)).astype(np.int64)
    ids[0, 3:7] = TOKENS.speech_diffusion
    ids[0, -1] = TOKENS.speech_start
    mask = np.zeros((1, t0), bool)
    mask[0, 3:7] = True
    wav = rng.randn(1, 4 * HOP).astype(np.float32)

    script = np.array([7, 7, 6, 5, 7, 7, 7, 6, 5, 7, 2], np.int32)[:, None]
    bank = {"init": rng.randn(16, 1, CFG.acoustic_vae_dim).astype(np.float32)}
    opts = inf.GenerateOptions(ddpm_steps=2, max_length=128, prefill_chunk=16)
    out = inf.generate(
        CFG,
        params,
        input_ids=ids,
        speech_tensors=wav,
        speech_frame_valid=np.ones((1, 4), bool),
        speech_input_mask=mask,
        tokens=TOKENS,
        opts=opts,
        forced_tokens=script,
        noise_bank=bank,
    )
    gen = out.sequences[0, t0:]
    np.testing.assert_array_equal(gen[: len(script)], script[:, 0])
    assert len(out.speech_outputs[0]) == 6 * HOP  # 6 diffusion frames

    # identical run through the one-shot prefill path must match exactly
    out2 = inf.generate(
        CFG,
        params,
        input_ids=ids,
        speech_tensors=wav,
        speech_frame_valid=np.ones((1, 4), bool),
        speech_input_mask=mask,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=128, prefill_chunk=2048),
        forced_tokens=script,
        noise_bank=bank,
    )
    np.testing.assert_array_equal(out.sequences, out2.sequences)
    np.testing.assert_allclose(
        out.speech_outputs[0], out2.speech_outputs[0], rtol=2e-4, atol=2e-4
    )


def test_generate_with_int8_params(params, step_fn):
    """quantize_for_inference plumbing through generate (tiny dims use the
    dense fallback; the pallas path is validated in test_flash_attention)."""
    qparams = vv.quantize_for_inference(params)
    ids = np.full((1, 8), 25, np.int64)
    ids[:, -1] = TOKENS.speech_start
    out = inf.generate(
        CFG,
        qparams,
        input_ids=ids,
        tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=48),
    )
    assert set(np.unique(out.sequences[:, 8:])).issubset(set(TOKENS.candidates))


@pytest.mark.slow
def test_sampling_temperature_top_p(params):
    """do_sample with HF GenerationConfig-style temperature/top_p knobs:
    constrained-candidate invariant holds, and a degenerate nucleus
    (top_p -> 0 keeps only the argmax) reproduces greedy decoding."""
    rng = np.random.RandomState(11)
    ids = rng.randint(10, 100, (2, 10)).astype(np.int64)
    ids[:, -1] = TOKENS.speech_start
    mask = np.ones((2, 10), bool)

    out = inf.generate(
        CFG, params, input_ids=ids, valid_mask=mask, tokens=TOKENS,
        opts=inf.GenerateOptions(
            ddpm_steps=2, max_length=48, do_sample=True, temperature=0.7, top_p=0.9
        ),
        seed=5,
    )
    assert set(np.unique(out.sequences[:, 10:])).issubset(set(TOKENS.candidates))

    greedy = inf.generate(
        CFG, params, input_ids=ids, valid_mask=mask, tokens=TOKENS,
        opts=inf.GenerateOptions(ddpm_steps=2, max_length=48), seed=5,
    )
    nucleus1 = inf.generate(
        CFG, params, input_ids=ids, valid_mask=mask, tokens=TOKENS,
        opts=inf.GenerateOptions(
            ddpm_steps=2, max_length=48, do_sample=True, top_p=1e-6
        ),
        seed=5,
    )
    np.testing.assert_array_equal(nucleus1.sequences, greedy.sequences)


def test_multi_frame_dispatch_respects_global_cap(params):
    """The last K-frame window is masked past max_steps for EVERY sample:
    outputs are identical for any frames_per_dispatch, a shorter sample whose
    per-sample cap exceeds max_steps emits no extra frames in the padded
    window, and no cache can advance past max_length (regression: the padded
    frames used to run live, overrunning the cache by up to K-1 slots)."""
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 100, (2, 12)).astype(np.int64)
    ids[:, -1] = TOKENS.speech_start
    valid = np.ones((2, 12), bool)
    valid[1, 9:] = False
    ids[1, 9:] = 0
    ids[1, 8] = TOKENS.speech_start
    # max_steps = min(22 - 12, 2*12) = 10 (not a multiple of K=4); sample 1's
    # per-sample cap = min(22 - 9, 18) = 13 > 10 — the old code let it emit
    # real frames at padded steps 10..11
    forced = np.full((16, 2), TOKENS.speech_diffusion, np.int32)
    outs = {}
    for k in (1, 4):
        opts = inf.GenerateOptions(ddpm_steps=2, max_length=22, frames_per_dispatch=k)
        outs[k] = inf.generate(
            CFG, params, input_ids=ids, valid_mask=valid, tokens=TOKENS,
            opts=opts, seed=3, forced_tokens=forced,
        )
    assert outs[1].sequences.shape == outs[4].sequences.shape, (
        outs[1].sequences.shape, outs[4].sequences.shape,
    )
    np.testing.assert_array_equal(outs[1].sequences, outs[4].sequences)
    np.testing.assert_array_equal(
        outs[1].reach_max_step_sample, outs[4].reach_max_step_sample
    )
    for b in range(2):
        a1, a4 = outs[1].speech_outputs[b], outs[4].speech_outputs[b]
        np.testing.assert_array_equal(
            np.zeros(0) if a1 is None else a1, np.zeros(0) if a4 is None else a4
        )
    # both samples generated exactly max_steps=10 frames (forced diffusion)
    assert outs[4].sequences.shape[1] == 12 + 10
