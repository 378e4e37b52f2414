"""Fused Pallas vocoder-stage kernel parity (interpret mode on CPU):
the packed T=1 block-stack step must match the dense per-block path, for
both the acoustic decoder (stage 0) and the semantic encoder (final stage),
dense and int8-quantized."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import tokenizer as tok
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.ops.vocoder_fused import pack_stage, fused_stage_step

CFG = tiny_config()
ACFG = CFG.acoustic_tokenizer_config
SCFG = CFG.semantic_tokenizer_config
HOP = ACFG.hop_length


@pytest.fixture(scope="module")
def params():
    # scale up weights so activations are non-trivial
    p = tok.init_acoustic_tokenizer(jax.random.PRNGKey(3), ACFG)
    return jax.tree.map(lambda x: x * 10 if x.ndim >= 2 else x, p)


def test_fused_decoder_stage_matches_dense(params):
    rng = np.random.RandomState(0)
    latents = rng.randn(2, 1, ACFG.vae_dim).astype(np.float32)

    dense_state = tok.init_decoder_state(ACFG, 2)
    fused_params = tok.fuse_hot_stages({"decoder": params["decoder"]}, ACFG, quantize=False)

    x = jnp.asarray(latents)
    y_dense, st_dense = tok.decoder_apply(ACFG, params["decoder"], x, dense_state)
    y_fused, st_fused = tok.decoder_apply(ACFG, fused_params["decoder"], x, dense_state)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_dense), rtol=2e-5, atol=2e-5)
    for k in st_dense:
        np.testing.assert_allclose(
            np.asarray(st_fused[k]), np.asarray(st_dense[k]), rtol=2e-5, atol=2e-5, err_msg=k
        )

    # multi-frame streaming: fused state threading stays equivalent
    y2d, st2d = tok.decoder_apply(ACFG, params["decoder"], x * 0.5, st_dense)
    y2f, st2f = tok.decoder_apply(ACFG, fused_params["decoder"], x * 0.5, st_fused)
    np.testing.assert_allclose(np.asarray(y2f), np.asarray(y2d), rtol=2e-5, atol=2e-5)


def test_fused_encoder_stage_matches_dense(params):
    sem = tok.init_semantic_tokenizer(jax.random.PRNGKey(5), SCFG)
    sem = jax.tree.map(lambda x: x * 10 if x.ndim >= 2 else x, sem)
    fused = tok.fuse_hot_stages({"encoder": sem["encoder"]}, SCFG, quantize=False)
    rng = np.random.RandomState(1)
    audio = rng.randn(2, HOP, 1).astype(np.float32)

    st = tok.init_encoder_state(SCFG, 2)
    y_dense, st_d = tok.encoder_apply(SCFG, sem["encoder"], jnp.asarray(audio), st)
    y_fused, st_f = tok.encoder_apply(SCFG, fused["encoder"], jnp.asarray(audio), st)
    assert y_dense.shape[1] == 1  # final stage runs at T=1
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_dense), rtol=2e-5, atol=2e-5)
    for k in st_d:
        np.testing.assert_allclose(
            np.asarray(st_f[k]), np.asarray(st_d[k]), rtol=2e-5, atol=2e-5, err_msg=k
        )


def test_fused_quantized_close(params):
    """int8 packing stays within per-channel quantization error."""
    rng = np.random.RandomState(2)
    latents = rng.randn(1, 1, ACFG.vae_dim).astype(np.float32)
    st = tok.init_decoder_state(ACFG, 1)
    qparams = tok.fuse_hot_stages({"decoder": params["decoder"]}, ACFG, quantize=True)
    y_dense, _ = tok.decoder_apply(ACFG, params["decoder"], jnp.asarray(latents), st)
    y_q, _ = tok.decoder_apply(ACFG, qparams["decoder"], jnp.asarray(latents), st)
    d, q = np.asarray(y_dense), np.asarray(y_q)
    denom = np.maximum(np.abs(d).max(), 1e-3)
    assert np.abs(q - d).max() / denom < 0.05, np.abs(q - d).max() / denom


def test_fused_streaming_equals_batch(params):
    """Fused per-frame streaming decode == dense batch decode on the same
    latent sequence (the streaming≡batch invariant must survive fusion)."""
    rng = np.random.RandomState(3)
    latents = rng.randn(1, 4, ACFG.vae_dim).astype(np.float32)
    y_batch, _ = tok.decoder_apply(ACFG, params["decoder"], jnp.asarray(latents), None)

    fused = tok.fuse_hot_stages(
        {"decoder": params["decoder"]}, ACFG, quantize=False, keep_dense=True
    )
    st = tok.init_decoder_state(ACFG, 1)
    chunks = []
    for f in range(4):
        y, st = tok.decoder_apply(ACFG, fused["decoder"], jnp.asarray(latents[:, f : f + 1]), st)
        chunks.append(np.asarray(y))
    stream = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(stream, np.asarray(y_batch), rtol=2e-4, atol=2e-4)


def test_fuse_vocoder_model_transform(params):
    """Model-level transform packs acoustic decoder + semantic encoder and
    leaves the acoustic encoder dense."""
    model_params = vv.init(jax.random.PRNGKey(0), CFG)
    fused = vv.fuse_vocoder(model_params, CFG, quantize=True)
    assert "stage0_packed" in fused["acoustic_tokenizer"]["decoder"]
    assert fused["acoustic_tokenizer"]["decoder"]["stages"][0] == []
    assert "stageN_packed" in fused["semantic_tokenizer"]["encoder"]
    assert "stageN_packed" not in fused["acoustic_tokenizer"]["encoder"]
    # voice-clone batch encode still works on the fused tree
    wav = jnp.asarray(np.random.RandomState(4).randn(1, 4 * HOP, 1), jnp.float32)
    mean, _ = tok.encode(ACFG, fused["acoustic_tokenizer"], wav)
    assert mean.shape == (1, 4, ACFG.vae_dim)


class TestFusedHead:
    """Fused diffusion-head FFN stack (ops/head_fused.py) vs the dense
    hoisted-AdaLN path, dense and int8."""

    def _setup(self):
        from vibevoice_tpu.models import diffusion_head as dh

        hcfg = CFG.diffusion_head_config
        p = dh.init(jax.random.PRNGKey(1), hcfg)
        p = jax.tree.map(lambda x: jax.random.normal(jax.random.PRNGKey(0), x.shape) * 0.05
                         if x.ndim >= 2 else x, p)
        rng = np.random.RandomState(2)
        noisy = jnp.asarray(rng.randn(2, hcfg.latent_size), jnp.float32)
        t = jnp.asarray([100.0, 500.0], jnp.float32)
        cond = jnp.asarray(rng.randn(2, hcfg.hidden_size), jnp.float32)
        return dh, hcfg, p, noisy, t, cond

    def test_hoisted_mods_match_apply(self):
        dh, hcfg, p, noisy, t, cond = self._setup()
        ref = dh.apply(p, hcfg, noisy, t, cond)
        # per-sample timesteps differ; hoist per unique step then gather rows
        mods_all = dh.precompute_mods(p, hcfg, t, cond)  # (K=2, B=2, .)
        mods = {
            "layers": [jnp.stack([m[i, i] for i in range(2)]) for m in mods_all["layers"]],
            "final": jnp.stack([mods_all["final"][i, i] for i in range(2)]),
        }
        out = dh.apply_with_mods(p, hcfg, noisy, mods)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_fused_kernel_matches_dense(self):
        dh, hcfg, p, noisy, t, cond = self._setup()
        tt = jnp.full((2,), 300.0)
        mods_all = dh.precompute_mods(p, hcfg, tt[:1], cond)
        mods = {"layers": [m[0] for m in mods_all["layers"]], "final": mods_all["final"][0]}
        ref = dh.apply_with_mods(p, hcfg, noisy, mods)

        fused = dh.fuse_head(p, hcfg, quantize=False, keep_dense=True)
        out = dh.apply_with_mods(fused, hcfg, noisy, mods)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

        qfused = dh.fuse_head(p, hcfg, quantize=True)
        assert "ffn" not in qfused["layers"][0]  # dense FFN weights dropped
        qout = dh.apply_with_mods(qfused, hcfg, noisy, mods)
        denom = max(float(np.abs(np.asarray(ref)).max()), 1e-3)
        assert float(np.abs(np.asarray(qout) - np.asarray(ref)).max()) / denom < 0.05

    def test_fuse_for_serving_end_to_end(self):
        """generate() runs with the full serving pack (vocoder + head)."""
        from vibevoice_tpu.models import inference as inf

        params = vv.init(jax.random.PRNGKey(0), CFG)
        fused = vv.fuse_for_serving(params, CFG, quantize=True)
        toks = inf.SpecialTokens(speech_start=5, speech_end=6, speech_diffusion=7, eos=2)
        script = np.array([[7], [7], [6], [2]], np.int32)
        ids = np.array([[10, 11, 5]], np.int64)
        bank = {"init": np.random.RandomState(0).randn(8, 1, CFG.acoustic_vae_dim).astype(np.float32)}
        out = inf.generate(CFG, fused, input_ids=ids, tokens=toks,
                           opts=inf.GenerateOptions(ddpm_steps=3, max_length=48),
                           forced_tokens=script, noise_bank=bank)
        assert len(out.speech_outputs[0]) == 2 * HOP
        # dense run with the same noise must be CLOSE (int8 error only)
        out_d = inf.generate(CFG, params, input_ids=ids, tokens=toks,
                             opts=inf.GenerateOptions(ddpm_steps=3, max_length=48),
                             forced_tokens=script, noise_bank=bank)
        a, b = out.speech_outputs[0], out_d.speech_outputs[0]
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-3) < 0.2


def test_fuse_after_quantize_keeps_dense(params):
    """An already-int8 FFN (quantize_for_inference('tokenizers') replaced
    'w' with 'w8') must make fuse_hot_stages keep the stage DENSE — the
    fused kernel quantizes in-kernel itself — instead of KeyErroring at
    pack time (the BENCH_INT8_TOK=1 ordering)."""
    from vibevoice_tpu.ops.quant import quantize_weight

    dec = jax.tree.map(lambda x: x, params["decoder"])  # deep-ish copy
    stages = [list(st) for st in dec["stages"]]
    blocks = []
    for blk in stages[0]:
        nb = dict(blk)
        nb["ffn"] = dict(blk["ffn"])
        for name in ("fc1", "fc2"):
            e = dict(nb["ffn"][name])
            q = quantize_weight(e.pop("w"))
            e.update(q)
            nb["ffn"][name] = e
        blocks.append(nb)
    stages[0] = blocks
    dec = dict(dec)
    dec["stages"] = stages

    fused = tok.fuse_hot_stages({"decoder": dec}, ACFG, quantize=True)
    assert "stage0_packed" not in fused["decoder"]  # quantized stage stays dense
    assert fused["decoder"]["stages"][0]  # dense blocks intact
