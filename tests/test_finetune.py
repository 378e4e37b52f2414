"""Fine-tune subsystem tests: loss semantics, LoRA, EMA, collator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# fast gate (-m "not slow") skips this module: trainer CLI smoke + FSDP-adjacent train steps dominate (~240 s serial)
pytestmark = pytest.mark.slow

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.finetune import data as fdata
from vibevoice_tpu.finetune.ema import init_ema, swap_in_ema, update_ema
from vibevoice_tpu.finetune.loss import Batch, TrainOptions, train_forward
from vibevoice_tpu.finetune.lora import LoraConfig, apply_lora, init_lora
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.processor.processor import VibeVoiceProcessor
from vibevoice_tpu.processor.text_tokenizer import FallbackTextTokenizer

CFG = tiny_config()
HOP = CFG.acoustic_tokenizer_config.hop_length


@pytest.fixture(scope="module")
def params():
    p = dict(vv.init(jax.random.PRNGKey(0), CFG))
    p["speech_scaling_factor"] = jnp.asarray(float("nan"))
    p["speech_bias_factor"] = jnp.asarray(float("nan"))
    return p


def make_batch(b=2, t=24, n_frames=4):
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 100, (b, t)).astype(np.int32)
    ain = np.zeros((b, t), bool)
    ain[:, 6 : 6 + n_frames] = True
    return Batch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((b, t), bool),
        speech_tensors=jnp.asarray(rng.randn(b, HOP * n_frames).astype(np.float32)),
        speech_masks=jnp.ones((b, n_frames), bool),
        speech_semantic_tensors=jnp.asarray(
            rng.randn(b, n_frames, CFG.semantic_vae_dim).astype(np.float32)
        ),
        speeches_loss_input=jnp.ones((b,), bool),
        acoustic_input_mask=jnp.asarray(ain),
        acoustic_loss_mask=jnp.asarray(ain),
    )


def test_train_forward_finite_and_stats_init(params):
    out = train_forward(CFG, params, make_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    assert np.isfinite(float(out.ce_loss))
    assert np.isfinite(float(out.diffusion_loss))
    # NaN buffers -> initialised from first batch (reference :307-323)
    assert np.isfinite(float(out.speech_scaling_factor))
    assert np.isfinite(float(out.speech_bias_factor))


def test_diffusion_loss_near_one_at_zero_init(params):
    """Zero-init head predicts 0; v-target MSE/latent_size ~= E||v||^2/d ~= 1."""
    out = train_forward(CFG, params, make_batch(), jax.random.PRNGKey(2))
    assert 0.5 < float(out.diffusion_loss) < 2.0


def test_grads_flow(params):
    def loss(p):
        return train_forward(CFG, p, make_batch(), jax.random.PRNGKey(3)).loss

    g = jax.grad(loss)(params)
    # adaLN-zero: the head's FFN weights get no grad on step one, but the
    # zero-init final projection does (its input is nonzero)
    gh = g["diffusion_head"]["final"]["linear"]["w"]
    assert float(jnp.abs(gh).sum()) > 0
    glm = g["lm"]["layers"][0]["attn"]["q"]["w"]
    assert float(jnp.abs(glm).sum()) > 0


def test_remat_chunked_ce_match(params):
    """remat + chunked CE are exact: same loss scalars AND same gradients as
    the dense path (chunk size deliberately not dividing B*(T-1))."""
    batch = make_batch()
    key = jax.random.PRNGKey(5)
    base_opts = TrainOptions()
    mem_opts = TrainOptions(remat=True, ce_chunk_size=7)

    def loss(p, opts):
        return train_forward(CFG, p, batch, key, opts).loss

    out_a = train_forward(CFG, params, batch, key, base_opts)
    out_b = train_forward(CFG, params, batch, key, mem_opts)
    np.testing.assert_allclose(float(out_a.ce_loss), float(out_b.ce_loss), rtol=1e-5)
    np.testing.assert_allclose(float(out_a.ce_max), float(out_b.ce_max), rtol=1e-5)
    np.testing.assert_allclose(float(out_a.ce_accuracy), float(out_b.ce_accuracy), rtol=1e-6)
    assert int(out_a.ce_token_count) == int(out_b.ce_token_count)
    np.testing.assert_allclose(float(out_a.loss), float(out_b.loss), rtol=1e-5)

    g_a = jax.grad(loss)(params, base_opts)
    g_b = jax.grad(loss)(params, mem_opts)
    flat_a = jax.tree_util.tree_leaves(g_a)
    flat_b = jax.tree_util.tree_leaves(g_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    # the "dots" saveable policy (keep matmul outputs, recompute elementwise)
    # is exact too — only the memory/time point moves
    out_c = train_forward(
        CFG, params, batch, key, TrainOptions(remat=True, remat_policy="dots")
    )
    np.testing.assert_allclose(float(out_a.loss), float(out_c.loss), rtol=1e-5)
    g_c = jax.grad(loss)(params, TrainOptions(remat=True, remat_policy="dots"))
    for a, c in zip(flat_a, jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4, atol=1e-6)


def test_lora_zero_init_is_identity(params):
    cfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(4), params, cfg)
    merged = apply_lora(params, lora, cfg)
    np.testing.assert_array_equal(
        np.asarray(merged["lm"]["layers"][0]["attn"]["q"]["w"]),
        np.asarray(params["lm"]["layers"][0]["attn"]["q"]["w"]),
    )


def test_lora_grads_only_through_adapters(params):
    cfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(5), params, cfg)

    def loss(lo):
        merged = apply_lora(params, lo, cfg)
        return train_forward(CFG, merged, make_batch(), jax.random.PRNGKey(6)).loss

    g = jax.grad(loss)(lora)
    # b is zero-init so dL/da = 0 on the first step, but dL/db must be nonzero
    assert float(jnp.abs(g["lm_layers"][0]["q"]["b"]).sum()) > 0


def test_ema_update_and_swap(params):
    ema = init_ema(params["diffusion_head"])
    new_head = jax.tree.map(lambda x: x + 1.0, params["diffusion_head"])
    ema2 = update_ema(ema, new_head, decay=0.5)
    w0 = np.asarray(params["diffusion_head"]["noisy_proj"]["w"])
    np.testing.assert_allclose(
        np.asarray(ema2["noisy_proj"]["w"]), w0 + 0.5, rtol=1e-5, atol=1e-6
    )
    swapped = swap_in_ema(params, ema2)
    np.testing.assert_allclose(
        np.asarray(swapped["diffusion_head"]["noisy_proj"]["w"]), w0 + 0.5, rtol=1e-5, atol=1e-6
    )


def test_collator_shapes(params):
    proc = VibeVoiceProcessor(
        tokenizer=FallbackTextTokenizer(), speech_tok_compress_ratio=HOP
    )
    coll = fdata.VibeVoiceCollator(
        processor=proc,
        semantic_encode_fn=fdata.make_semantic_encode_fn(
            CFG.semantic_tokenizer_config, params["semantic_tokenizer"]
        ),
        speech_compress_ratio=HOP,
        semantic_vae_dim=CFG.semantic_vae_dim,
        pre_silence_sec=0.0005,
        post_silence_sec=0.001,
        crossfade_sec=0.0005,
    )
    wav = np.random.RandomState(0).randn(HOP * 6).astype(np.float32) * 0.1
    batch = coll(
        [
            {"text": "Speaker 1: hello", "audio": wav, "voice_prompts": [wav[: HOP * 2]]},
            {"text": "Speaker 1: a longer second sample", "audio": wav},
        ]
    )
    b, t = batch.input_ids.shape
    assert b == 2
    # voice prompt (sample 0) + two targets = 3 speech segments
    assert batch.speech_tensors.shape[0] == 3
    assert batch.speeches_loss_input.tolist() == [False, True, True]
    # each row's loss mask is a subset of its input mask
    assert not (batch.acoustic_loss_mask & ~batch.acoustic_input_mask).any()
    # semantic features aligned with frame mask
    assert batch.speech_semantic_tensors.shape[:2] == batch.speech_masks.shape
    # target latent count matches loss-mask (per sample)
    assert batch.acoustic_loss_mask[1].sum() == batch.speech_masks[2].sum()


def test_collator_truncation_guard(params):
    proc = VibeVoiceProcessor(
        tokenizer=FallbackTextTokenizer(), speech_tok_compress_ratio=HOP
    )
    coll = fdata.VibeVoiceCollator(
        processor=proc,
        semantic_encode_fn=lambda w: np.zeros((w.shape[0], 1, CFG.semantic_vae_dim)),
        speech_compress_ratio=HOP,
        max_length=5,
        pre_silence_sec=0.0,
        post_silence_sec=0.0,
        crossfade_sec=0.0,
    )
    wav = np.zeros(HOP * 8, np.float32)
    with pytest.raises(ValueError, match="truncate into acoustic"):
        coll([{"text": "Speaker 1: hello there friend", "audio": wav}])


def test_silence_crossfade_lengths():
    wav = np.ones(24_000, np.float32)
    out = fdata.apply_silence_with_crossfade(wav)
    assert len(out) == 24_000 + int(0.25 * 24_000) + int(0.75 * 24_000)
    assert out[0] == 0.0 and out[-1] == 0.0
    assert out[int(0.25 * 24_000) + 12_000] == 1.0  # middle untouched


def test_orbax_checkpoint_roundtrip(tmp_path, params):
    from vibevoice_tpu.utils import checkpoint as ckpt

    if not ckpt.have_orbax():
        pytest.skip("orbax not installed")
    tree = {"a": jnp.arange(8.0), "b": {"c": jnp.ones((2, 3))}}
    path = str(tmp_path / "ck")
    ckpt.save_train_state(path, tree)
    back = ckpt.restore_train_state(path, tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.asarray(tree["b"]["c"]))


def test_freeze_filter_and_accumulation(params):
    """Selective freeze (reference train_vibevoice.py:390-468) + gradient
    accumulation: frozen subtrees stay bit-identical; accumulation applies
    the averaged update only at the k-th micro-step."""
    from vibevoice_tpu.finetune.train_step import (
        build_trainable_filter,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    trainable = build_trainable_filter(
        train_connectors=False,
        train_diffusion_head=True,
        head_layers_to_freeze=(0,),
        freeze_embed=True,
        lm_layers_to_freeze=(0,),
    )
    opt = make_optimizer(
        learning_rate=1e-2, warmup_steps=1, total_steps=4, accumulation_steps=2,
        trainable_filter=trainable,
    )
    step_fn = jax.jit(make_train_step(CFG, opt, TrainOptions(), trainable_filter=trainable))
    state = init_train_state(params, opt)
    p0 = jax.tree.map(np.asarray, params)

    state, _ = step_fn(state, make_batch(), jax.random.PRNGKey(0))
    # first micro-step of 2: NO parameter change yet (accumulation) — except
    # the speech stats buffers, which initialise from the first batch
    same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)), p0, state.params)
    same.pop("speech_scaling_factor")
    same.pop("speech_bias_factor")
    assert all(jax.tree_util.tree_leaves(same)), "params changed before accumulation boundary"

    # micro-steps 2-4: two optimizer updates land (the first at warmup LR=0)
    for i in range(1, 4):
        state, _ = step_fn(state, make_batch(), jax.random.PRNGKey(i))

    # trainable parts move, frozen parts stay bit-identical
    def assert_frozen(path_np, path_new):
        np.testing.assert_array_equal(path_np, np.asarray(path_new))

    assert_frozen(p0["acoustic_tokenizer"]["encoder"]["head"]["w"],
                  state.params["acoustic_tokenizer"]["encoder"]["head"]["w"])
    assert_frozen(p0["acoustic_connector"]["fc1"]["w"],
                  state.params["acoustic_connector"]["fc1"]["w"])
    assert_frozen(p0["lm"]["embed"], state.params["lm"]["embed"])
    assert_frozen(p0["lm"]["layers"][0]["attn"]["q"]["w"],
                  state.params["lm"]["layers"][0]["attn"]["q"]["w"])
    assert_frozen(p0["diffusion_head"]["layers"][0]["ffn"]["gate"]["w"],
                  state.params["diffusion_head"]["layers"][0]["ffn"]["gate"]["w"])
    # trainable parts moved
    assert not np.array_equal(
        p0["lm"]["layers"][1]["attn"]["q"]["w"],
        np.asarray(state.params["lm"]["layers"][1]["attn"]["q"]["w"]),
    )
    assert not np.array_equal(
        p0["diffusion_head"]["layers"][1]["ffn"]["gate"]["w"],
        np.asarray(state.params["diffusion_head"]["layers"][1]["ffn"]["gate"]["w"]),
    )


def test_trainer_cli_smoke_freeze_accum_resume(tmp_path):
    """End-to-end LoRA fine-tune smoke through the CLI main() exercising
    accumulation + eval + CE debug + resume (VERDICT round-2 item 9)."""
    import sys
    from vibevoice_tpu.finetune import train as T

    out = str(tmp_path / "ft")
    argv = [
        "train", "--synthetic_data", "--use_lora", "--max_steps", "4",
        "--per_device_batch_size", "2", "--gradient_accumulation_steps", "2",
        "--save_steps", "2", "--log_steps", "1", "--eval_steps", "2",
        "--eval_split_size", "0.1", "--debug_ce_every_n_steps", "2",
        "--output_dir", out, "--warmup_steps", "1",
    ]
    old = sys.argv
    try:
        sys.argv = argv
        T.main()
        sys.argv = argv + ["--resume_from_checkpoint", f"{out}/checkpoint-2"]
        T.main()
    finally:
        sys.argv = old
    import os

    assert os.path.isdir(f"{out}/checkpoint-4")


def test_head_position_budget_exact(params):
    """head_position_budget gathers speech positions before the diffusion
    head (the ~8x head-FLOP saving at real T); with K >= every sample's
    frame count the loss equals the dense path to f32 reduction order
    (identical RNG rows gathered, dropped rows are exact zeros) and grads
    match."""
    batch = make_batch()  # 4 frames per sample at positions 6..9
    key = jax.random.PRNGKey(6)
    dense = TrainOptions()
    # budget not a multiple of anything, larger than the frame count
    budg = TrainOptions(head_position_budget=7)

    out_a = train_forward(CFG, params, batch, key, dense)
    out_b = train_forward(CFG, params, batch, key, budg)
    np.testing.assert_allclose(
        float(out_a.diffusion_loss), float(out_b.diffusion_loss), rtol=1e-5
    )
    np.testing.assert_allclose(float(out_a.loss), float(out_b.loss), rtol=1e-5)
    assert int(out_a.speech_frame_count) == int(out_b.speech_frame_count)

    def loss(p, opts):
        return train_forward(CFG, p, batch, key, opts).loss

    g_a = jax.grad(loss)(params, dense)
    g_b = jax.grad(loss)(params, budg)
    for a, b in zip(jax.tree_util.tree_leaves(g_a), jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    # composes with the other memory levers
    out_c = train_forward(
        CFG, params, batch, key,
        TrainOptions(head_position_budget=7, remat=True, ce_chunk_size=7),
    )
    np.testing.assert_allclose(float(out_a.loss), float(out_c.loss), rtol=1e-5)

    # K >= T degrades to a full gather and stays finite
    out_d = train_forward(
        CFG, params, batch, key, TrainOptions(head_position_budget=10_000)
    )
    np.testing.assert_allclose(float(out_a.loss), float(out_d.loss), rtol=1e-6)


def test_merge_with_connector_and_full_head_overrides(params, tmp_path):
    """VERDICT round-3 item 5: train-with-connectors fixture -> merge -> all
    trained tensors verified present in the merged checkpoint (reference
    merge_vibevoice_models.py:89-150 override merge, :171-254 verification).
    Trains 2 real LoRA steps with train_connectors + full_diffusion_head so
    extras genuinely move, saves lora/ assets, runs the merger, and checks
    the output checkpoint carries the trained connectors/head EXACTLY."""
    from vibevoice_tpu.finetune.lora import save_lora_assets
    from vibevoice_tpu.finetune.train_step import (
        init_train_state, make_lora_train_step, make_optimizer,
    )
    from vibevoice_tpu.scripts.merge_vibevoice_models import run_merge
    from vibevoice_tpu.utils.hf_interop import load_native, save_native

    lcfg = LoraConfig(r=4, alpha=8, train_connectors=True, full_diffusion_head=True)
    lora = init_lora(jax.random.PRNGKey(7), params, lcfg)
    assert "diffusion_head_layers" not in lora  # full-rank head, no adapters
    assert set(lora["extras"]) == {"acoustic_connector", "semantic_connector",
                                   "diffusion_head"}

    optimizer = make_optimizer(warmup_steps=1, learning_rate=1e-3)
    step = jax.jit(make_lora_train_step(CFG, optimizer, lcfg))
    state = init_train_state(lora, optimizer)
    batch = make_batch()
    state, _ = step(state, params, batch, jax.random.PRNGKey(8))
    state, _ = step(state, params, batch, jax.random.PRNGKey(9))  # lr > 0 now

    trained = state.params
    # the dense overrides trained alongside the adapters
    leaves_t = jax.tree_util.tree_leaves(trained["extras"]["acoustic_connector"])
    leaves_b = jax.tree_util.tree_leaves(params["acoustic_connector"])
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(leaves_t, leaves_b)
    ), "connector override did not train"

    base_dir, ckpt_dir, out_dir = tmp_path / "base", tmp_path / "ckpt", tmp_path / "merged"
    save_native(str(base_dir), CFG, params)
    save_lora_assets(str(ckpt_dir / "lora"), trained, lcfg)
    import os
    assert os.path.exists(ckpt_dir / "lora" / "extras.pkl")

    report = run_merge(str(base_dir), str(ckpt_dir), str(out_dir))
    assert report["lm_changed"] > 0
    assert sorted(report["overridden"]) == [
        "acoustic_connector", "diffusion_head", "semantic_connector"
    ]

    _, merged = load_native(str(out_dir))
    for key in ("acoustic_connector", "semantic_connector", "diffusion_head"):
        for got, want in zip(
            jax.tree_util.tree_leaves(merged[key]),
            jax.tree_util.tree_leaves(trained["extras"][key]),
        ):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # adapted LM weights are base + delta, not base
    assert np.abs(
        np.asarray(merged["lm"]["layers"][0]["attn"]["q"]["w"])
        - np.asarray(params["lm"]["layers"][0]["attn"]["q"]["w"])
    ).max() > 0
