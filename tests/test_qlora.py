"""QLoRA: LoRA adapters over an int8-quantized frozen base (ops/quant.mm
"lora" entries + the custom VJP through the int8 matmul). The capability
target is 7B LoRA fine-tuning on ONE 16 GB v5e (bf16 base weights alone are
14 GB); these tests pin the math on CPU at tiny scale."""

import pytest


# fast gate (-m "not slow") skips this module: int8-base train steps (~66 s serial)
pytestmark = pytest.mark.slow
import numpy as np
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import vibevoice as vv
from vibevoice_tpu.ops import quant

CFG = tiny_config()


def test_mm_lora_gradients_match_dense():
    """mm(x, {w8, scale, lora}) forward == int8 matmul + low-rank branch, and
    grads w.r.t. x/A/B match the dequantized-dense formulation (the custom
    VJP's backward is exact for the dequantized weight)."""
    rng = np.random.RandomState(0)
    cin, cout, r, rows = 32, 48, 4, 6
    w = jnp.asarray(rng.randn(cin, cout).astype(np.float32))
    q = quant.quantize_weight(w)
    x = jnp.asarray(rng.randn(rows, cin).astype(np.float32))
    a = jnp.asarray(rng.randn(cin, r).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(r, cout).astype(np.float32) * 0.1)
    s = 2.0
    # dense reference computing EXACTLY what the quant fallback computes in
    # the forward (x and dequantized w cast to bf16 before the dot) — the
    # comparison then isolates the custom-VJP backward, whose only delta vs
    # autodiff is where the scale multiplication meets the bf16 rounding
    wd16 = q["w8"].astype(jnp.bfloat16) * q["scale"].astype(jnp.bfloat16)

    def f_quant(x, a, b):
        return jnp.sum(jnp.sin(quant.mm(x, {**q, "lora": (a, b, s)})))

    def f_dense(x, a, b):
        base = jnp.dot(x.astype(jnp.bfloat16), wd16).astype(x.dtype)
        return jnp.sum(jnp.sin(base + ((x @ a) @ b) * s))

    np.testing.assert_allclose(
        float(f_quant(x, a, b)), float(f_dense(x, a, b)), rtol=1e-5
    )
    gq = jax.grad(f_quant, argnums=(0, 1, 2))(x, a, b)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(x, a, b)
    # a wrong transpose/scale in the VJP would be off by orders of magnitude;
    # the two backwards differ by 1-ulp bf16 rounding (different
    # scale-folding order), ~0.06 absolute at these dot magnitudes
    for got, want in zip(gq, gd):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=0.1)


def test_int8_matmul_t_kernel_parity():
    """The transposed-contraction Pallas kernel (QLoRA backward dx) matches
    the XLA dequantize-then-dot formulation at kernel-eligible shapes."""
    rng = np.random.RandomState(1)
    cin, cout, rows = 512, 1024, 16
    w = jnp.asarray(rng.randn(cin, cout).astype(np.float32))
    q = quant.quantize_weight(w)
    g = jnp.asarray(rng.randn(rows, cout).astype(np.float32) * 0.1).astype(jnp.bfloat16)

    want = jnp.dot(
        (g.astype(jnp.float32) * q["scale"]).astype(jnp.bfloat16),
        q["w8"].astype(jnp.bfloat16).T,
    ).astype(jnp.bfloat16)
    got = quant.int8_matmul_t(g, q["w8"], q["scale"], interpret=True)
    assert got.dtype == g.dtype and got.shape == (rows, cin)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_apply_lora_attaches_on_int8_base():
    from vibevoice_tpu.finetune.lora import LoraConfig, apply_lora, init_lora

    params = vv.init(jax.random.PRNGKey(0), CFG)
    qlm = quant.quantize_lm(params["lm"], quantize_lm_head=False)
    qparams = {**params, "lm": qlm}
    lcfg = LoraConfig(r=4)
    lora = init_lora(jax.random.PRNGKey(1), qparams, lcfg)
    out = apply_lora(qparams, lora, lcfg)
    e = out["lm"]["layers"][0]["attn"]["q"]
    assert "lora" in e and "w8" in e and "w" not in e
    # dense diffusion head still merges
    assert "w" in out["diffusion_head"]["layers"][0]["ffn"]["gate"]


def test_qlora_train_step():
    """Full LoRA training step over the int8 base: loss finite and near the
    dense-base LoRA loss (per-channel int8 error only), adapters update."""
    from vibevoice_tpu.finetune.loss import Batch, TrainOptions
    from vibevoice_tpu.finetune.lora import LoraConfig, init_lora
    from vibevoice_tpu.finetune.train_step import (
        init_train_state,
        make_lora_train_step,
        make_optimizer,
    )

    full = dict(vv.init(jax.random.PRNGKey(0), CFG))
    full["speech_scaling_factor"] = jnp.asarray(float("nan"))
    full["speech_bias_factor"] = jnp.asarray(float("nan"))

    b, t, f = 2, 32, 4
    hop = CFG.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(0)
    am = np.zeros((b, t), bool)
    am[:, 8 : 8 + f] = True
    batch = Batch(
        input_ids=jnp.asarray(rng.randint(10, 100, (b, t)).astype(np.int32)),
        attention_mask=jnp.ones((b, t), bool),
        speech_tensors=jnp.asarray(rng.randn(b, hop * f).astype(np.float32)),
        speech_masks=jnp.ones((b, f), bool),
        speech_semantic_tensors=jnp.asarray(
            rng.randn(b, f, CFG.semantic_vae_dim).astype(np.float32)
        ),
        speeches_loss_input=jnp.ones((b,), bool),
        acoustic_input_mask=jnp.asarray(am),
        acoustic_loss_mask=jnp.asarray(am),
    )
    lcfg = LoraConfig(r=4)
    optimizer = make_optimizer(warmup_steps=1)

    # dense-base LoRA reference
    lora0 = init_lora(jax.random.PRNGKey(1), full, lcfg)
    dense_step = jax.jit(make_lora_train_step(CFG, optimizer, lcfg))
    dstate = init_train_state(lora0, optimizer)
    _, dout = dense_step(dstate, full, batch, jax.random.PRNGKey(2))

    # int8-base QLoRA — WITH remat + chunked CE (the 7B memory levers; remat
    # around a custom_vjp that closes over tracers leaks, so this pins the
    # explicit-primal formulation of _int8_matmul_dx)
    qparams = {**full, "lm": quant.quantize_lm(full["lm"], quantize_lm_head=False)}
    qstate = init_train_state(lora0, optimizer)
    qstep = jax.jit(
        make_lora_train_step(CFG, optimizer, lcfg, TrainOptions(remat=True, ce_chunk_size=8))
    )
    qstate, qout = qstep(qstate, qparams, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(qout.loss))
    np.testing.assert_allclose(float(qout.loss), float(dout.loss), rtol=0.05)

    # second step has lr > 0: the adapter B factors must move
    qstate, _ = qstep(qstate, qparams, batch, jax.random.PRNGKey(3))
    b_new = np.asarray(qstate.params["lm_layers"][0]["q"]["b"])
    b_old = np.asarray(lora0["lm_layers"][0]["q"]["b"])
    assert np.abs(b_new - b_old).max() > 0


def test_component_train_step_int8_base():
    """Head/connector fine-tune over a frozen int8 LM: jax.grad only sees
    the trained components (int8 leaves never enter the differentiated
    pytree), loss matches the dense-base filtered step, head params move."""
    from vibevoice_tpu.finetune.loss import Batch, TrainOptions
    from vibevoice_tpu.finetune.train_step import (
        build_trainable_filter,
        init_train_state,
        make_component_train_step,
        make_optimizer,
        make_train_step,
    )

    full = dict(vv.init(jax.random.PRNGKey(0), CFG))
    full["speech_scaling_factor"] = jnp.asarray(1.0)
    full["speech_bias_factor"] = jnp.asarray(0.0)

    b, t, f = 2, 32, 4
    hop = CFG.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(0)
    am = np.zeros((b, t), bool)
    am[:, 8 : 8 + f] = True
    batch = Batch(
        input_ids=jnp.asarray(rng.randint(10, 100, (b, t)).astype(np.int32)),
        attention_mask=jnp.ones((b, t), bool),
        speech_tensors=jnp.asarray(rng.randn(b, hop * f).astype(np.float32)),
        speech_masks=jnp.ones((b, f), bool),
        speech_semantic_tensors=jnp.asarray(
            rng.randn(b, f, CFG.semantic_vae_dim).astype(np.float32)
        ),
        speeches_loss_input=jnp.ones((b,), bool),
        acoustic_input_mask=jnp.asarray(am),
        acoustic_loss_mask=jnp.asarray(am),
    )
    optimizer = make_optimizer(warmup_steps=1)

    # dense reference: the filtered full step with the LM + embeds frozen
    nl = CFG.decoder_config.num_hidden_layers
    filt = build_trainable_filter(
        train_connectors=True, train_diffusion_head=True,
        lm_layers_to_freeze=tuple(range(nl)),
    )
    dense_step = jax.jit(make_train_step(CFG, optimizer, TrainOptions(), trainable_filter=filt))
    _, dout = dense_step(init_train_state(full, optimizer), batch, jax.random.PRNGKey(2))

    qparams = {**full, "lm": quant.quantize_lm(full["lm"], quantize_lm_head=False)}
    sub_keys = ("diffusion_head", "acoustic_connector", "semantic_connector")
    sub = {k: qparams[k] for k in sub_keys}
    frozen = {k: v for k, v in qparams.items() if k not in sub_keys}
    step = jax.jit(make_component_train_step(CFG, optimizer, TrainOptions()))
    state = init_train_state(sub, optimizer)
    state, out = step(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(out.loss))
    np.testing.assert_allclose(float(out.loss), float(dout.loss), rtol=0.05)

    state, _ = step(state, frozen, batch, jax.random.PRNGKey(3))  # lr > 0
    w_new = np.asarray(state.params["diffusion_head"]["layers"][0]["ffn"]["gate"]["w"])
    w_old = np.asarray(sub["diffusion_head"]["layers"][0]["ffn"]["gate"]["w"])
    assert np.abs(w_new - w_old).max() > 0
