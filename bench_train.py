"""Benchmark: single-chip fine-tuning throughput on the flagship 1.5B config.

Times one full LoRA fine-tune step (the reference's primary training path,
reference finetune/train_vibevoice.py): acoustic VAE encode of the target
audio, connector splice, full-sequence LM forward, chunked CE + per-token
diffusion loss, backward, AdamW update of the adapters — as ONE jitted
program with donated optimizer state.

Memory levers that make this fit a 16 GB v5e at real sequence lengths:
  * remat over the 28 LM layers + diffusion head (TrainOptions.remat)
  * chunked CE (TrainOptions.ce_chunk_size) — the dense (B,T,152K) float32
    logits would be 2.5 GB per 4K-token sample

Env overrides:
  BENCH_TRAIN_CONFIG=f   config json (default qwen2.5_1.5b_64k.json;
                         qwen2.5_7b_32k.json for the 7B)
  BENCH_TRAIN_INT8=1     QLoRA: int8 frozen LM base + LoRA branches — the
                         7B single-chip fine-tune config (lora mode only)
  BENCH_TRAIN_SEQ=N      sequence length (default 2048)
  BENCH_TRAIN_BATCH=N    batch size (default 2)
  BENCH_TRAIN_FRAMES=N   target speech frames per sample (default SEQ//8;
                         each frame also costs an acoustic encode of 3200
                         wav samples inside the step)
  BENCH_TRAIN_STEPS=N    timed steps (default 4, best-of)
  BENCH_TRAIN_MODE=...   "lora" (default) | "head" (diffusion head +
                         connectors full fine-tune, LM frozen)
  BENCH_TRAIN_CE_CHUNK=N CE chunk tokens (default 1024)
  BENCH_TRAIN_REMAT_POLICY=dots  save matmul outputs in remat (faster
                         backward, more memory)
  BENCH_TRAIN_HEAD_BUDGET=N|auto  diffusion-head position budget (gather the
                         speech positions before the head; auto = frames
                         rounded up to 64). 0/unset = dense head

Prints one JSON line per metric (tokens/s headline, then step time + MFU).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_synthetic_batch(cfg, b, t, frames, seed=0):
    import numpy as np
    import jax.numpy as jnp
    from vibevoice_tpu.finetune.loss import Batch

    hop = cfg.acoustic_tokenizer_config.hop_length
    rng = np.random.RandomState(seed)
    ids = rng.randint(10, 1000, (b, t)).astype(np.int32)
    ain = np.zeros((b, t), bool)
    start = max(1, t // 4)
    ain[:, start : start + frames] = True
    return Batch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((b, t), bool),
        speech_tensors=jnp.asarray(0.05 * rng.randn(b, hop * frames).astype(np.float32)),
        speech_masks=jnp.ones((b, frames), bool),
        speech_semantic_tensors=jnp.asarray(
            rng.randn(b, frames, cfg.semantic_vae_dim).astype(np.float32)
        ),
        speeches_loss_input=jnp.ones((b,), bool),
        acoustic_input_mask=jnp.asarray(ain),
        acoustic_loss_mask=jnp.asarray(ain),
    )


def lm_matmul_params(dc):
    """Matmul parameter count of the decoder stack (per-token FLOPs = 2x this
    forward); embeddings excluded, logits counted separately."""
    h, i = dc.hidden_size, dc.intermediate_size
    kh = dc.num_key_value_heads * dc.head_dim
    qh = dc.num_attention_heads * dc.head_dim
    per_layer = h * qh + 2 * h * kh + qh * h + 3 * h * i
    return dc.num_hidden_layers * per_layer


def main():
    from vibevoice_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vibevoice_tpu.configs import VibeVoiceConfig
    from vibevoice_tpu.finetune.loss import TrainOptions
    from vibevoice_tpu.finetune.lora import LoraConfig, init_lora
    from vibevoice_tpu.finetune.train_step import (
        TrainState,
        build_trainable_filter,
        init_train_state,
        make_lora_train_step,
        make_optimizer,
        make_train_step,
    )
    from vibevoice_tpu.models import vibevoice as vv

    t = int(os.environ.get("BENCH_TRAIN_SEQ", "2048"))
    b = int(os.environ.get("BENCH_TRAIN_BATCH", "2"))
    frames = int(os.environ.get("BENCH_TRAIN_FRAMES", str(max(8, t // 8))))
    n_steps = int(os.environ.get("BENCH_TRAIN_STEPS", "4"))
    mode = os.environ.get("BENCH_TRAIN_MODE", "lora")
    ce_chunk = int(os.environ.get("BENCH_TRAIN_CE_CHUNK", "1024"))
    cfg_name = os.environ.get("BENCH_TRAIN_CONFIG", "qwen2.5_1.5b_64k.json")
    int8_base = os.environ.get("BENCH_TRAIN_INT8") == "1"
    model_tag = "7B" if "7b" in cfg_name else "1.5B"

    if int8_base:
        # QLoRA: the frozen LM base lives int8 from the start (7B bf16 is
        # 14 GB — it must never materialise; bench._load inits layer-by-layer
        # straight into int8). The lm_head stays DENSE bf16: CE gradients
        # flow through the logits matmul into the hidden states.
        if mode not in ("lora", "head"):
            raise SystemExit("BENCH_TRAIN_INT8=1 requires BENCH_TRAIN_MODE=lora|head")
        import bench as _bench

        cfg, params = _bench._load(cfg_name, lm_int8_inline=True)
        params = dict(params)
        params.pop("lm_head_q", None)
        params["lm"] = dict(params["lm"])
        params["lm"].pop("lm_head_q", None)
        dc = cfg.decoder_config
        if not dc.tie_word_embeddings:
            params["lm_head"] = (
                jax.random.normal(jax.random.PRNGKey(9), (dc.vocab_size, dc.hidden_size),
                                  jnp.bfloat16) * dc.initializer_range
            )
        model_tag += "_int8base"
    else:
        cfg = VibeVoiceConfig.from_json_file(
            os.path.join(os.path.dirname(__file__), "vibevoice_tpu", "configs", cfg_name)
        )
        params = dict(vv.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)

    hb_env = os.environ.get("BENCH_TRAIN_HEAD_BUDGET", "0")
    head_budget = (-(-frames // 64) * 64) if hb_env == "auto" else int(hb_env)
    opts = TrainOptions(remat=True, ce_chunk_size=ce_chunk,
                    remat_policy=os.environ.get("BENCH_TRAIN_REMAT_POLICY") or None,
                    head_position_budget=head_budget)
    batch = make_synthetic_batch(cfg, b, t, frames)
    key = jax.random.PRNGKey(1)

    if mode == "lora":
        lcfg = LoraConfig()
        lora = init_lora(jax.random.PRNGKey(2), params, lcfg)
        optimizer = make_optimizer(total_steps=1000)
        raw_step = make_lora_train_step(cfg, optimizer, lcfg, opts)
        state = init_train_state(lora, optimizer)
        step = jax.jit(raw_step, donate_argnums=0)

        def run(state, k):
            return step(state, params, batch, k)

    elif mode == "head" and int8_base:
        # head/connector fine-tune over the frozen int8 LM: grads only for
        # the trained components (jax.grad never sees the int8 leaves)
        from vibevoice_tpu.finetune.train_step import make_component_train_step

        sub_keys = ("diffusion_head", "acoustic_connector", "semantic_connector")
        sub = {k: params[k] for k in sub_keys}
        frozen = {k: v for k, v in params.items() if k not in sub_keys}
        optimizer = make_optimizer(total_steps=1000)
        raw_step = make_component_train_step(cfg, optimizer, opts)
        state = init_train_state(sub, optimizer)
        step = jax.jit(raw_step, donate_argnums=0)

        def run(state, k):
            return step(state, frozen, batch, k)

    elif mode == "head":
        trainable = build_trainable_filter(train_connectors=True, train_diffusion_head=True,
                                           lm_layers_to_freeze=tuple(range(cfg.decoder_config.num_hidden_layers)))
        optimizer = make_optimizer(total_steps=1000, trainable_filter=trainable)
        raw_step = make_train_step(cfg, optimizer, opts, trainable_filter=trainable)
        state = init_train_state(params, optimizer)
        step = jax.jit(raw_step, donate_argnums=0)

        def run(state, k):
            return step(state, batch, k)

    else:
        raise SystemExit(f"unknown BENCH_TRAIN_MODE={mode}")

    # compile + warmup (first-batch stats init makes step 0 unrepresentative)
    for _ in range(2):
        key, sk = jax.random.split(key)
        state, out = run(state, sk)
    float(np.asarray(out.loss))

    wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = state
        for _ in range(n_steps):
            key, sk = jax.random.split(key)
            s, out = run(s, sk)
        float(np.asarray(out.loss))  # force the chain
        wall = min(wall, (time.perf_counter() - t0))
        state = s
    step_sec = wall / n_steps

    tokens_per_step = b * t
    tok_s = tokens_per_step / step_sec

    # Approximate model FLOPs per step (matmuls only, fwd 2PT):
    #   backward-through-inputs 2PT + weight-grads 2PT (LoRA still computes
    #   the merged-weight grad before contracting to the factors) + remat
    #   re-forward 2PT -> 8PT total; CE logits fwd+bwd+remat ~ 6x; the
    #   acoustic encoder runs forward-only under stop_gradient (counted 2x).
    dc = cfg.decoder_config
    p_lm = lm_matmul_params(dc)
    p_logits = dc.hidden_size * dc.vocab_size
    hcfg = cfg.diffusion_head_config
    p_head = hcfg.head_layers * (
        3 * hcfg.hidden_size * int(hcfg.hidden_size * hcfg.head_ffn_ratio)
        + 4 * hcfg.hidden_size * hcfg.hidden_size
    )
    # QLoRA (int8 base): no base weight-grads exist — the custom VJP computes
    # only dx — so the LM costs fwd 2 + bwd-dx 2 + remat 2 = 6PT, not 8PT
    lm_factor = 6 if int8_base else 8
    # attention score/value matmuls: fwd = 2 * 2 * qh * T_causal per token
    # with T_causal ~ T/2 (both the masked path's DCE'd upper triangle and
    # the flash kernel's skipped blocks); bwd ~ 2x fwd, remat re-fwd 1x
    qh = dc.num_attention_heads * dc.head_dim
    attn_per_tok = dc.num_hidden_layers * 2 * qh * t  # = 4*qh*(T/2)
    # acoustic encoder forward (stop_gradient): dominated by the conv stack
    # at the wav-sample rate; count 2 * conv-params * samples as a floor
    enc_flops = 0.0
    if frames:
        acfg = cfg.acoustic_tokenizer_config
        # rough conv MAC model: channels double per downsample stage from
        # n_filters at the full 24 kHz rate; the first stages dominate
        c, rate, total_macs = acfg.encoder_n_filters, b * frames * acfg.hop_length, 0
        for ratio in acfg.encoder_ratios[::-1]:
            total_macs += rate * c * c * 7  # depthwise/mixer + MLP floor
            rate //= ratio
            c *= 2
        enc_flops = 2 * 2 * total_macs  # 2 flops/MAC, ~2 blocks deep/stage
    flops = (
        (lm_factor * p_lm + 4 * attn_per_tok) * tokens_per_step  # attn: fwd+refwd+2x bwd
        + 6 * p_logits * tokens_per_step
        + 8 * p_head * b * (head_budget or t) * opts.ddpm_batch_mul
        + enc_flops
    )
    mfu = flops / step_sec / 197e12  # v5e bf16 peak 197 TFLOP/s

    lines = [
        {
            "metric": f"train_tokens_per_sec_{model_tag}_{mode}_T{t}_B{b}",
            "value": round(tok_s, 1),
            "unit": "tokens/s/chip",
            "step_ms": round(step_sec * 1e3, 1),
            "mfu_pct": round(100 * mfu, 1),
            "speech_frames_per_step": b * frames,
            "audio_sec_per_sec": round(b * frames * (3200 / 24_000) / step_sec, 2),
        }
    ]
    for line in lines:
        print(json.dumps(line))


if __name__ == "__main__":
    main()
