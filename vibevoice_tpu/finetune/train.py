"""Fine-tuning CLI: `python -m vibevoice_tpu.finetune.train`.

Mirrors the reference trainer's argument surface
(reference vibevoice/finetune/train_vibevoice.py:98-159, FINETUNING.md):
LoRA or full fine-tune with CE + diffusion losses, EMA of the diffusion head,
checkpoint/resume, DP sharding over available devices.

With --synthetic_data it trains on generated sine-wave/text pairs so the
whole loop is exercisable without a corpus (smoke/integration mode).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import time
from typing import Optional

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    # model
    ap.add_argument("--model_path", type=str, default=None, help="HF-style checkpoint dir")
    ap.add_argument("--output_dir", type=str, default="./finetune_out")
    ap.add_argument("--use_lora", action="store_true")
    ap.add_argument("--lora_r", type=int, default=16)
    ap.add_argument("--lora_alpha", type=int, default=32)
    ap.add_argument("--lora_target_modules", nargs="*", default=["q", "k", "v", "o", "gate", "up", "down"])
    ap.add_argument("--train_diffusion_head", action="store_true", default=True)
    ap.add_argument("--lora_full_diffusion_head", action="store_true",
                    help="with --use_lora: train the diffusion head FULL-RANK "
                    "instead of via adapters (reference diffusion_head_full.bin)")
    # selective freeze/unfreeze (reference ModelArguments :107-122)
    ap.add_argument("--train_connectors", action="store_true")
    ap.add_argument("--train_acoustic_tokenizer", action="store_true",
                    help="unfreeze the acoustic tokenizer (reference freezes it by default)")
    ap.add_argument("--train_semantic_tokenizer", action="store_true")
    ap.add_argument("--train_embed", action="store_true",
                    help="unfreeze token embeddings (+tied lm_head)")
    ap.add_argument("--layers_to_freeze", type=str, default=None,
                    help="comma-separated diffusion-head LAYER indices to freeze, e.g. '0,1'")
    ap.add_argument("--lm_layers_to_freeze", type=str, default=None,
                    help="comma-separated LM layer indices to freeze")
    # data
    ap.add_argument("--dataset_jsonl", type=str, default=None, help="jsonl of {text, audio}")
    ap.add_argument("--synthetic_data", action="store_true")
    ap.add_argument("--voice_prompt_drop_rate", type=float, default=0.0)
    ap.add_argument("--max_length", type=int, default=2048)
    # optimization (reference CustomTrainingArguments)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--gradient_clipping", type=float, default=1.0)
    ap.add_argument("--warmup_steps", type=int, default=10)
    ap.add_argument("--max_steps", type=int, default=100)
    ap.add_argument("--per_device_batch_size", type=int, default=2)
    ap.add_argument("--ce_loss_weight", type=float, default=1.0)
    ap.add_argument("--diffusion_loss_weight", type=float, default=1.0)
    ap.add_argument("--ddpm_batch_mul", type=int, default=4)
    ap.add_argument("--ema_decay", type=float, default=0.999)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=1)
    ap.add_argument("--save_steps", type=int, default=50)
    ap.add_argument("--log_steps", type=int, default=10)
    ap.add_argument("--eval_steps", type=int, default=0, help="eval every N steps (0 = off)")
    ap.add_argument("--eval_split_size", type=float, default=0.0,
                    help="held-out fraction of the dataset for eval")
    ap.add_argument("--debug_ce_every_n_steps", type=int, default=0,
                    help="log CE token counts / max / argmax accuracy every N steps "
                    "(reference debug_ce_details)")
    ap.add_argument("--resume_from_checkpoint", type=str, default=None)
    ap.add_argument("--mesh_dcn", type=int, default=1,
                    help="data-parallel replicas across slices/hosts (DCN axis)")
    ap.add_argument("--mesh_dp", type=int, default=1, help="in-slice data parallelism (ICI)")
    ap.add_argument("--mesh_tp", type=int, default=1, help="in-slice tensor parallelism (ICI)")
    ap.add_argument("--int8_base", action="store_true",
                    help="QLoRA: store the frozen LM base int8 (requires "
                    "--use_lora); adapters run as low-rank branches beside "
                    "the int8 matmuls — 7B LoRA fine-tunes fit one 16 GB chip")
    ap.add_argument("--mesh_pp", type=int, default=1,
                    help="GPipe pipeline stages over a 'pp' mesh axis "
                    "(parallel/pipeline.py); composes with --mesh_dp, "
                    "exclusive with --mesh_tp/--mesh_dcn/--fsdp/--use_lora")
    ap.add_argument("--pp_microbatches", type=int, default=2,
                    help="micro-batches per step in the pipeline; "
                    "per_device_batch_size must divide by this")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-3: shard params + optimizer state over the dp "
                    "axis on top of the TP plan (parallel/mesh.py "
                    "fsdp_param_shardings); XLA all-gathers weights "
                    "just-in-time and reduce-scatters gradients")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() (run one process per host)")
    ap.add_argument("--checkpoint_format", type=str, default="pickle",
                    choices=["pickle", "orbax"],
                    help="orbax = sharded multi-host checkpoints (utils/checkpoint.py)")
    ap.add_argument("--pad_to_multiple", type=int, default=None,
                    help="pad batch sequence length to a multiple (default: 512 on "
                    "TPU so the differentiable flash-attention kernel engages; "
                    "unpadded elsewhere)")
    ap.add_argument("--remat", action="store_true",
                    help="gradient checkpointing over LM layers + diffusion head "
                    "(fits 1.5B fine-tunes at multi-K sequence lengths on 16 GB)")
    ap.add_argument("--ce_chunk_size", type=int, default=0,
                    help="compute CE logits in sequence chunks of this many tokens "
                    "(0 = dense); avoids the (B,T,vocab) float32 logits buffer")
    ap.add_argument("--remat_policy", type=str, default=None, choices=[None, "dots"],
                    help="with --remat: 'dots' keeps matmul outputs and recomputes "
                    "only elementwise work in backward (faster, more memory)")
    ap.add_argument("--head_budget", type=int, default=0,
                    help="diffusion-head position budget K: the head runs on the "
                    "first K speech positions per sample instead of all T "
                    "(~T/8 are speech, so the dense head wastes ~8x its FLOPs). "
                    "Bit-exact when K covers every sample's target frames — "
                    "checked per batch on the host. 0 = dense")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--report_to", type=str, default=None, choices=[None, "wandb"],
                    help="metric sink (reference routes Trainer logs to wandb)")
    ap.add_argument("--run_name", type=str, default="vibevoice-tpu-finetune")
    return ap.parse_args()


def synthetic_dataset(n: int = 64, seed: int = 0, min_dur: float = 1.0, max_dur: float = 3.0):
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        dur = rng.uniform(min_dur, max_dur)
        t = np.arange(max(int(dur * 24_000), 64)) / 24_000
        f = rng.uniform(80, 300)
        wav = (0.1 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        items.append({"text": f"Speaker 1: synthetic sample number {i}", "audio": wav})
    return items


def main():
    args = parse_args()
    import jax

    if args.multihost:
        # one process per host; JAX wires the coordination service from the
        # TPU pod metadata (multi-slice: DCN across slices)
        jax.distributed.initialize()
    import jax.numpy as jnp

    from ..configs import tiny_config
    from ..models import vibevoice as vv
    from .data import VibeVoiceCollator, VibeVoiceDataset, make_semantic_encode_fn
    from .ema import init_ema, swap_in_ema, update_ema
    from .loss import TrainOptions
    from .lora import LoraConfig, init_lora, merge_lora, save_lora_assets
    from .train_step import (
        build_trainable_filter,
        init_train_state,
        make_eval_step,
        make_lora_train_step,
        make_optimizer,
        make_train_step,
    )

    np.random.seed(args.seed)

    if args.model_path:
        from ..utils.hf_interop import load_checkpoint

        cfg, params, processor = load_checkpoint(args.model_path, dtype="float32")
    else:
        print("No --model_path: tiny random-weight model (smoke mode)")
        from ..processor.processor import VibeVoiceProcessor
        from ..processor.text_tokenizer import FallbackTextTokenizer

        cfg = tiny_config()
        params = vv.init(jax.random.PRNGKey(args.seed), cfg)
        params = dict(params)
        params["speech_scaling_factor"] = jnp.asarray(float("nan"))
        params["speech_bias_factor"] = jnp.asarray(float("nan"))
        processor = VibeVoiceProcessor(
            tokenizer=FallbackTextTokenizer(),
            speech_tok_compress_ratio=cfg.acoustic_tokenizer_config.hop_length,
        )

    if args.int8_base:
        # QLoRA: the frozen LM base stores int8 (ops/quant.py); adapters
        # attach as runtime low-rank branches (finetune/lora._apply_entry).
        # ~4x less base-weight HBM — a 7B LoRA fine-tune fits ONE v5e chip.
        if not args.use_lora:
            raise SystemExit("--int8_base requires --use_lora (the base is frozen)")
        if args.mesh_dcn * args.mesh_dp * args.mesh_tp * args.mesh_pp > 1:
            # the TP/FSDP sharding tables map dense 'w' leaves; int8 QLoRA is
            # the SINGLE-chip 7B story (that is its whole point)
            raise SystemExit("--int8_base is a single-chip path (no mesh flags)")
        from ..ops.quant import quantize_lm

        params = dict(params)
        params["lm"] = quantize_lm(params["lm"], quantize_lm_head=False)
        print("int8 base: LM linears quantized (QLoRA)")

    # ---- device mesh (DCN x DP x TP, or DP x PP pipeline) ----------------
    if args.fsdp and args.mesh_dcn * args.mesh_dp == 1:
        raise SystemExit(
            "--fsdp shards parameters/optimizer state over the data axis; "
            "it needs --mesh_dp (or --mesh_dcn) > 1 to do anything"
        )
    mesh = None
    n_data_shards = 1
    lm_forward = None
    if args.mesh_pp > 1:
        if args.mesh_tp > 1 or args.mesh_dcn > 1 or args.fsdp or args.use_lora:
            raise SystemExit("--mesh_pp composes only with --mesh_dp (full fine-tune)")
        if args.lm_layers_to_freeze:
            # per-layer freeze paths assume the list layout, not layers_stacked
            raise SystemExit("--lm_layers_to_freeze is not supported with --mesh_pp")
        if args.per_device_batch_size % args.pp_microbatches:
            raise SystemExit(
                f"--per_device_batch_size {args.per_device_batch_size} must divide "
                f"by --pp_microbatches {args.pp_microbatches}"
            )
        from ..parallel import mesh as pmesh
        from ..parallel import pipeline as pl

        mesh = pl.make_pp_mesh(pp=args.mesh_pp, dp=args.mesh_dp)
        params["lm"] = pl.stack_layers(params["lm"], args.mesh_pp)
        params = jax.device_put(params, pl.pp_model_param_shardings(params, mesh))
        lm_forward = pl.make_pp_lm_forward(mesh, n_microbatches=args.pp_microbatches)
        n_data_shards = args.mesh_dp
        print(f"mesh: {dict(mesh.shape)} ({args.pp_microbatches} micro-batches)")
    elif args.mesh_dcn * args.mesh_dp * args.mesh_tp > 1:
        from ..parallel import mesh as pmesh

        if args.mesh_dcn > 1:
            mesh = pmesh.make_hybrid_mesh(dcn=args.mesh_dcn, dp=args.mesh_dp, tp=args.mesh_tp)
        else:
            mesh = pmesh.make_mesh(dp=args.mesh_dp, tp=args.mesh_tp)
        shardings = (
            pmesh.fsdp_param_shardings(params, mesh)
            if args.fsdp
            else pmesh.model_param_shardings(params, mesh)
        )
        params = pmesh.shard_params(params, shardings)
        n_data_shards = args.mesh_dcn * args.mesh_dp
        print(
            f"mesh: {dict(mesh.shape)} ({n_data_shards} data shards"
            f"{', fsdp' if args.fsdp else ''})"
        )

    smoke = args.model_path is None
    if args.dataset_jsonl:
        with open(args.dataset_jsonl) as f:
            raw = [json.loads(l) for l in f if l.strip()]
    elif smoke:
        # tiny tokenizer (hop 8): keep clips tens of frames long
        raw = synthetic_dataset(min_dur=0.005, max_dur=0.02)
    else:
        raw = synthetic_dataset()

    eval_raw = []
    if args.eval_split_size > 0:
        n_eval = max(1, int(len(raw) * args.eval_split_size))
        eval_raw, raw = raw[:n_eval], raw[n_eval:]
    dataset = VibeVoiceDataset(raw, seed=args.seed)
    eval_dataset = VibeVoiceDataset(eval_raw, seed=args.seed) if eval_raw else None

    collator = VibeVoiceCollator(
        processor=processor,
        semantic_encode_fn=make_semantic_encode_fn(
            cfg.semantic_tokenizer_config, params["semantic_tokenizer"]
        ),
        max_length=args.max_length,
        speech_compress_ratio=cfg.acoustic_tokenizer_config.hop_length,
        semantic_vae_dim=cfg.semantic_vae_dim,
        voice_prompt_drop_rate=args.voice_prompt_drop_rate,
        pre_silence_sec=0.0005 if smoke else 0.25,
        post_silence_sec=0.0015 if smoke else 0.75,
        crossfade_sec=0.0005 if smoke else 0.25,
        seed=args.seed,
        pad_to_multiple=(
            args.pad_to_multiple
            if args.pad_to_multiple is not None
            else (512 if jax.default_backend() == "tpu" else None)
        ),
    )

    opts = TrainOptions(
        ce_loss_weight=args.ce_loss_weight,
        diffusion_loss_weight=args.diffusion_loss_weight,
        ddpm_batch_mul=args.ddpm_batch_mul,
        remat=args.remat,
        ce_chunk_size=args.ce_chunk_size,
        remat_policy=args.remat_policy,
        head_position_budget=args.head_budget,
    )
    def parse_idx(s):
        return tuple(int(x) for x in s.split(",") if x.strip()) if s else ()

    trainable = None
    if not args.use_lora:
        trainable = build_trainable_filter(
            freeze_acoustic_tokenizer=not args.train_acoustic_tokenizer,
            freeze_semantic_tokenizer=not args.train_semantic_tokenizer,
            train_connectors=args.train_connectors,
            train_diffusion_head=args.train_diffusion_head,
            head_layers_to_freeze=parse_idx(args.layers_to_freeze),
            freeze_embed=not args.train_embed,
            lm_layers_to_freeze=parse_idx(args.lm_layers_to_freeze),
        )

    optimizer = make_optimizer(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        grad_clip=args.gradient_clipping,
        warmup_steps=args.warmup_steps,
        total_steps=args.max_steps,
        accumulation_steps=args.gradient_accumulation_steps,
        trainable_filter=trainable,
    )

    lora_cfg = None
    if args.use_lora:
        lora_cfg = LoraConfig(
            r=args.lora_r,
            alpha=args.lora_alpha,
            target_modules=tuple(args.lora_target_modules),
            train_diffusion_head=args.train_diffusion_head,
            train_connectors=args.train_connectors,
            full_diffusion_head=args.lora_full_diffusion_head,
        )
        lora = init_lora(jax.random.PRNGKey(args.seed + 1), params, lora_cfg)
        state = init_train_state(lora, optimizer)
        step_fn = jax.jit(make_lora_train_step(cfg, optimizer, lora_cfg, opts))
    else:
        state = init_train_state(params, optimizer)
        step_fn = jax.jit(make_train_step(cfg, optimizer, opts, trainable_filter=trainable,
                                          lm_forward=lm_forward))

    eval_fn = (
        jax.jit(make_eval_step(cfg, opts, lm_forward=lm_forward))
        if eval_dataset is not None
        else None
    )

    ema = init_ema(params["diffusion_head"])
    start_step = 0
    if args.resume_from_checkpoint:
        if args.checkpoint_format == "orbax":
            from ..utils.checkpoint import restore_train_state

            blob = restore_train_state(
                os.path.join(args.resume_from_checkpoint, "orbax"),
                {"state": state, "ema": ema, "step": np.zeros((), np.int32)},
            )
            state, ema, start_step = blob["state"], blob["ema"], int(blob["step"])
        else:
            with open(os.path.join(args.resume_from_checkpoint, "train_state.pkl"), "rb") as f:
                blob = pickle.load(f)
            state = jax.tree.map(jnp.asarray, blob["state"])
            ema = jax.tree.map(jnp.asarray, blob["ema"])
            start_step = int(blob["step"])
        print(f"Resumed from step {start_step}")

    wandb_run = None
    if args.report_to == "wandb":
        try:
            import wandb

            wandb_run = wandb.init(project="vibevoice-tpu", name=args.run_name,
                                   config=vars(args))
        except ImportError:
            print("wandb not installed; falling back to stdout logging")

    key = jax.random.PRNGKey(args.seed + 2)
    bs = args.per_device_batch_size * n_data_shards  # global batch

    # startup tokenizer/CE smoke test (reference train_vibevoice.py:344-362):
    # one collated batch must produce a finite CE before burning train time
    from .train_step import make_eval_step as _mes

    if lm_forward is not None:
        # the pipeline needs the full (micro-batch-divisible) global batch
        probe = collator([dataset[i % len(dataset)] for i in range(bs)])
        from ..parallel import mesh as pmesh

        probe = jax.device_put(probe, pmesh.batch_shardings(mesh, probe))
    else:
        probe = collator([dataset[i] for i in range(min(bs, len(dataset)))])
    probe_out = _mes(cfg, opts, lm_forward=lm_forward)(
        state.params if not args.use_lora else merge_lora(params, state.params, lora_cfg),
        probe,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(probe_out.ce_loss)), "startup CE smoke test failed (non-finite)"
    print(
        f"startup smoke: ce={float(probe_out.ce_loss):.4f} over "
        f"{int(probe_out.ce_token_count)} tokens, "
        f"{int(probe_out.speech_frame_count)} diffusion frames"
    )

    lora_init_snapshot = None
    if args.use_lora:
        lora_init_snapshot = jax.tree.map(np.asarray, state.params)

    t0 = time.time()

    def save(step):
        out = os.path.join(args.output_dir, f"checkpoint-{step}")
        os.makedirs(out, exist_ok=True)
        if args.checkpoint_format == "orbax":
            # sharded multi-host save: every host writes only the shards it
            # owns; no full-model host gather (7B+ safe)
            from ..utils.checkpoint import save_train_state

            save_train_state(
                os.path.join(out, "orbax"),
                {"state": state, "ema": ema, "step": np.asarray(step, np.int32)},
            )
        else:
            host_state = jax.tree.map(np.asarray, state)
            with open(os.path.join(out, "train_state.pkl"), "wb") as f:
                pickle.dump(
                    {"state": host_state, "ema": jax.tree.map(np.asarray, ema), "step": step}, f
                )
        if args.use_lora:
            save_lora_assets(os.path.join(out, "lora"), state.params, lora_cfg)
        else:
            from ..utils.hf_interop import save_native

            # EMA head swapped in at save (reference EmaCallback :86-95)
            export = swap_in_ema(state.params, ema)
            if args.mesh_pp > 1:
                # checkpoints always use the per-layer list layout
                from ..parallel import pipeline as pl

                export = dict(export)
                export["lm"] = pl.unstack_layers(export["lm"])
            save_native(out, cfg, export)
        print(f"saved {out}")

    steps_per_epoch = max(1, len(dataset) // bs)
    order_cache = {}

    def build_batch(step):
        """Collate the batch for `step` — pure in `step` (per-epoch seeded
        permutation), so it can run on the prefetch thread and stays
        deterministic across resume (HF Trainer reshuffles per epoch)."""
        epoch = step // steps_per_epoch
        if epoch not in order_cache:
            order_cache.clear()  # only the current epoch's order is live
            order_cache[epoch] = np.random.RandomState(args.seed + epoch).permutation(len(dataset))
        order = order_cache[epoch]
        idx = order[(step * bs) % len(order) : (step * bs) % len(order) + bs]
        if len(idx) < bs:
            idx = order[:bs]
        batch = collator([dataset[int(i)] for i in idx])
        if args.head_budget:
            # the budgeted diffusion head silently drops positions past K —
            # refuse the batch instead (same spirit as the collator's
            # truncation-into-acoustic-tokens hard error)
            per_sample = np.asarray(batch.acoustic_loss_mask).sum(axis=1).max()
            if per_sample > args.head_budget:
                raise SystemExit(
                    f"--head_budget {args.head_budget} < {per_sample} target "
                    f"frames in a sample; raise the budget or crop targets"
                )
        if mesh is not None:
            from ..parallel import mesh as pmesh

            batch = jax.device_put(batch, pmesh.batch_shardings(mesh, batch))
        return batch

    # one-batch-ahead prefetch: audio load/resample/crossfade + semantic
    # encode overlap the device step (the reference gets this from HF
    # Trainer's multi-worker DataLoader)
    from concurrent.futures import ThreadPoolExecutor

    prefetcher = ThreadPoolExecutor(max_workers=1)
    pending = prefetcher.submit(build_batch, start_step)

    for step in range(start_step, args.max_steps):
        batch = pending.result()
        if step + 1 < args.max_steps:
            pending = prefetcher.submit(build_batch, step + 1)
        key, sk = jax.random.split(key)
        if args.use_lora:
            state, out = step_fn(state, params, batch, sk)
            head = merge_lora(params, state.params, lora_cfg)["diffusion_head"]
        else:
            state, out = step_fn(state, batch, sk)
            head = state.params["diffusion_head"]
        # EMA tracks optimizer updates, not accumulation micro-steps
        if (step + 1) % args.gradient_accumulation_steps == 0:
            ema = update_ema(ema, head, args.ema_decay)

        if args.use_lora and step == start_step and lora_init_snapshot is not None:
            # adapter-actually-changed diagnostic (reference LoRADebugCallback,
            # train_vibevoice.py:545-603); with accumulation the first update
            # lands at the k-th micro-step, so only warn when it should have
            if args.gradient_accumulation_steps == 1:
                now = jax.tree.map(np.asarray, state.params)
                flat_a = jax.tree_util.tree_leaves(lora_init_snapshot)
                flat_b = jax.tree_util.tree_leaves(now)
                changed = sum(int(not np.allclose(a, b)) for a, b in zip(flat_a, flat_b))
                print(f"lora debug: {changed}/{len(flat_b)} adapter tensors changed after step 1")
                if changed == 0:
                    print("WARNING: no LoRA adapter changed after the first step")

        if args.debug_ce_every_n_steps and (step + 1) % args.debug_ce_every_n_steps == 0:
            print(
                f"  ce-debug step {step + 1}: {int(out.ce_token_count)} CE tokens, "
                f"max token CE {float(out.ce_max):.3f}, "
                f"argmax acc {float(out.ce_accuracy):.3f}, "
                f"{int(out.speech_frame_count)} diffusion frames"
            )

        if eval_fn is not None and args.eval_steps and (step + 1) % args.eval_steps == 0:
            eval_params = (
                merge_lora(params, state.params, lora_cfg) if args.use_lora else state.params
            )
            e_losses = []
            for e0 in range(0, len(eval_dataset), bs):
                items = [eval_dataset[j] for j in range(e0, min(e0 + bs, len(eval_dataset)))]
                if len(items) < bs:
                    items += [eval_dataset[0]] * (bs - len(items))
                eo = eval_fn(eval_params, collator(items), jax.random.PRNGKey(1234))
                e_losses.append((float(eo.ce_loss), float(eo.diffusion_loss)))
            ce_e = sum(x for x, _ in e_losses) / len(e_losses)
            df_e = sum(x for _, x in e_losses) / len(e_losses)
            print(f"  eval step {step + 1}: ce={ce_e:.4f} diffusion={df_e:.4f}")
            if wandb_run is not None:
                wandb_run.log({"eval_ce": ce_e, "eval_diffusion": df_e}, step=step + 1)

        if (step + 1) % args.log_steps == 0 or step == start_step:
            metrics = {
                "loss": float(out.loss),
                "ce_loss": float(out.ce_loss),
                "diffusion_loss": float(out.diffusion_loss),
                "sec_per_step": (time.time() - t0) / (step - start_step + 1),
            }
            print(
                f"step {step + 1}/{args.max_steps} "
                f"loss={metrics['loss']:.4f} ce={metrics['ce_loss']:.4f} "
                f"diff={metrics['diffusion_loss']:.4f} "
                f"({metrics['sec_per_step']:.2f}s/step)"
            )
            if wandb_run is not None:
                wandb_run.log(metrics, step=step + 1)
        if (step + 1) % args.save_steps == 0:
            save(step + 1)

    prefetcher.shutdown(wait=False, cancel_futures=True)
    if args.max_steps % args.save_steps != 0 or start_step >= args.max_steps:
        save(args.max_steps)
    print("done")


if __name__ == "__main__":
    main()
