"""Merge trained LoRA adapters / component overrides into a base checkpoint.

Parity with reference vibevoice/scripts/merge_vibevoice_models.py:30-262:
detects trained components, merges LM LoRA (attention AND MLP projections),
merges diffusion-head adapters or swaps in the full-head override, swaps in
trained connectors from extras.pkl, then VERIFIES the merge — every adapted
weight equals base + (alpha/r)*A@B (and actually changed when the delta is
nonzero), and every overridden tensor exactly matches the trained one —
before saving.

Usage:
  python -m vibevoice_tpu.scripts.merge_vibevoice_models \
      --base_model <ckpt dir> --trained_checkpoint <finetune_out/checkpoint-N> \
      --output_dir merged/
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _verify_adapted(tag, base_entry, merged_entry, pair, scaling, rtol, atol):
    """merged == base + scaling*A@B, and changed iff the delta is nonzero.
    Returns (changed, unchanged) counts (reference :171-254)."""
    b_np = np.asarray(base_entry["w"], np.float32)
    m_np = np.asarray(merged_entry["w"], np.float32)
    delta = np.asarray(pair["a"] @ pair["b"], np.float32) * scaling
    if np.abs(delta).max() > 0:
        assert not np.allclose(b_np, m_np, rtol=rtol, atol=atol), (
            f"{tag}: merge produced no weight change despite nonzero delta"
        )
        changed = 1
    else:
        changed = 0
    np.testing.assert_allclose(
        m_np, b_np + delta, rtol=rtol, atol=max(atol, 1e-6), err_msg=tag
    )
    return changed, 1 - changed


def merge_and_verify(params, merged, lora, lora_cfg, extras=None, rtol=1e-5, atol=1e-8):
    """Verify `merged` against base `params` + adapters/overrides. Returns a
    dict of counters; raises on any mismatch."""
    changed = unchanged = 0
    for li, (base_l, merged_l, entry) in enumerate(
        zip(params["lm"]["layers"], merged["lm"]["layers"], lora["lm_layers"])
    ):
        for group, names in (("attn", ("q", "k", "v", "o")), ("mlp", ("gate", "up", "down"))):
            for name in names:
                if name not in entry:
                    continue
                c, u = _verify_adapted(
                    f"lm layer {li} {group}.{name}",
                    base_l[group][name], merged_l[group][name],
                    entry[name], lora_cfg.scaling, rtol, atol,
                )
                changed += c
                unchanged += u

    head_changed = head_unchanged = 0
    if "diffusion_head_layers" in lora:
        for li, (base_l, merged_l, entry) in enumerate(
            zip(
                params["diffusion_head"]["layers"],
                merged["diffusion_head"]["layers"],
                lora["diffusion_head_layers"],
            )
        ):
            for name in ("gate", "up", "down"):
                c, u = _verify_adapted(
                    f"diffusion_head layer {li} ffn.{name}",
                    base_l["ffn"][name], merged_l["ffn"][name],
                    entry[name], lora_cfg.scaling, rtol, atol,
                )
                head_changed += c
                head_unchanged += u

    # overridden components: merged tensors must EXACTLY match the trained
    # ones (reference exact-match verification of connector/full-head
    # overrides, merge_vibevoice_models.py:171-254)
    overridden = []
    for key, trained in (extras or {}).items():
        import jax

        m_leaves = jax.tree_util.tree_leaves_with_path(merged[key])
        t_flat = dict(jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, trained)))
        assert len(m_leaves) == len(t_flat), (
            f"{key}: override structure mismatch ({len(m_leaves)} vs {len(t_flat)} tensors)"
        )
        for path, leaf in m_leaves:
            np.testing.assert_array_equal(
                np.asarray(leaf), t_flat[path],
                err_msg=f"override {key}{jax.tree_util.keystr(path)} not exactly the trained tensor",
            )
        overridden.append(key)

    return {
        "lm_changed": changed,
        "lm_unchanged": unchanged,
        "head_changed": head_changed,
        "head_unchanged": head_unchanged,
        "overridden": overridden,
    }


def run_merge(base_model, trained_checkpoint, output_dir, rtol=1e-5, atol=1e-8):
    import jax
    import jax.numpy as jnp

    from ..finetune.lora import LoraConfig, apply_lora
    from ..utils.hf_interop import load_checkpoint, load_native, save_native

    if os.path.exists(os.path.join(base_model, "params.pkl")):
        cfg, params = load_native(base_model)
    else:
        cfg, params, _ = load_checkpoint(base_model, dtype="float32")

    lora_dir = trained_checkpoint
    if os.path.isdir(os.path.join(lora_dir, "lora")):
        lora_dir = os.path.join(lora_dir, "lora")
    with open(os.path.join(lora_dir, "lora_adapters.pkl"), "rb") as f:
        blob = pickle.load(f)
    lora_cfg = LoraConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in blob["config"].items()}
    )
    lora = jax.tree.map(jnp.asarray, blob["lora"])
    print(f"Detected LoRA adapters: r={lora_cfg.r} alpha={lora_cfg.alpha} "
          f"targets={lora_cfg.target_modules} head={lora_cfg.train_diffusion_head}"
          f"{' (full-rank override)' if lora_cfg.full_diffusion_head else ''}")

    extras = None
    extras_path = os.path.join(lora_dir, "extras.pkl")
    if os.path.exists(extras_path):
        with open(extras_path, "rb") as f:
            extras = pickle.load(f)
        print(f"Detected trained component overrides: {sorted(extras)}")
        lora = dict(lora)
        lora["extras"] = jax.tree.map(jnp.asarray, extras)

    merged = apply_lora(params, lora, lora_cfg)

    report = merge_and_verify(params, merged, lora, lora_cfg, extras, rtol, atol)
    print(
        f"Verified LM merge: {report['lm_changed']} weights changed, "
        f"{report['lm_unchanged']} zero-delta"
    )
    if "diffusion_head_layers" in lora:
        print(
            f"Verified diffusion-head merge: {report['head_changed']} changed, "
            f"{report['head_unchanged']} zero-delta"
        )
    for key in report["overridden"]:
        print(f"Verified component override: {key} (exact match)")

    # parameter-count equality (reference parity check)
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_merged = sum(x.size for x in jax.tree_util.tree_leaves(merged))
    assert n_base == n_merged, f"parameter count changed: {n_base} vs {n_merged}"

    save_native(output_dir, cfg, merged)
    print(f"Merged model saved to {output_dir}")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_model", required=True, help="base checkpoint dir (HF or native)")
    ap.add_argument("--trained_checkpoint", required=True, help="dir containing lora/ assets")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--atol", type=float, default=1e-8)
    ap.add_argument("--rtol", type=float, default=1e-5)
    args = ap.parse_args()
    run_merge(args.base_model, args.trained_checkpoint, args.output_dir, args.rtol, args.atol)


if __name__ == "__main__":
    main()
