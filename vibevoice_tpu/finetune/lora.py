"""LoRA adapters for the functional parameter pytrees.

Functional re-design of the reference's PEFT integration
(reference vibevoice/finetune/train_vibevoice.py:376-420, lora_loading.py:140-176):
adapters are a separate pytree of low-rank factors; the merged weight
``W + (alpha/r) * A @ B`` is materialised inside the jitted loss, so gradients
flow only through the adapter leaves while the base stays frozen — no module
wrapping needed.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    target_modules: Tuple[str, ...] = ("q", "k", "v", "o", "gate", "up", "down")
    train_diffusion_head: bool = True
    dropout: float = 0.0  # reserved; reference defaults to 0.05 but we train full-precision
    # Dense component overrides trained ALONGSIDE the adapters (the reference's
    # --train_connectors with LoRA, saved as connector pytorch_model.bin's in
    # lora/, reference train_vibevoice.py:905-925):
    train_connectors: bool = False
    # Full-rank diffusion-head training with a LoRA'd LM (the reference's
    # diffusion_head_full.bin fallback, lora_loading.py:71-109). Mutually
    # exclusive with head ADAPTERS: when set, no head LoRA pairs are created.
    full_diffusion_head: bool = False

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def _entry_weight(p: Dict) -> jnp.ndarray:
    """The base weight of a linear entry — dense 'w' or quantized 'w8'
    (same (IN, OUT) shape either way)."""
    if "w4" in p:
        raise NotImplementedError(
            "LoRA over an int4 base is unsupported: the int4 matmul has no "
            "activation-gradient VJP (and the axon backend cannot run S4 "
            "transfers — CLAUDE.md int4 probe). Use int8 (--int8_base) "
            "or a dense base."
        )
    return p["w"] if "w" in p else p["w8"]


def _lora_pair(key, w: jnp.ndarray, r: int) -> Dict:
    cin, cout = w.shape
    k1, _ = jax.random.split(key)
    return {
        "a": (jax.random.normal(k1, (cin, r), jnp.float32) * (1.0 / max(cin, 1)) ** 0.5),
        "b": jnp.zeros((r, cout), jnp.float32),
    }


def init_lora(key, params: Dict, cfg: LoraConfig) -> Dict:
    """Build adapters for LM attention/MLP projections (+ diffusion head FFN)."""
    lora: Dict = {"lm_layers": []}
    keys = jax.random.split(key, len(params["lm"]["layers"]) + 2)
    for li, layer in enumerate(params["lm"]["layers"]):
        lk = jax.random.split(keys[li], 8)
        entry: Dict = {}
        for i, name in enumerate(("q", "k", "v", "o")):
            if name in cfg.target_modules:
                entry[name] = _lora_pair(lk[i], _entry_weight(layer["attn"][name]), cfg.r)
        for i, name in enumerate(("gate", "up", "down")):
            if name in cfg.target_modules:
                entry[name] = _lora_pair(lk[4 + i], _entry_weight(layer["mlp"][name]), cfg.r)
        lora["lm_layers"].append(entry)
    if cfg.train_diffusion_head and not cfg.full_diffusion_head:
        hk = jax.random.split(keys[-1], len(params["diffusion_head"]["layers"]) * 3)
        head = []
        for li, layer in enumerate(params["diffusion_head"]["layers"]):
            head.append(
                {
                    "gate": _lora_pair(hk[li * 3], layer["ffn"]["gate"]["w"], cfg.r),
                    "up": _lora_pair(hk[li * 3 + 1], layer["ffn"]["up"]["w"], cfg.r),
                    "down": _lora_pair(hk[li * 3 + 2], layer["ffn"]["down"]["w"], cfg.r),
                }
            )
        lora["diffusion_head_layers"] = head
    # dense override components live IN the adapter pytree so the same
    # optimizer/train-step trains them; they are initialised as copies of the
    # base weights (zero initial delta, like zero-init B factors)
    extras: Dict = {}
    if cfg.train_connectors:
        extras["acoustic_connector"] = jax.tree.map(lambda x: x, params["acoustic_connector"])
        extras["semantic_connector"] = jax.tree.map(lambda x: x, params["semantic_connector"])
    if cfg.train_diffusion_head and cfg.full_diffusion_head:
        extras["diffusion_head"] = jax.tree.map(lambda x: x, params["diffusion_head"])
    if extras:
        lora["extras"] = extras
    return lora


def _merge(w: jnp.ndarray, pair: Dict, scaling: float) -> jnp.ndarray:
    delta = (pair["a"] @ pair["b"]) * scaling
    return (w.astype(jnp.float32) + delta).astype(w.dtype)


def _apply_entry(p: Dict, pair: Dict, scaling: float) -> Dict:
    """Dense base: materialise the merged weight. int8 base (QLoRA — 7B
    fine-tuning on one 16 GB chip): the low-rank branch cannot merge into the
    quantized tensor, so attach it as a runtime "lora" entry — ops/quant.mm
    computes y = x @ (w8*scale) + ((x @ A) @ B) * s with gradients flowing
    only through A/B (the int8 matmul carries a custom VJP w.r.t. x)."""
    if "w8" in p:
        return {**p, "lora": (pair["a"], pair["b"], scaling)}
    return {**p, "w": _merge(p["w"], pair, scaling)}


def apply_lora(params: Dict, lora: Dict, cfg: LoraConfig) -> Dict:
    """Return params with adapters merged (cheap; runs inside jit); adapters
    over int8 base weights attach as runtime branches instead (QLoRA)."""
    out = jax.tree.map(lambda x: x, params)  # shallow-ish structural copy
    out = dict(out)
    out["lm"] = dict(out["lm"])
    layers = []
    for layer, entry in zip(params["lm"]["layers"], lora["lm_layers"]):
        new_layer = {**layer, "attn": dict(layer["attn"]), "mlp": dict(layer["mlp"])}
        for name in ("q", "k", "v", "o"):
            if name in entry:
                new_layer["attn"][name] = _apply_entry(
                    layer["attn"][name], entry[name], cfg.scaling
                )
        for name in ("gate", "up", "down"):
            if name in entry:
                new_layer["mlp"][name] = _apply_entry(
                    layer["mlp"][name], entry[name], cfg.scaling
                )
        layers.append(new_layer)
    out["lm"]["layers"] = layers

    if "diffusion_head_layers" in lora:
        out["diffusion_head"] = dict(out["diffusion_head"])
        hlayers = []
        for layer, entry in zip(params["diffusion_head"]["layers"], lora["diffusion_head_layers"]):
            nl = {**layer, "ffn": dict(layer["ffn"])}
            for name in ("gate", "up", "down"):
                nl["ffn"][name] = {
                    **layer["ffn"][name],
                    "w": _merge(layer["ffn"][name]["w"], entry[name], cfg.scaling),
                }
            hlayers.append(nl)
        out["diffusion_head"]["layers"] = hlayers

    # dense component overrides (trained connectors / full diffusion head)
    for key, value in lora.get("extras", {}).items():
        out[key] = value
    return out


merge_lora = apply_lora  # merging for export is the same materialisation


# ---------------------------------------------------------------------------
# Save / load (the reference's `lora/` checkpoint dir analog,
# reference train_vibevoice.py:885-925, lora_loading.py:140-176)
# ---------------------------------------------------------------------------


def save_lora_assets(path: str, lora: Dict, cfg: LoraConfig, extras: Optional[Dict] = None) -> None:
    """Write the lora/ checkpoint dir: adapters in lora_adapters.pkl, dense
    component overrides (trained connectors / full head — either passed
    explicitly or carried in lora["extras"]) in extras.pkl (the reference's
    connector pytorch_model.bin + diffusion_head_full.bin analog)."""
    os.makedirs(path, exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x), lora)
    if extras is None:
        extras = host.pop("extras", None)
    with open(os.path.join(path, "lora_adapters.pkl"), "wb") as f:
        pickle.dump({"lora": host, "config": cfg.__dict__}, f)
    if extras:
        with open(os.path.join(path, "extras.pkl"), "wb") as f:
            pickle.dump(jax.tree.map(lambda x: np.asarray(x), extras), f)


def load_lora_assets(params: Dict, path: str, model_cfg=None) -> Dict:
    """Load adapters (and optional connector/diffusion-head full overrides)
    and return MERGED params (the demo-CLI restore path,
    reference lora_loading.py:140-176)."""
    lora_dir = path
    if os.path.isdir(os.path.join(path, "lora")):
        lora_dir = os.path.join(path, "lora")
    with open(os.path.join(lora_dir, "lora_adapters.pkl"), "rb") as f:
        blob = pickle.load(f)
    cfg = LoraConfig(**{k: tuple(v) if isinstance(v, list) else v for k, v in blob["config"].items()})
    lora = jax.tree.map(jnp.asarray, blob["lora"])
    merged = apply_lora(params, lora, cfg)
    extras_path = os.path.join(lora_dir, "extras.pkl")
    if os.path.exists(extras_path):
        with open(extras_path, "rb") as f:
            extras = pickle.load(f)
        for key in ("acoustic_connector", "semantic_connector", "diffusion_head"):
            if key in extras:
                merged[key] = jax.tree.map(jnp.asarray, extras[key])
    return merged
