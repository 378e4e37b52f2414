"""Convert reference PyTorch state dicts into this framework's parameter pytrees.

Layout conventions (see ops/conv.py):
  conv weight:            torch (C_out, C_in/g, k)  ->  TIO (k, C_in/g, C_out)
  conv-transpose weight:  torch (C_in, C_out, k)    ->  pre-flipped TIO
                          w[t, i, o] = torch_w[i, o, k-1-t]
  linear weight:          torch (out, in)           ->  (in, out)

State-dict key paths follow the reference module tree
(reference modular_vibevoice_tokenizer.py:687-951, modeling_vibevoice.py:58-135,
modular_vibevoice_diffusion_head.py:191-280).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def conv_w(x) -> jnp.ndarray:
    return jnp.asarray(_np(x).transpose(2, 1, 0))


def convtr_w(x) -> jnp.ndarray:
    w = _np(x).transpose(2, 0, 1)  # (k, C_in, C_out)
    return jnp.asarray(w[::-1].copy())


def linear_w(x) -> jnp.ndarray:
    return jnp.asarray(_np(x).T)


def vec(x) -> jnp.ndarray:
    return jnp.asarray(_np(x))


def _raw_conv_weight(sd: Dict, prefix: str) -> np.ndarray:
    """Conv weight in torch layout, folding any conv_norm reparametrization
    (reference apply_parametrization_norm, modular_vibevoice_tokenizer.py:98-107;
    shipped configs use 'none', but the config surface allows weight_norm /
    spectral_norm, and their checkpoints store reparametrized tensors).

    * weight_norm (legacy nn.utils.weight_norm): w = g * v / ||v|| with the
      norm over every dim but 0 — exact.
    * weight_norm (parametrize API): original0/original1 are (g, v) — exact.
    * spectral_norm (legacy): eval-time w = weight_orig / sigma with
      sigma = u^T W v, v = normalize(W^T u) from the stored u — matches
      torch's eval forward (and remove_spectral_norm)."""
    if prefix + ".weight" in sd:
        return _np(sd[prefix + ".weight"])
    if prefix + ".weight_g" in sd:
        g, v = _np(sd[prefix + ".weight_g"]), _np(sd[prefix + ".weight_v"])
    elif prefix + ".parametrizations.weight.original0" in sd:
        g = _np(sd[prefix + ".parametrizations.weight.original0"])
        v = _np(sd[prefix + ".parametrizations.weight.original1"])
    elif prefix + ".weight_orig" in sd:
        w = _np(sd[prefix + ".weight_orig"])
        u = _np(sd[prefix + ".weight_u"])
        wm = w.reshape(w.shape[0], -1)
        if prefix + ".weight_v" in sd:  # torch stores the settled v buffer
            vv = _np(sd[prefix + ".weight_v"])
        else:
            vv = wm.T @ u
            vv = vv / max(np.linalg.norm(vv), 1e-12)
        sigma = float(u @ (wm @ vv))
        return w / sigma
    else:
        raise KeyError(f"no conv weight found under '{prefix}'")
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g * (v / np.maximum(norm, 1e-12))).astype(v.dtype)


def _conv_params(sd: Dict, prefix: str, transposed: bool = False) -> Dict:
    raw = _raw_conv_weight(sd, prefix)
    w = convtr_w(raw) if transposed else conv_w(raw)
    p = {"w": w}
    if prefix + ".bias" in sd:
        p["b"] = vec(sd[prefix + ".bias"])
    return p


def _linear_params(sd: Dict, prefix: str) -> Dict:
    p = {"w": linear_w(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["b"] = vec(sd[prefix + ".bias"])
    return p


def _norm_params(sd: Dict, prefix: str) -> Dict:
    # elementwise_affine=False norms have no weight (ConvRMSNorm(…, False));
    # only valid for the encoder/decoder FINAL norm — block norms are always
    # affine in the reference, so _block_params uses the strict lookup
    return {"w": vec(sd[f"{prefix}.weight"])} if f"{prefix}.weight" in sd else {}


def _block_params(sd: Dict, prefix: str) -> Dict:
    p = {
        "norm": {"w": vec(sd[f"{prefix}.norm.weight"])},
        "mixer": _conv_params(sd, f"{prefix}.mixer.conv.conv.conv"),
        "ffn_norm": {"w": vec(sd[f"{prefix}.ffn_norm.weight"])},
        "ffn": {
            "fc1": _linear_params(sd, f"{prefix}.ffn.linear1"),
            "fc2": _linear_params(sd, f"{prefix}.ffn.linear2"),
        },
    }
    if f"{prefix}.gamma" in sd:
        p["gamma"] = vec(sd[f"{prefix}.gamma"])
        p["ffn_gamma"] = vec(sd[f"{prefix}.ffn_gamma"])
    return p


def convert_encoder(sd: Dict, cfg, prefix: str = "encoder") -> Dict:
    """TokenizerEncoder state dict -> encoder params pytree."""
    depths = tuple(cfg.encoder_depths)
    n = len(depths)
    down = [_conv_params(sd, f"{prefix}.downsample_layers.{i}.0.conv.conv") for i in range(n)]
    stages = [
        [_block_params(sd, f"{prefix}.stages.{i}.{j}") for j in range(depths[i])]
        for i in range(n)
    ]
    p = {
        "down": down,
        "stages": stages,
        "head": _conv_params(sd, f"{prefix}.head.conv.conv"),
    }
    # presence is config-driven: an affine-free final norm leaves no keys in
    # the state dict but must still normalize
    if not getattr(cfg, "disable_last_norm", True) or f"{prefix}.norm.weight" in sd:
        p["final_norm"] = _norm_params(sd, f"{prefix}.norm")
    return p


def convert_decoder(sd: Dict, cfg, prefix: str = "decoder") -> Dict:
    """TokenizerDecoder state dict -> decoder params pytree."""
    depths = tuple(cfg.resolved_decoder_depths)
    n = len(depths)
    up = [_conv_params(sd, f"{prefix}.upsample_layers.0.0.conv.conv")]
    for i in range(1, n):
        up.append(_conv_params(sd, f"{prefix}.upsample_layers.{i}.0.convtr.convtr", transposed=True))
    stages = [
        [_block_params(sd, f"{prefix}.stages.{i}.{j}") for j in range(depths[i])]
        for i in range(n)
    ]
    p = {
        "up": up,
        "stages": stages,
        "head": _conv_params(sd, f"{prefix}.head.conv.conv"),
    }
    # presence is config-driven: an affine-free final norm leaves no keys in
    # the state dict but must still normalize
    if not getattr(cfg, "disable_last_norm", True) or f"{prefix}.norm.weight" in sd:
        p["final_norm"] = _norm_params(sd, f"{prefix}.norm")
    return p


def convert_acoustic_tokenizer(sd: Dict, cfg, prefix: str = "") -> Dict:
    pre = prefix + "." if prefix else ""
    return {
        "encoder": convert_encoder(sd, cfg, pre + "encoder"),
        "decoder": convert_decoder(sd, cfg, pre + "decoder"),
    }


def convert_semantic_tokenizer(sd: Dict, cfg, prefix: str = "") -> Dict:
    pre = prefix + "." if prefix else ""
    return {"encoder": convert_encoder(sd, cfg, pre + "encoder")}


def convert_diffusion_head(sd: Dict, cfg, prefix: str = "") -> Dict:
    """VibeVoiceDiffusionHead state dict -> params pytree
    (reference modular_vibevoice_diffusion_head.py:191-280)."""
    pre = prefix + "." if prefix else ""
    layers = []
    for i in range(cfg.head_layers):
        lp = f"{pre}layers.{i}"
        layers.append(
            {
                "norm": {"w": vec(sd[f"{lp}.norm.weight"])},
                "adaln": _linear_params(sd, f"{lp}.adaLN_modulation.1"),
                "ffn": {
                    "gate": _linear_params(sd, f"{lp}.ffn.gate_proj"),
                    "up": _linear_params(sd, f"{lp}.ffn.up_proj"),
                    "down": _linear_params(sd, f"{lp}.ffn.down_proj"),
                },
            }
        )
    return {
        "noisy_proj": _linear_params(sd, f"{pre}noisy_images_proj"),
        "cond_proj": _linear_params(sd, f"{pre}cond_proj"),
        "t_embedder": {
            "fc1": _linear_params(sd, f"{pre}t_embedder.mlp.0"),
            "fc2": _linear_params(sd, f"{pre}t_embedder.mlp.2"),
        },
        "layers": layers,
        "final": {
            "adaln": _linear_params(sd, f"{pre}final_layer.adaLN_modulation.1"),
            "linear": _linear_params(sd, f"{pre}final_layer.linear"),
        },
    }


def convert_speech_connector(sd: Dict, prefix: str) -> Dict:
    """SpeechConnector: fc1 -> RMSNorm -> fc2 (reference modeling_vibevoice.py:58-69)."""
    return {
        "fc1": _linear_params(sd, f"{prefix}.fc1"),
        "norm": {"w": vec(sd[f"{prefix}.norm.weight"])},
        "fc2": _linear_params(sd, f"{prefix}.fc2"),
    }


def convert_qwen2(sd: Dict, cfg, prefix: str = "") -> Dict:
    """HF Qwen2Model state dict -> qwen2 params pytree (see models/qwen2.py)."""
    pre = prefix + "." if prefix else ""
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{pre}layers.{i}"
        layers.append(
            {
                "input_norm": {"w": vec(sd[f"{lp}.input_layernorm.weight"])},
                "attn": {
                    "q": _linear_params(sd, f"{lp}.self_attn.q_proj"),
                    "k": _linear_params(sd, f"{lp}.self_attn.k_proj"),
                    "v": _linear_params(sd, f"{lp}.self_attn.v_proj"),
                    "o": _linear_params(sd, f"{lp}.self_attn.o_proj"),
                },
                "post_norm": {"w": vec(sd[f"{lp}.post_attention_layernorm.weight"])},
                "mlp": {
                    "gate": _linear_params(sd, f"{lp}.mlp.gate_proj"),
                    "up": _linear_params(sd, f"{lp}.mlp.up_proj"),
                    "down": _linear_params(sd, f"{lp}.mlp.down_proj"),
                },
            }
        )
    return {
        "embed": vec(sd[f"{pre}embed_tokens.weight"]),
        "layers": layers,
        "final_norm": {"w": vec(sd[f"{pre}norm.weight"])},
    }


def convert_qwen2_headless(sd: Dict, cfg, prefix: str = "") -> Dict:
    """Like convert_qwen2 but tolerates a missing final norm (the streaming
    model's lower stack replaces it with Identity, reference
    modeling_vibevoice_streaming.py:138) and a missing/unused embed table
    (upper stack, reference :141-143)."""
    import numpy as np

    pre = prefix + "." if prefix else ""
    full = convert_qwen2(
        {
            **sd,
            **(
                {}
                if f"{pre}norm.weight" in sd
                else {f"{pre}norm.weight": np.ones((cfg.hidden_size,), np.float32)}
            ),
            **(
                {}
                if f"{pre}embed_tokens.weight" in sd
                else {
                    f"{pre}embed_tokens.weight": np.zeros(
                        (cfg.vocab_size, cfg.hidden_size), np.float32
                    )
                }
            ),
        },
        cfg,
        prefix,
    )
    return full
