"""σ-VAE acoustic / semantic tokenizers, TPU-native.

Re-designs the reference's TokenizerEncoder / TokenizerDecoder
(reference modular_vibevoice_tokenizer.py:687-951) as pure functions over
parameter pytrees in channels-last (B, T, C) layout:

* Batch mode: full-utterance encode/decode for prefill and training.
* Streaming mode: the reference's ``VibeVoiceTokenizerStreamingCache`` (a dict
  of per-layer tensors mutated in Python, reference :193-256) becomes a pytree
  of fixed-shape conv context buffers threaded functionally through the
  forward pass, so the per-frame vocoder step compiles into one XLA program.

Architecture (encoder; decoder mirrors it):
  stem SConv1d(k=7) -> [downsample SConv1d(k=2r, s=r) + Block1D stack] x N
  -> head SConv1d(k=7) -> vae_dim     (reference :730-774)
Block1D = RMSNorm -> depthwise conv(k=7) -> layer-scale -> residual;
          RMSNorm -> 4x GELU MLP -> layer-scale -> residual  (reference :620-684)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import AcousticTokenizerConfig, SemanticTokenizerConfig
from ..ops.conv import (
    causal_conv1d,
    causal_conv1d_streaming,
    conv_context_size,
    conv_transpose1d,
    conv_transpose1d_streaming,
    conv_transpose_context_size,
)
from ..ops.norms import rms_norm, layer_norm

Params = Dict
State = Dict

BLOCK_KERNEL = 7
STEM_KERNEL = 7
HEAD_KERNEL = 7
FFN_EXPANSION = 4


# ---------------------------------------------------------------------------
# Specs: static python descriptions of each conv stack
# ---------------------------------------------------------------------------


def encoder_spec(cfg) -> dict:
    """Derived static structure of an encoder (reference :694-774).

    Note the encoder uses *reversed* ratios (reference :701)."""
    depths = tuple(cfg.encoder_depths)
    ratios = tuple(reversed(cfg.encoder_ratios))
    nf = cfg.encoder_n_filters
    dims = tuple(nf * (2**i) for i in range(len(depths)))
    return dict(
        depths=depths,
        ratios=ratios,
        dims=dims,
        in_channels=cfg.channels,
        out_dim=cfg.vae_dim,
    )


def decoder_spec(cfg: AcousticTokenizerConfig) -> dict:
    """Derived static structure of the decoder (reference :823-912).

    Decoder ratios are NOT reversed; depths arrive already reversed
    (reference :830-833, :1024-1028)."""
    depths = tuple(cfg.resolved_decoder_depths)
    ratios = tuple(cfg.resolved_decoder_ratios)
    nf = cfg.decoder_n_filters
    n = len(depths)
    dims = tuple(nf * (2 ** (n - 1 - i)) for i in range(n))
    return dict(
        depths=depths,
        ratios=ratios,
        dims=dims,
        in_channels=cfg.vae_dim,
        out_dim=cfg.channels,
    )


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _init_conv(key, k: int, cin: int, cout: int, std: float, bias: bool, dtype):
    w = jax.random.normal(key, (k, cin, cout), dtype=jnp.float32) * std
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _init_linear(key, cin: int, cout: int, std: float, bias: bool, dtype):
    w = jax.random.normal(key, (cin, cout), dtype=jnp.float32) * std
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _init_block(key, dim: int, cfg, dtype) -> Params:
    ks = jax.random.split(key, 3)
    std = cfg.weight_init_value
    gamma0 = cfg.layer_scale_init_value
    if cfg.mixer_layer == "depthwise_conv":
        mixer_groups = dim
    elif cfg.mixer_layer == "conv":  # full conv mixer (reference :632-639)
        mixer_groups = 1
    else:
        raise ValueError(f"Unsupported mixer layer: {cfg.mixer_layer}")
    # causal=False rejected at config construction (configs.__post_init__),
    # which covers the checkpoint-load path too, not just random init
    # Block norms are ALWAYS affine in the reference — Block1D constructs
    # ConvRMSNorm without the elementwise_affine flag (:628-630); the flag
    # only reaches the encoder/decoder FINAL norm via norm_type (:726)
    p = {
        "norm": {"w": jnp.ones((dim,), dtype)},
        "mixer": _init_conv(
            ks[0], BLOCK_KERNEL, dim // mixer_groups, dim, std, cfg.conv_bias, dtype
        ),
        "ffn_norm": {"w": jnp.ones((dim,), dtype)},
        "ffn": {
            "fc1": _init_linear(ks[1], dim, FFN_EXPANSION * dim, std, cfg.conv_bias, dtype),
            "fc2": _init_linear(ks[2], FFN_EXPANSION * dim, dim, std, cfg.conv_bias, dtype),
        },
    }
    if gamma0 > 0:
        p["gamma"] = jnp.full((dim,), gamma0, dtype)
        p["ffn_gamma"] = jnp.full((dim,), gamma0, dtype)
    return p


def init_encoder(key, cfg, dtype=jnp.float32) -> Params:
    spec = encoder_spec(cfg)
    depths, ratios, dims = spec["depths"], spec["ratios"], spec["dims"]
    std = cfg.weight_init_value
    n = len(depths)
    keys = jax.random.split(key, 2 * n + 2)
    down = [_init_conv(keys[0], STEM_KERNEL, spec["in_channels"], dims[0], std, cfg.conv_bias, dtype)]
    for i in range(n - 1):
        down.append(
            _init_conv(keys[1 + i], ratios[i] * 2, dims[i], dims[i + 1], std, cfg.conv_bias, dtype)
        )
    stages = []
    for i in range(n):
        bkeys = jax.random.split(keys[n + i], depths[i])
        stages.append([_init_block(bk, dims[i], cfg, dtype) for bk in bkeys])
    p = {"down": down, "stages": stages,
         "head": _init_conv(keys[-1], HEAD_KERNEL, dims[-1], spec["out_dim"], std, cfg.conv_bias, dtype)}
    if not cfg.disable_last_norm:
        p["final_norm"] = (
            {"w": jnp.ones((dims[-1],), dtype)}
            if cfg.layernorm_elementwise_affine
            else {}
        )
    return p


def init_decoder(key, cfg: AcousticTokenizerConfig, dtype=jnp.float32) -> Params:
    spec = decoder_spec(cfg)
    depths, ratios, dims = spec["depths"], spec["ratios"], spec["dims"]
    std = cfg.weight_init_value
    n = len(depths)
    keys = jax.random.split(key, 2 * n + 2)
    up = [_init_conv(keys[0], STEM_KERNEL, spec["in_channels"], dims[0], std, cfg.conv_bias, dtype)]
    for i in range(n - 1):
        up.append(
            _init_conv(keys[1 + i], ratios[i] * 2, dims[i], dims[i + 1], std, cfg.conv_bias, dtype)
        )
    stages = []
    for i in range(n):
        bkeys = jax.random.split(keys[n + i], depths[i])
        stages.append([_init_block(bk, dims[i], cfg, dtype) for bk in bkeys])
    p = {"up": up, "stages": stages,
         "head": _init_conv(keys[-1], HEAD_KERNEL, dims[-1], spec["out_dim"], std, cfg.conv_bias, dtype)}
    if not cfg.disable_last_norm:
        p["final_norm"] = (
            {"w": jnp.ones((dims[-1],), dtype)}
            if cfg.layernorm_elementwise_affine
            else {}
        )
    return p


# ---------------------------------------------------------------------------
# Streaming state
# ---------------------------------------------------------------------------


def init_encoder_state(cfg, batch: int, dtype=jnp.float32) -> State:
    spec = encoder_spec(cfg)
    depths, ratios, dims = spec["depths"], spec["ratios"], spec["dims"]
    n = len(depths)
    st: State = {}
    st["down0"] = jnp.zeros((batch, conv_context_size(STEM_KERNEL), spec["in_channels"]), dtype)
    for i in range(n - 1):
        ctx = conv_context_size(ratios[i] * 2, ratios[i])
        st[f"down{i + 1}"] = jnp.zeros((batch, ctx, dims[i]), dtype)
    for i in range(n):
        for j in range(depths[i]):
            st[f"s{i}_{j}"] = jnp.zeros((batch, conv_context_size(BLOCK_KERNEL), dims[i]), dtype)
    st["head"] = jnp.zeros((batch, conv_context_size(HEAD_KERNEL), dims[-1]), dtype)
    return st


def init_decoder_state(cfg: AcousticTokenizerConfig, batch: int, dtype=jnp.float32) -> State:
    spec = decoder_spec(cfg)
    depths, ratios, dims = spec["depths"], spec["ratios"], spec["dims"]
    n = len(depths)
    st: State = {}
    st["up0"] = jnp.zeros((batch, conv_context_size(STEM_KERNEL), spec["in_channels"]), dtype)
    for i in range(n - 1):
        ctx = conv_transpose_context_size(ratios[i] * 2)
        st[f"up{i + 1}"] = jnp.zeros((batch, ctx, dims[i]), dtype)
    for i in range(n):
        for j in range(depths[i]):
            st[f"s{i}_{j}"] = jnp.zeros((batch, conv_context_size(BLOCK_KERNEL), dims[i]), dtype)
    st["head"] = jnp.zeros((batch, conv_context_size(HEAD_KERNEL), dims[-1]), dtype)
    return st


def _fuse_interpret() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True


def fuse_hot_stages(tok_params: Params, cfg, quantize: bool = True, keep_dense: bool = False) -> Params:
    """Inference-prep transform: pack the T=1 streaming block stacks into the
    fused Pallas kernel format (ops/vocoder_fused.py).

    For a {'decoder': ...} entry, stage 0 runs at the latent frame rate (T=1
    per frame); for an {'encoder': ...} entry (the semantic re-encode path),
    the FINAL stage does. Those two stacks are ~1.1 GB of weight reads per
    frame on the shipped configs — the vocoder-path bottleneck.

    keep_dense=True retains the dense block params alongside (needed if the
    same tree must also serve batch-mode encode/decode)."""
    from ..ops.vocoder_fused import pack_stage

    def packable(blocks) -> bool:
        if not blocks:
            return False
        if "w" not in blocks[0]["norm"]:  # affine-free norms: dense path
            return False
        b0 = blocks[0]
        # pack_stage needs dense weights (already-int8 FFNs stay dense here:
        # the fused kernel does its OWN in-kernel int8 via quantize=True),
        # biases, and the layer-scale gammas
        if any(
            k not in b0 for k in ("gamma", "ffn_gamma", "ffn_norm")
        ) or "w" not in b0["ffn"]["fc1"] or "b" not in b0["ffn"]["fc1"]:
            return False
        if "b" not in b0["mixer"] or "b" not in b0["ffn"]["fc2"]:
            return False
        dim = b0["norm"]["w"].shape[0]
        hid = b0["ffn"]["fc1"]["w"].shape[1]
        if b0["mixer"]["w"].shape[1] != 1:
            return False  # fused kernel assumes the depthwise mixer layout
        # Mosaic needs 128-lane tiles; tiny test configs run interpret on CPU
        return (dim % 128 == 0 and hid % 128 == 0) or _fuse_interpret()

    out = dict(tok_params)
    if "decoder" in tok_params and packable(tok_params["decoder"]["stages"][0]):
        dec = dict(tok_params["decoder"])
        stages = list(dec["stages"])
        dec["stage0_packed"] = pack_stage(stages[0], cfg.layernorm_eps, quantize)
        if not keep_dense:
            stages[0] = []
        dec["stages"] = stages
        out["decoder"] = dec
    if "encoder" in tok_params and packable(tok_params["encoder"]["stages"][-1]):
        enc = dict(tok_params["encoder"])
        stages = list(enc["stages"])
        enc["stageN_packed"] = pack_stage(stages[-1], cfg.layernorm_eps, quantize)
        if not keep_dense:
            stages[-1] = []
        enc["stages"] = stages
        out["encoder"] = enc
    return out


def _fused_stage_apply(packed, x, state: State, new_state: State, stage_idx: int, depth: int):
    """Dispatch one packed block stack on a single frame; updates new_state
    in place with the per-block conv contexts."""
    from ..ops.vocoder_fused import fused_stage_step

    states = jnp.stack([state[f"s{stage_idx}_{j}"] for j in range(depth)])
    x, new = fused_stage_step(packed, x, states, interpret=_fuse_interpret())
    for j in range(depth):
        new_state[f"s{stage_idx}_{j}"] = new[j]
    return x


def reset_state(state: State, sample_mask: jnp.ndarray) -> State:
    """Zero the context buffers of samples where ``sample_mask`` is True —
    functional equivalent of the reference cache's ``set_to_zero`` on
    ``speech_end`` (reference :234-241, modeling_vibevoice_inference.py:542-546).
    """
    m = sample_mask.reshape(-1, 1, 1)
    return {k: jnp.where(m, jnp.zeros_like(v), v) for k, v in state.items()}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _ffn_mm(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    from ..ops.quant import mm as qmm

    # quant.mm handles dense/w8/w4 + bias + runtime LoRA branches uniformly
    return qmm(x, p)


def _norm_apply(p: Params, x: jnp.ndarray, cfg) -> jnp.ndarray:
    if cfg.layernorm == "RMSNorm":
        return rms_norm(x, p.get("w"), cfg.layernorm_eps)
    return layer_norm(x, p.get("w"), p.get("b"), cfg.layernorm_eps)


def _block_apply(p: Params, x: jnp.ndarray, cfg, state: Optional[jnp.ndarray]):
    """Block1D forward (reference :665-684). Returns (x, new_conv_state)."""
    dim = x.shape[-1]
    # groups from the weight layout (k, C_in/groups, C_out): dim for the
    # depthwise mixer, 1 for the full-conv mixer (mixer_layer='conv')
    groups = dim // p["mixer"]["w"].shape[1]
    res = x
    h = _norm_apply(p["norm"], x, cfg)
    if state is None:
        h = causal_conv1d(h, p["mixer"]["w"], p["mixer"].get("b"), groups=groups, pad_mode=cfg.pad_mode)
        new_state = None
    else:
        h, new_state = causal_conv1d_streaming(h, state, p["mixer"]["w"], p["mixer"].get("b"), groups=groups)
    if "gamma" in p:
        h = h * p["gamma"].astype(h.dtype)
    x = res + h

    res = x
    h = _norm_apply(p["ffn_norm"], x, cfg)
    f = p["ffn"]
    h = _ffn_mm(h, f["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = _ffn_mm(h, f["fc2"])
    if "ffn_gamma" in p:
        h = h * p["ffn_gamma"].astype(h.dtype)
    return res + h, new_state


def encoder_apply(
    cfg,
    params: Params,
    x: jnp.ndarray,
    state: Optional[State] = None,
) -> Tuple[jnp.ndarray, Optional[State]]:
    """Audio (B, T, channels) -> latents (B, T // hop, vae_dim).

    If ``state`` is given, runs in streaming mode and returns the new state.
    """
    spec = encoder_spec(cfg)
    depths, ratios = spec["depths"], spec["ratios"]
    n = len(depths)
    new_state: State = {}
    for i in range(n):
        dp = params["down"][i]
        if i == 0:
            k, s = STEM_KERNEL, 1
        else:
            k, s = ratios[i - 1] * 2, ratios[i - 1]
        if state is None:
            x = causal_conv1d(x, dp["w"], dp.get("b"), stride=s, pad_mode=cfg.pad_mode)
        else:
            x, new_state[f"down{i}"] = causal_conv1d_streaming(
                x, state[f"down{i}"], dp["w"], dp.get("b"), stride=s
            )
        packed = params.get("stageN_packed") if i == n - 1 else None
        if packed is not None and state is not None and x.shape[1] == 1:
            x = _fused_stage_apply(packed, x, state, new_state, i, depths[i])
        else:
            if packed is not None and len(params["stages"][i]) != depths[i]:
                raise ValueError(
                    f"stage {i} was packed without its dense blocks; this "
                    "path (batch-mode or multi-frame window) needs "
                    "fuse_hot_stages(keep_dense=True)"
                )
            for j in range(depths[i]):
                bstate = None if state is None else state[f"s{i}_{j}"]
                x, bs = _block_apply(params["stages"][i][j], x, cfg, bstate)
                if state is not None:
                    new_state[f"s{i}_{j}"] = bs
    if "final_norm" in params:
        x = _norm_apply(params["final_norm"], x, cfg)
    hp = params["head"]
    if state is None:
        x = causal_conv1d(x, hp["w"], hp.get("b"), pad_mode=cfg.pad_mode)
        return x, None
    x, new_state["head"] = causal_conv1d_streaming(x, state["head"], hp["w"], hp.get("b"))
    return x, new_state


def decoder_apply(
    cfg: AcousticTokenizerConfig,
    params: Params,
    x: jnp.ndarray,
    state: Optional[State] = None,
) -> Tuple[jnp.ndarray, Optional[State]]:
    """Latents (B, T, vae_dim) -> audio (B, T * hop, channels)."""
    spec = decoder_spec(cfg)
    depths, ratios = spec["depths"], spec["ratios"]
    n = len(depths)
    new_state: State = {}
    for i in range(n):
        up = params["up"][i]
        if i == 0:
            if state is None:
                x = causal_conv1d(x, up["w"], up.get("b"), pad_mode=cfg.pad_mode)
            else:
                x, new_state["up0"] = causal_conv1d_streaming(x, state["up0"], up["w"], up.get("b"))
        else:
            s = ratios[i - 1]
            if state is None:
                x = conv_transpose1d(x, up["w"], up.get("b"), stride=s, causal=cfg.causal)
            else:
                x, new_state[f"up{i}"] = conv_transpose1d_streaming(
                    x, state[f"up{i}"], up["w"], up.get("b"), stride=s
                )
        packed = params.get("stage0_packed") if i == 0 else None
        if packed is not None and state is not None and x.shape[1] == 1:
            x = _fused_stage_apply(packed, x, state, new_state, i, depths[i])
        else:
            if packed is not None and len(params["stages"][i]) != depths[i]:
                raise ValueError(
                    f"stage {i} was packed without its dense blocks; this "
                    "path (batch-mode or multi-frame window) needs "
                    "fuse_hot_stages(keep_dense=True)"
                )
            for j in range(depths[i]):
                bstate = None if state is None else state[f"s{i}_{j}"]
                x, bs = _block_apply(params["stages"][i][j], x, cfg, bstate)
                if state is not None:
                    new_state[f"s{i}_{j}"] = bs
    if "final_norm" in params:
        x = _norm_apply(params["final_norm"], x, cfg)
    hp = params["head"]
    if state is None:
        x = causal_conv1d(x, hp["w"], hp.get("b"), pad_mode=cfg.pad_mode)
        return x, None
    x, new_state["head"] = causal_conv1d_streaming(x, state["head"], hp["w"], hp.get("b"))
    return x, new_state


# ---------------------------------------------------------------------------
# VAE wrappers
# ---------------------------------------------------------------------------


def init_acoustic_tokenizer(key, cfg: AcousticTokenizerConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"encoder": init_encoder(k1, cfg, dtype), "decoder": init_decoder(k2, cfg, dtype)}


def init_semantic_tokenizer(key, cfg: SemanticTokenizerConfig, dtype=jnp.float32) -> Params:
    return {"encoder": init_encoder(key, cfg, dtype)}


def encode(cfg, params: Params, audio: jnp.ndarray, state: Optional[State] = None):
    """Returns (mean latents (B, T', D), new_state). ``audio`` is (B, T, channels)."""
    return encoder_apply(cfg, params["encoder"], audio, state)


def decode(cfg, params: Params, latents: jnp.ndarray, state: Optional[State] = None):
    """Returns (audio (B, T*hop, channels), new_state)."""
    return decoder_apply(cfg, params["decoder"], latents, state)


def sample_latents(key, mean: jnp.ndarray, fix_std: float, dist_type: str) -> jnp.ndarray:
    """Sample from the σ-VAE posterior (reference :966-991).

    'fix': mean + fix_std * eps.
    'gaussian': per-sample std drawn as randn * (fix_std / 0.8).
    'none': mean.
    """
    if dist_type == "none":
        return mean
    if dist_type == "fix":
        return mean + fix_std * jax.random.normal(key, mean.shape, mean.dtype)
    if dist_type == "gaussian":
        k1, k2 = jax.random.split(key)
        b = mean.shape[0]
        std = jax.random.normal(k1, (b,) + (1,) * (mean.ndim - 1), mean.dtype) * (fix_std / 0.8)
        return mean + std * jax.random.normal(k2, mean.shape, mean.dtype)
    raise ValueError(f"unknown dist_type {dist_type}")


def sample_latents_from_noise(
    mean: jnp.ndarray, fix_std: float, dist_type: str, std_eps: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """sample_latents with explicit standard-normal draws instead of a key —
    the fidelity-harness hook matching the reference's two torch.randn calls
    (reference modular_vibevoice_tokenizer.py:977-989: `std_eps` is the (B,)
    per-sample std draw, `eps` the elementwise draw)."""
    if dist_type == "none":
        return mean
    if dist_type == "fix":
        return mean + fix_std * eps.astype(mean.dtype)
    if dist_type == "gaussian":
        std = std_eps.reshape((mean.shape[0],) + (1,) * (mean.ndim - 1)).astype(mean.dtype) * (
            fix_std / 0.8
        )
        return mean + std * eps.astype(mean.dtype)
    raise ValueError(f"unknown dist_type {dist_type}")


def kl_loss(mean: jnp.ndarray) -> jnp.ndarray:
    """Per-element "KL" of the σ-VAE posterior — the reference computes plain
    MSE of the mean against zero (reference VibeVoiceTokenizerEncoderOutput.kl,
    modular_vibevoice_tokenizer.py:993-996)."""
    return jnp.square(mean)
