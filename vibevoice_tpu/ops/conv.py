"""Causal 1-D convolution primitives in channels-last (B, T, C) layout.

TPU-first re-design of the reference's SConv1d / SConvTranspose1d
(reference modular_vibevoice_tokenizer.py:258-576):

* Batch (full-utterance) mode reproduces the reference's causal left-pad
  ``padding_total = (k-1)*dilation - (stride-1)`` plus stride-alignment extra
  right pad (reference :127-133, :384-418).
* Streaming mode replaces the reference's dict-of-tensors cache with a
  fixed-shape context buffer carried as explicit functional state, so the
  whole chunked decode step jits into a single XLA program. A zero-filled
  initial buffer is mathematically identical to the reference's "first chunk"
  special case (zero contributions), which we verify in tests.

Weight layout is TIO — ``(k, C_in // groups, C_out)`` — which is what
``lax.conv_general_dilated`` consumes natively with ('NTC','TIO','NTC')
dimension numbers; checkpoint conversion transposes once at load time.
Transposed-conv weights are additionally stored pre-flipped so the runtime op
is a plain dilated convolution with no per-step layout work.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NTC", "TIO", "NTC")


def conv_context_size(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """Streaming context (= causal left pad) for SConv1d (reference :282,:285)."""
    return (kernel_size - 1) * dilation - (stride - 1)


def conv_transpose_context_size(kernel_size: int) -> int:
    """Streaming context for SConvTranspose1d (reference :447)."""
    return kernel_size - 1


def _pad_time(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad the time axis of (B, T, C). Handles the reference's small-input
    reflect workaround (reference pad1d, :136-151)."""
    if left == 0 and right == 0:
        return x
    if mode in ("constant", "zero", "zeros"):
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    length = x.shape[1]
    max_pad = max(left, right)
    extra = 0
    if mode == "reflect" and length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    jmode = {"reflect": "reflect", "replicate": "edge"}[mode]
    padded = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=jmode)
    if extra:
        padded = padded[:, : padded.shape[1] - extra, :]
    return padded


def extra_padding_for_conv1d(length: int, kernel_size: int, stride: int, padding_total: int) -> int:
    """Right pad so every input sample is consumed (reference :127-133)."""
    import math

    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal - length


def causal_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Full-sequence causal conv, (B, T, C_in) -> (B, ceil(T/stride), C_out)."""
    k = w.shape[0]
    padding_total = conv_context_size(k, stride, dilation)
    extra = extra_padding_for_conv1d(x.shape[1], k, stride, padding_total)
    x = _pad_time(x, padding_total, extra, pad_mode)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_conv1d_streaming(
    x: jnp.ndarray,
    state: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming chunk. ``state`` is (B, ctx, C_in) with
    ctx = (k-1)*dilation - (stride-1); chunk length must be a multiple of
    ``stride`` (always true on the 3200-sample frame path).

    Returns (y, new_state). Matches reference SConv1d._forward_streaming
    (:327-382): conv over [state, x] with no extra padding; the new state is
    the trailing ctx samples of the concatenated input.
    """
    ctx = state.shape[1]
    full = jnp.concatenate([state, x], axis=1) if ctx > 0 else x
    y = lax.conv_general_dilated(
        full,
        w,
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    new_state = full[:, full.shape[1] - ctx :, :] if ctx > 0 else state
    return y, new_state


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    causal: bool = True,
    trim_right_ratio: float = 1.0,
) -> jnp.ndarray:
    """Full-sequence transposed conv, (B, T, C_in) -> (B, T*stride, C_out).

    ``w`` is stored pre-flipped TIO so this lowers to one dilated conv:
    w[t, i, o] = torch_convtranspose_w[i, o, k-1-t].
    Trimming follows reference SConvTranspose1d (:507-516, :551-576) with
    padding_total = k - stride.
    """
    import math

    k = w.shape[0]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    padding_total = k - stride
    if causal:
        pad_r = math.ceil(padding_total * trim_right_ratio)
        pad_l = padding_total - pad_r
    else:
        pad_r = padding_total // 2
        pad_l = padding_total - pad_r
    if pad_l or pad_r:
        y = y[:, pad_l : y.shape[1] - pad_r, :]
    return y


def conv_transpose1d_streaming(
    x: jnp.ndarray,
    state: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    trim_right_ratio: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming chunk of causal transposed conv.

    ``state`` is (B, k-1, C_in) of trailing *input* frames (zero-initialised).
    Re-runs the conv over [state, x] and keeps the last T*stride new output
    samples (reference :478-549). With a zero initial state this equals the
    reference's empty-cache first chunk because zero inputs contribute nothing.
    """
    k = w.shape[0]
    t_new = x.shape[1]
    full = jnp.concatenate([state, x], axis=1)
    y = conv_transpose1d(full, w, b, stride=stride, causal=True, trim_right_ratio=trim_right_ratio)
    y = y[:, y.shape[1] - t_new * stride :, :]
    new_state = full[:, full.shape[1] - (k - 1) :, :]
    return y, new_state
