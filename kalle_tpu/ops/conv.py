"""1-D convolution ops for the codec stacks.

TPU-first: internally NWC (features on the 128-lane axis) via
`lax.conv_general_dilated`, with torch-equivalent semantics
(cross-correlation, explicit symmetric padding, ConvTranspose output
arithmetic) so codec weights import bit-comparably. Replaces the
reference's cuDNN convolutions (SURVEY.md §2.9).

Weight layout: (K, C_in, C_out) — 'WIO'. Torch Conv1d weight (O, I, K)
converts via transpose(2, 1, 0); ConvTranspose1d weight (I, O, K) via
flip(K).transpose(2, 0, 1)... see import helpers in codec converters.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NWC", "WIO", "NWC")


def conv1d(
    x: jnp.ndarray,  # (B, T, C_in)
    w: jnp.ndarray,  # (K, C_in, C_out)
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding=0,  # int (symmetric, torch-style) or (lo, hi) — (k-1, 0) gives
                # a causal conv without a jnp.pad copy of the input (the
                # pad copy costs a full tensor round-trip at the codec's
                # full-rate stages)
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.functional.conv1d equivalent in NWC layout."""
    pad = (padding, padding) if isinstance(padding, int) else tuple(padding)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=DN,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(
    x: jnp.ndarray,  # (B, T, C_in)
    w: jnp.ndarray,  # (K, C_in, C_out) ALREADY flipped+transposed from torch
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose1d equivalent.

    torch: out_len = (T-1)*stride - 2*padding + K.
    Implemented as input-dilated cross-correlation with edge padding
    (K-1-padding); the caller provides w already converted from torch's
    (C_in, C_out, K) by flipping K and moving to (K, C_in, C_out)."""
    k = w.shape[0]
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=DN,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose1d_causal(
    x: jnp.ndarray,  # (B, T, C_in)
    w: jnp.ndarray,  # (K, C_in, C_out)
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
) -> jnp.ndarray:
    """conv_transpose1d(padding=0) truncated to exactly T*stride outputs —
    the causal upsampler the codec decoder uses. The truncation happens in
    the conv's own output padding (hi edge reduced) instead of a slice,
    which would copy the full upsampled tensor (≈0.5 GB at the codec's
    full-rate stage)."""
    k = w.shape[0]
    # precondition: hi pad stride-1 <= k-1, else the tail fills from zero
    # padding instead of matching the slice formulation
    assert k >= stride, f"conv_transpose1d_causal needs kernel {k} >= stride {stride}"
    # out_len = (t-1)*stride + 1 + lo + hi - (k-1); lo = k-1 (full), and
    # hi = stride-1 lands exactly on t*stride (drops the k-stride tail)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(k - 1, stride - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=DN,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b
    return out


def fold_weight_norm(v: np.ndarray, g: np.ndarray, dim_keep: int = 0) -> np.ndarray:
    """Fold torch weight_norm (v, g) into a dense weight:
    w = g * v / ||v||  with the norm over all dims except `dim_keep`
    (torch default dim=0 keeps the out-channel axis). Codec checkpoints
    store weight_v/weight_g; we fold at import (inference) — the vendored
    lib's remove_weight_norm_from_model equivalent
    (ref stable_audio_tools/models/utils.py)."""
    axes = tuple(i for i in range(v.ndim) if i != dim_keep)
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)


def torch_conv_weight(w_oik: np.ndarray) -> np.ndarray:
    """torch Conv1d (O, I, K) -> (K, I, O)."""
    return np.transpose(w_oik, (2, 1, 0))


def torch_conv_transpose_weight(w_iok: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d (I, O, K) -> flipped (K, I, O)."""
    return np.transpose(w_iok[:, :, ::-1], (2, 0, 1))


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
               logscale: bool = True) -> jnp.ndarray:
    """SnakeBeta activation: x + (1/(b+1e-9)) * sin(a*x)^2, per-channel
    (a, b) on the last (channel) axis; logscale exp()s both
    (ref stable_audio_tools/models/blocks.py:300-338)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf * alpha)
    return (xf + (1.0 / (beta + 1e-9)) * s * s).astype(x.dtype)


def snake(x: jnp.ndarray, alpha: jnp.ndarray,
          alpha_logscale: bool = False) -> jnp.ndarray:
    """Plain Snake: x + (1/a) * sin(a*x)^2 (BigVGAN flows.py:9-62)."""
    if alpha_logscale:
        alpha = jnp.exp(alpha)
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf * alpha)
    return (xf + (1.0 / (alpha + 1e-9)) * s * s).astype(x.dtype)
