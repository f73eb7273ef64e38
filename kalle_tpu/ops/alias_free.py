"""Anti-aliased (alias-free) activation: 2x kaiser-sinc upsample -> pointwise
nonlinearity -> 2x downsample.

Replaces the reference's `alias_free_torch.Activation1d` dependency
(ref backup/flows.py:5, used in every AMPBlock :264-276 and the BigVGAN
post-activation :450). Formulas follow the public NVIDIA BigVGAN
implementation (MIT): kaiser-windowed sinc low-pass, replicate edge padding,
grouped (depthwise) conv / transposed conv.

TPU note: depthwise convs over (B, T, C) NWC run on the VPU-friendly path;
the 12-tap filters are tiny so XLA fuses them with the surrounding snake.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f = f / f.sum()
    return f.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _up_filter(ratio: int, kernel_size: int) -> np.ndarray:
    # cache NUMPY, not jnp: a jnp array materialized during a jit trace is a
    # tracer, and caching it leaks it across traces (UnexpectedTracerError
    # on the next trace — same bug class as the round-1 DFT basis cache)
    return kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)


def upsample1d(x: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T*ratio, C)."""
    kernel_size = int(6 * ratio // 2) * 2
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    C = x.shape[-1]
    filt = _up_filter(ratio, kernel_size)

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    w = jnp.broadcast_to(filt[::-1][:, None, None], (kernel_size, 1, C))
    # depthwise transposed conv: lhs-dilated cross-correlation, full padding
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    ) * ratio
    return out[:, pad_left:-pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T//ratio, C). LowPassFilter1d with stride."""
    kernel_size = int(6 * ratio // 2) * 2
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    C = x.shape[-1]
    filt = _up_filter(ratio, kernel_size)

    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    w = jnp.broadcast_to(filt[:, None, None], (kernel_size, 1, C))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(ratio,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )


def alias_free_act(x: jnp.ndarray, act_fn, up_ratio: int = 2,
                   down_ratio: int = 2) -> jnp.ndarray:
    """Activation1d: upsample -> act -> downsample."""
    return downsample1d(act_fn(upsample1d(x, up_ratio)), down_ratio)
