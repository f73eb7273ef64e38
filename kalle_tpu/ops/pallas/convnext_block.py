"""Fused SigmaVAE ConvNeXt block: RMSNorm -> causal depthwise conv(k=7) ->
pointwise GEGLU MLP -> residual, in one Pallas kernel.

The codec decoder is activation-bandwidth-bound at high temporal rates
(e.g. (32, 406k, 32) tensors); XLA materializes the (T, 2H) MLP
intermediates in HBM between the two pointwise matmuls. This kernel keeps
the whole block in VMEM: HBM traffic drops to read-x + write-out + weights.

Causality across time blocks uses a VMEM scratch carrying the previous
block's last K-1 NORMALIZED rows — valid because the TPU grid executes
sequentially along the last axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7  # depthwise kernel size (SigmaVAEConfig.kernel)


def _kernel(x_ref, norm_ref, dww_ref, dwb_ref, upw_ref, upb_ref,
            downw_ref, downb_ref, o_ref, tail, *, block_t: int, eps: float):
    t = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (blk, C)

    # RMSNorm
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    xn = x * jax.lax.rsqrt(var + eps) * norm_ref[:].astype(jnp.float32)

    @pl.when(t == 0)
    def _():
        tail[:] = jnp.zeros_like(tail)  # causal zero left-pad

    xin = jnp.concatenate([tail[:], xn], axis=0)  # (blk + K-1, C)
    tail[:] = xn[block_t - (K - 1):, :]  # carry for the next block

    # causal depthwise conv: sum of K shifted row-scaled copies (VPU)
    dww = dww_ref[:].astype(jnp.float32)  # (K, C)
    h = jnp.zeros_like(xn)
    for j in range(K):
        h = h + xin[j: j + block_t, :] * dww[j][None, :]
    h = h + dwb_ref[:].astype(jnp.float32)

    # pointwise GEGLU MLP (MXU)
    u = jnp.dot(h, upw_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + upb_ref[:].astype(jnp.float32)
    hid = u.shape[-1] // 2
    v, g = u[:, :hid], u[:, hid:]
    a = v * jax.nn.gelu(g, approximate=True)
    d = jnp.dot(a, downw_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + downb_ref[:].astype(jnp.float32)

    o_ref[0] = (x + d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret", "eps"))
def fused_convnext_block(
    x: jnp.ndarray,        # (B, T, C)
    norm: jnp.ndarray,     # (C,)
    dw_w: jnp.ndarray,     # (K, 1, C) depthwise weight (conv layout)
    dw_b: jnp.ndarray,     # (C,)
    up_w: jnp.ndarray,     # (1, C, 2H)
    up_b: jnp.ndarray,     # (2H,)
    down_w: jnp.ndarray,   # (1, H, C)
    down_b: jnp.ndarray,   # (C,)
    block_t: int = 512,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    B, T, C = x.shape
    assert dw_w.shape[0] == K
    block_t = min(block_t, T)
    assert T % block_t == 0, (T, block_t)
    H2 = up_w.shape[-1]

    dww = dw_w.reshape(K, C)
    upw = up_w.reshape(C, H2)
    downw = down_w.reshape(H2 // 2, C)

    kernel = functools.partial(_kernel, block_t=block_t, eps=eps)
    full = lambda *_: (0,)
    return pl.pallas_call(
        kernel,
        grid=(B, T // block_t),
        in_specs=[
            pl.BlockSpec((1, block_t, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((C,), full),
            pl.BlockSpec((K, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), full),
            pl.BlockSpec((C, H2), lambda b, t: (0, 0)),
            pl.BlockSpec((H2,), full),
            pl.BlockSpec((H2 // 2, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), full),
        ],
        out_specs=pl.BlockSpec((1, block_t, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((K - 1, C), jnp.float32)],
        interpret=interpret,
    )(x, norm, dww, dw_b, upw, up_b, downw, down_b)
