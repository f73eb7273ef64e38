"""Pallas flash attention (causal + key-padding mask, GQA) for TPU.

Replaces the reference's flash-attention-2 CUDA dependency
(ref model_sigmaVAE.py:17-22) with a blocked online-softmax kernel:
Q tiles stay in VMEM, K/V stream block-by-block, the causal upper triangle
is never computed, and the (b, t) padding mask from ids_mask+audio_mask is
applied per key block. Grid: (batch * kv_head * group, q_blocks); inner
fori_loop over kv blocks up to the diagonal.

Forward-only (inference prefill / no-grad scoring); training uses the XLA
path in ops.attention which autodiffs. Numerics are f32 accumulations.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(pad_ref, q_ref, k_ref, v_ref, o_ref, *, block_q: int,
                  block_k: int, scale: float, seq_len: int):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, hd)

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    n_kv_blocks = iq + 1  # causal: only blocks up to the diagonal

    def body(jk, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        pad = pad_ref[0, :, pl.ds(jk * block_k, block_k)]  # (1, BK)

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
        k_pos = jk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        mask = jnp.logical_and(k_pos <= q_pos, pad > 0)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(p, v,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kv_blocks, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention(
    q: jnp.ndarray,  # (b, t, n_heads, head_dim)
    k: jnp.ndarray,  # (b, t, n_kv, head_dim)
    v: jnp.ndarray,  # (b, t, n_kv, head_dim)
    pad_mask: jnp.ndarray,  # (b, t) 1 = real token
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, nq, hd = q.shape
    n_kv = k.shape[2]
    g = nq // n_kv
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0, (
        f"seq len {t} must be a multiple of block sizes (pad to a bucket)")
    scale = hd ** -0.5

    # fold (b, n_kv, g) into the leading grid axis
    qg = q.reshape(b, t, n_kv, g, hd).transpose(0, 2, 3, 1, 4)
    qg = qg.reshape(b * n_kv * g, t, hd)
    kg = k.transpose(0, 2, 1, 3).reshape(b * n_kv, t, hd)
    vg = v.transpose(0, 2, 1, 3).reshape(b * n_kv, t, hd)
    pad = pad_mask.astype(jnp.int32).reshape(b, 1, t)

    grid = (b * n_kv * g, t // block_q)
    kernel = functools.partial(_flash_kernel, block_q=block_q,
                               block_k=block_k, scale=scale, seq_len=t)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda be, iq: (be // (n_kv * g), 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda be, iq: (be, iq, 0)),
            pl.BlockSpec((1, t, hd), lambda be, iq: (be // g, 0, 0)),
            pl.BlockSpec((1, t, hd), lambda be, iq: (be // g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda be, iq: (be, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_kv * g, t, hd), q.dtype),
        interpret=interpret,
    )(pad, qg, kg, vg)

    out = out.reshape(b, n_kv, g, t, hd).transpose(0, 3, 1, 2, 4)
    return out.reshape(b, t, nq, hd)
