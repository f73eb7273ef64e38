"""Attention ops.

`mha` is the XLA path: einsum QK^T -> masked softmax -> einsum. XLA fuses
this well on TPU for the short packed sequences this framework sees
(max_seq_len 2048, ref: twj_dataset.py:164). A Pallas flash kernel
(ops/pallas/flash_attention.py) takes over for long sequences / large
batches; both share this interface.

Replaces the reference's flash-attention-2 CUDA dependency
(ref: model.py:20-23, model_sigmaVAE.py:17-22).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_causal_padding_mask(
    pad_mask: jnp.ndarray,  # (b, kv_len) 1 = real token
    q_len: int,
    q_offset: int = 0,
) -> jnp.ndarray:
    """Boolean (b, 1, q_len, kv_len) mask: True = may attend.

    Matches HF semantics for `attention_mask=ids_mask+audio_mask`
    (ref: model_sigmaVAE.py:74): key positions with pad_mask==0 are
    masked out; causality uses absolute positions (q_offset for decode)."""
    kv_len = pad_mask.shape[-1]
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    k_pos = jnp.arange(kv_len)[None, :]
    causal = k_pos <= q_pos  # (q_len, kv_len)
    pad = pad_mask[:, None, None, :].astype(bool)  # (b,1,1,kv)
    return jnp.logical_and(causal[None, None, :, :], pad)


def mha(
    q: jnp.ndarray,  # (b, t_q, n_heads, head_dim)
    k: jnp.ndarray,  # (b, t_kv, n_kv_heads, head_dim)
    v: jnp.ndarray,  # (b, t_kv, n_kv_heads, head_dim)
    mask: Optional[jnp.ndarray] = None,  # (b, 1, t_q, t_kv) bool
) -> jnp.ndarray:
    """Grouped-query attention with f32 softmax accumulation."""
    b, t_q, n_heads, head_dim = q.shape
    n_kv = k.shape[2]
    groups = n_heads // n_kv
    scale = head_dim ** -0.5

    q = q.reshape(b, t_q, n_kv, groups, head_dim)
    # scores: (b, n_kv, groups, t_q, t_kv)
    scores = jnp.einsum("bqkgd,bskd->bkgqs", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask[:, :, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs.astype(v.dtype), v)
    return out.reshape(b, t_q, n_heads, head_dim)


def mha_t(
    q: jnp.ndarray,   # (b, t_q, n_heads, head_dim)
    kt: jnp.ndarray,  # (b, n_kv, head_dim, t_kv) — decode-cache K layout
    vt: jnp.ndarray,  # (b, n_kv, t_kv, head_dim)
    mask: Optional[jnp.ndarray] = None,  # (b, 1, t_q, t_kv) bool
) -> jnp.ndarray:
    """mha on the decode-cache layouts (K transposed per head — the layout
    ops.pallas.decode_attention streams; this is the XLA prefill/CPU path
    over the same cache). Identical math to mha."""
    b, t_q, n_heads, head_dim = q.shape
    n_kv = kt.shape[1]
    groups = n_heads // n_kv
    scale = head_dim ** -0.5

    out_dtype = q.dtype
    if jax.default_backend() == "cpu" and q.dtype == jnp.bfloat16:
        # CPU DotThunk can't do BF16 x BF16 -> F32 for this contraction
        q, kt, vt = (x.astype(jnp.float32) for x in (q, kt, vt))
    q = q.reshape(b, t_q, n_kv, groups, head_dim)
    scores = jnp.einsum("bqkgd,bkds->bkgqs", q, kt,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask[:, :, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgqs,bksd->bqkgd", probs.astype(vt.dtype), vt)
    return out.reshape(b, t_q, n_heads, head_dim).astype(out_dtype)
