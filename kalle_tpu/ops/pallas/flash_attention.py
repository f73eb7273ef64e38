"""Pallas flash attention (causal + key-padding mask, GQA) for TPU —
forward AND backward.

Replaces the reference's flash-attention-2 CUDA dependency (every reference
Llasa trains with it: ref model.py:20-23, model_sigmaVAE.py:17-22) with
blocked online-softmax kernels:

  forward:  Q tiles stay in VMEM, K/V stream block-by-block, the causal
            upper triangle is never computed, the (b, t) key-padding mask
            from ids_mask+audio_mask is applied per key block. Also emits
            the log-sum-exp rows needed by the backward.
  backward: the standard two-kernel flash backward —
            dq kernel:   grid over Q blocks, inner loop over K blocks up to
                         the diagonal; recomputes p = exp(s - lse) in VMEM.
            dk/dv kernel: grid over K blocks, inner loop over Q blocks from
                         the diagonal down; dk/dv are produced per *query*
                         head and group-summed outside (GQA).
            delta = rowsum(dO * O) is a cheap fused XLA reduction outside.

Numerics are f32 accumulation throughout; O(t) memory — no (t, t)
materialization in either direction. Grid: (batch * kv_head * group,
blocks). Sequence length must be a multiple of the block size (all batch
buckets are multiples of 128, core/config.py length_buckets).

On CPU the kernels run in interpret mode so the identical code path is
exercised by unit tests and the virtual-mesh dryrun.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(pad_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                block_q: int, block_k: int, scale: float):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, hd)

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    n_kv_blocks = (iq * block_q) // block_k + 1  # causal: up to the diagonal

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
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(p, v,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kv_blocks, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # lse = m + log(l); rows with zero valid keys keep lse = NEG_INF so the
    # backward's re-masked p stays exactly zero there.
    lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
    lse_ref[0, 0] = lse[:, 0]


def _fwd(q, k, v, pad, block_q, block_k, interpret):
    """q:(b,t,nq,hd) k/v:(b,t,nkv,hd) pad:(b,t) f32 -> o:(b,t,nq,hd),
    residual tensors in folded (BH, t, ...) layout."""
    b, t, nq, hd = q.shape
    n_kv = k.shape[2]
    g = nq // n_kv
    scale = hd ** -0.5

    qg = q.reshape(b, t, n_kv, g, hd).transpose(0, 2, 3, 1, 4)
    qg = qg.reshape(b * n_kv * g, t, hd)
    kg = k.transpose(0, 2, 1, 3).reshape(b * n_kv, t, hd)
    vg = v.transpose(0, 2, 1, 3).reshape(b * n_kv, t, hd)
    padr = pad.astype(jnp.int32).reshape(b, 1, t)

    grid = (b * n_kv * g, t // block_q)
    kernel = functools.partial(_fwd_kernel, block_q=block_q,
                               block_k=block_k, scale=scale)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda be, iq: (be // (n_kv * g), 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda be, iq: (be, iq, 0)),
            pl.BlockSpec((1, t, hd), lambda be, iq: (be // g, 0, 0)),
            pl.BlockSpec((1, t, hd), lambda be, iq: (be // g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda be, iq: (be, iq, 0)),
            pl.BlockSpec((1, 1, block_q), lambda be, iq: (be, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n_kv * g, t, hd), q.dtype),
            jax.ShapeDtypeStruct((b * n_kv * g, 1, t), jnp.float32),
        ],
        interpret=interpret,
    )(padr, qg, kg, vg)

    out = o.reshape(b, n_kv, g, t, hd).transpose(0, 3, 1, 2, 4)
    return out.reshape(b, t, nq, hd), (qg, kg, vg, padr, o, lse)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(pad_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_q: int, block_k: int, scale: float):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)                  # (BQ, hd)
    lse = lse_ref[0, 0][:, None]                        # (BQ, 1)
    delta = delta_ref[0, 0][:, None]                    # (BQ, 1)

    q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    n_kv_blocks = (iq * block_q) // block_k + 1
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    def body(jk, acc):
        k = k_ref[0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        pad = pad_ref[0, :, pl.ds(jk * block_k, block_k)]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_pos = jk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        mask = jnp.logical_and(k_pos <= q_pos, pad > 0)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)      # (BQ, BK)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_kv_blocks, body, acc)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(pad_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, block_k: int,
                    scale: float, seq_len: int):
    ik = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)                    # (BK, hd)
    v = v_ref[0].astype(jnp.float32)
    pad = pad_ref[0, :, pl.ds(ik * block_k, block_k)]   # (1, BK)

    k_pos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    jq0 = (ik * block_k) // block_q                     # first q block >= diag
    n_q_blocks = seq_len // block_q
    dk = jnp.zeros((block_k, k.shape[-1]), jnp.float32)
    dv = jnp.zeros((block_k, v.shape[-1]), jnp.float32)

    def body(jq, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(jq * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[0, pl.ds(jq * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(jq * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(jq * block_q, block_q)][:, None]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
        q_pos = jq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        mask = jnp.logical_and(k_pos <= q_pos, pad > 0)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(jq0, n_q_blocks, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)  # q already carries `scale`
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(block_q, block_k, interpret, shapes, res, do):
    (b, t, nq, hd), n_kv = shapes
    g = nq // n_kv
    qg, kg, vg, padr, o, lse = res
    scale = hd ** -0.5

    dog = do.reshape(b, t, n_kv, g, hd).transpose(0, 2, 3, 1, 4)
    dog = dog.reshape(b * n_kv * g, t, hd)
    delta = jnp.sum(dog.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]  # (BH, 1, t)

    grid_q = (b * n_kv * g, t // block_q)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, block_k=block_k,
                          scale=scale),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda be, iq: (be // (n_kv * g), 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda be, iq: (be, iq, 0)),
            pl.BlockSpec((1, t, hd), lambda be, iq: (be // g, 0, 0)),
            pl.BlockSpec((1, t, hd), lambda be, iq: (be // g, 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda be, iq: (be, iq, 0)),
            pl.BlockSpec((1, 1, block_q), lambda be, iq: (be, 0, iq)),
            pl.BlockSpec((1, 1, block_q), lambda be, iq: (be, 0, iq)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda be, iq: (be, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_kv * g, t, hd), qg.dtype),
        interpret=interpret,
    )(padr, qg, kg, vg, dog, lse, delta)

    grid_k = (b * n_kv * g, t // block_k)
    dk_full, dv_full = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, seq_len=t),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda be, ik: (be // (n_kv * g), 0, 0)),
            pl.BlockSpec((1, t, hd), lambda be, ik: (be, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda be, ik: (be // g, ik, 0)),
            pl.BlockSpec((1, block_k, hd), lambda be, ik: (be // g, ik, 0)),
            pl.BlockSpec((1, t, hd), lambda be, ik: (be, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda be, ik: (be, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda be, ik: (be, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, hd), lambda be, ik: (be, ik, 0)),
            pl.BlockSpec((1, block_k, hd), lambda be, ik: (be, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n_kv * g, t, hd), kg.dtype),
            jax.ShapeDtypeStruct((b * n_kv * g, t, hd), vg.dtype),
        ],
        interpret=interpret,
    )(padr, qg, kg, vg, dog, lse, delta)

    dq = dq.reshape(b, n_kv, g, t, hd).transpose(0, 3, 1, 2, 4)
    dq = dq.reshape(b, t, nq, hd)
    # GQA: per-q-head dk/dv group-sum back onto the kv head
    dk = dk_full.reshape(b, n_kv, g, t, hd).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dv_full.reshape(b, n_kv, g, t, hd).sum(axis=2).transpose(0, 2, 1, 3)
    return dq, dk, dv, jnp.zeros((b, t), jnp.float32)  # pad grad unused


# ---------------------------------------------------------------------------
# public entry (differentiable)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, pad_f32, block_q, block_k, interpret, shapes):
    o, _ = _fwd(q, k, v, pad_f32, block_q, block_k, interpret)
    return o


def _flash_fwd_rule(q, k, v, pad_f32, block_q, block_k, interpret, shapes):
    o, res = _fwd(q, k, v, pad_f32, block_q, block_k, interpret)
    return o, res


def _flash_bwd_rule(block_q, block_k, interpret, shapes, res, do):
    return _bwd(block_q, block_k, interpret, shapes, res, do)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,  # (b, t, n_heads, head_dim)
    k: jnp.ndarray,  # (b, t, n_kv, head_dim)
    v: jnp.ndarray,  # (b, t, n_kv, head_dim)
    pad_mask: jnp.ndarray,  # (b, t) 1 = real token (key padding)
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable causal flash attention with key-padding mask and GQA.
    t must be a multiple of the block sizes (pad to a bucket)."""
    b, t, nq, hd = q.shape
    n_kv = k.shape[2]
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0, (
        f"seq len {t} must be a multiple of block sizes (pad to a bucket)")
    shapes = ((b, t, nq, hd), n_kv)
    pad_f32 = pad_mask.astype(jnp.float32)
    return _flash(q, k, v, pad_f32, block_q, block_k, interpret, shapes)
