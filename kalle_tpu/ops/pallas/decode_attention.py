"""Fused single-frame (t=1) decode attention over the KV cache.

Why: the AR decode step is HBM-bound streaming ~1 GB of weights, but the
XLA lowering of cached attention (gather layer slice -> GQA einsum ->
masked f32 softmax -> einsum) costs ~107 us/layer at batch 32 / cache 160
on v5e — 1.7 ms of the 3.5 ms step, nearly all op overhead: the KV data
itself is only ~10 MB/layer (~13 us at peak BW). This kernel fuses the
whole thing into ONE Pallas pass per layer: flash-style online softmax over
cache blocks in VMEM, one launch replacing ~10 XLA ops. (Replaces the
reference's flash-attention-2 decode dependency, ref model.py:20-23 — the
reference has no decode cache at all and re-forwards the prefix per frame,
model_sigmaVAE.py:123-124.)

Mosaic-lowering ground rules this kernel is built around (hard-won — the
naive broadcast/reshape formulations die with "unsupported shape cast" /
"index not a multiple of 128" on real TPU even though interpret mode
passes):
  * no reshapes/broadcasts that change the tiled (last-two) dims: only
    leading-dim squeezes/expands, lane-dim keepdims reductions, and lane
    broadcasts from size 1;
  * matmuls in standard batched (batch..., m, k) x (batch..., k, n) form —
    hence the cache stores K TRANSPOSED per head, (.., nkv, hd, C), so
    QK^T needs no in-kernel transpose, and V as (.., nkv, C, hd);
  * blocked lane dims must be 128-aligned -> C (cache length) must be a
    multiple of 128 (callers round the cache up; extra slots are masked);
  * softmax stats live lane-replicated at width 128 (the minimum lane
    tile — NOT the C-block width; wider stats just multiply exp traffic).

GQA layout matches ops.attention.mha: q head h uses kv head h // ghd.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
BLOCK_C = 128


def _sideband_scores(q, kn_ref, nv_ref, b, nkvb, ghd, hd):
    """Scores for the sideband current-frame column: (BN, ghd, 1) masked by
    per-row validity. MXU dot_generals throughout — no sublane broadcasts
    (Mosaic rejects them at these shapes)."""
    bn = b * nkvb
    kn = kn_ref[:].reshape(bn, 1, hd).astype(jnp.float32)
    s_cur = jax.lax.dot_general(
        q.astype(jnp.float32), kn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * (hd ** -0.5)  # (BN, ghd, 1)
    nv = jnp.broadcast_to(nv_ref[:][:, None, None, :],
                          (b, nkvb, ghd, 128)).reshape(bn, ghd, 128)
    return s_cur + (nv[..., :1] - 1.0) * (-NEG_INF)


def _kernel(li_ref, q_ref, kt_ref, v_ref, mask_ref, *rest, hd: int,
            quant: bool, sideband: bool):
    del li_ref  # consumed by the BlockSpec index maps (layer selection)
    kn_ref = vn_ref = nv_ref = None
    if sideband:
        kn_ref, vn_ref, nv_ref, *rest = rest
    if quant:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # keep MXU inputs in their storage dtype (bf16) with f32 accumulation —
    # casting whole K/V blocks to f32 on the VPU costs more than the
    # matmuls. tpu.matmul supports only ONE batch dim, so (B, nkvb) merges
    # into a single leading batch dim (leading-dim reshapes are free).
    _, b, nkvb, ghd, _ = q_ref.shape
    cb = v_ref.shape[3]
    bn = b * nkvb
    q = q_ref[:].reshape(bn, ghd, hd)
    kt = kt_ref[:].reshape(bn, hd, cb)
    v = v_ref[:].reshape(bn, cb, hd)
    if quant:  # int8 cache: dequant K via the score columns, V via p
        kt = kt.astype(q.dtype)
        v = v.astype(q.dtype)
    msk = mask_ref[:]                          # (B, ghd, Cb) f32
    msk = jnp.broadcast_to(msk[:, None], (b, nkvb, ghd, cb)).reshape(
        bn, ghd, cb)

    s = jax.lax.dot_general(
        q, kt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * (hd ** -0.5)  # (BN, ghd, Cb)
    if quant:
        s = s * ks_ref[:].reshape(bn, 1, cb)   # per-column K scale
    s = s + (msk - 1.0) * (-NEG_INF)           # 0 valid, NEG_INF masked

    # stats live lane-replicated at the 128-lane minimum tile (NOT the full
    # Cb block width): keeping them Cb-wide costs ~3x the exp()/scratch
    # traffic for identical results — only column 0 is ever consumed
    m_prev = m_ref[:]                          # (BN, ghd, 128)
    m_new = jnp.maximum(
        m_prev, jnp.broadcast_to(jnp.max(s, axis=-1, keepdims=True),
                                 m_prev.shape))
    corr = jnp.exp(m_prev - m_new)             # (BN, ghd, 128)
    p = jnp.exp(s - m_new[..., :1])            # (BN, ghd, Cb)
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new

    if quant:  # fold the per-token V scale into the probabilities
        p = p * vs_ref[:].reshape(bn, 1, cb)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (BN, ghd, hd)
    acc_ref[:] = acc_ref[:] * corr[..., :1] + pv

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        m_fin, l_fin, acc_fin = m_ref[:], l_ref[:], acc_ref[:]
        if sideband:
            # merge the current-frame column (not yet in the cache — the
            # serving loop's ragged scatter is decoupled from the kernel
            # read so XLA can alias it in place; see decode_attention_cached)
            s_cur = _sideband_scores(q, kn_ref, nv_ref, b, nkvb, ghd, hd)
            s_cur_w = jnp.broadcast_to(s_cur, m_fin.shape)
            m_new = jnp.maximum(m_fin, s_cur_w)
            corr2 = jnp.exp(m_fin - m_new)
            p_cur = jnp.exp(s_cur - m_new[..., :1])     # (BN, ghd, 1)
            l_fin = l_fin * corr2 + jnp.exp(s_cur_w - m_new)
            vn = vn_ref[:].reshape(bn, 1, hd).astype(jnp.float32)
            acc_fin = acc_fin * corr2[..., :1] + jax.lax.dot_general(
                p_cur, vn, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        l = jnp.maximum(l_fin[..., :1], 1e-30)  # all-masked row guard
        o_ref[:] = (acc_fin / l).reshape(1, b, nkvb, ghd, hd).astype(
            o_ref.dtype)


def _kernel_single(li_ref, q_ref, kt_ref, v_ref, mask_ref, *rest, hd: int,
                   quant: bool, sideband: bool):
    """Single-column-block fast path (c == cb): plain softmax, no online
    accumulation scratch — saves the m/l/acc zeroing and round-trips."""
    del li_ref
    kn_ref = vn_ref = nv_ref = None
    if sideband:
        kn_ref, vn_ref, nv_ref, *rest = rest
    if quant:
        ks_ref, vs_ref, o_ref = rest
    else:
        (o_ref,) = rest

    _, b, nkvb, ghd, _ = q_ref.shape
    cb = v_ref.shape[3]
    bn = b * nkvb
    q = q_ref[:].reshape(bn, ghd, hd)
    kt = kt_ref[:].reshape(bn, hd, cb)
    v = v_ref[:].reshape(bn, cb, hd)
    if quant:
        kt = kt.astype(q.dtype)
        v = v.astype(q.dtype)
    msk = mask_ref[:]
    msk = jnp.broadcast_to(msk[:, None], (b, nkvb, ghd, cb)).reshape(
        bn, ghd, cb)

    s = jax.lax.dot_general(
        q, kt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if quant:
        s = s * ks_ref[:].reshape(bn, 1, cb)
    s = s + (msk - 1.0) * (-NEG_INF)

    if sideband:  # current-frame column rides beside the cache blocks
        s_cur = _sideband_scores(q, kn_ref, nv_ref, b, nkvb, ghd, hd)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_cur)
        p = jnp.exp(s - m)
        p_cur = jnp.exp(s_cur - m)                   # (BN, ghd, 1)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True) + p_cur, 1e-30)
        vn = vn_ref[:].reshape(bn, 1, hd).astype(jnp.float32)
        pv = jax.lax.dot_general(
            (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        pv = pv + jax.lax.dot_general(
            p_cur / l, vn, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:] = pv.reshape(o_ref.shape).astype(o_ref.dtype)
        return

    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    if quant:
        p = p * vs_ref[:].reshape(bn, 1, cb)
    pv = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = pv.reshape(o_ref.shape).astype(o_ref.dtype)


def _pick_blocks(b, nkv, ghd, hd, c):
    """(nkvb, cb): kv heads and cache columns per grid step. Fewer grid
    steps amortize the per-step DMA/semaphore overhead — the dominant cost
    at these tiny shapes — under a VMEM budget for the double-buffered
    k/v blocks (2 bufs x 2 tensors x b*nkvb*hd*cb bf16 <= ~10 MB)."""
    budget = 10 << 20
    # ladder ordered by v5e measurement (b=32 flagship): (2, 256) beat
    # (4, 128) at both cache 256 (107 vs 120+ us) and 1024 (155 us)
    for nkvb, cb in ((2, 256), (4, 128), (2, 128), (1, 128)):
        if nkv % nkvb or c % cb:
            continue
        if 4 * b * nkvb * hd * cb * 2 <= budget:
            return (nkvb, cb)
    return (1, BLOCK_C)


@functools.partial(jax.jit, static_argnames=("interpret", "blocks"))
def decode_attention_cached(q: jnp.ndarray, k_full: jnp.ndarray,
                            v_full: jnp.ndarray, li, mask: jnp.ndarray,
                            k_scale=None, v_scale=None,
                            k_new=None, v_new=None, new_valid=None,
                            interpret: bool = False,
                            blocks=None) -> jnp.ndarray:
    """One decode frame of GQA attention, reading layer `li` of the FULL
    layer-stacked cache directly (the layer index rides a scalar-prefetch
    into the BlockSpec index maps, so there is NO XLA gather copy of the
    layer slice — at batch 32 / cache 1024 that gather alone is 67 MB =
    ~82 us per layer).

    q      (B, nq, hd)          current queries, RoPE applied
    k_full (L, B, nkv, hd, C)   keys TRANSPOSED per head (roped), C % 128 == 0
    v_full (L, B, nkv, C, hd)
    li     () int32             layer index
    mask   (B, C)               bool/0-1, True = may attend
    k_scale, v_scale            optional (L, B, nkv, 1, C) f32 — int8-cache
                                per-(token, head) scales (k/v int8 then)
    k_new, v_new, new_valid     optional sideband current-frame column:
        (B, nkv, hd) roped K / V of THIS step plus a (B,) validity flag.
        When given, `mask` must be the PRE-update cache validity (current
        column excluded) and the kernel merges the extra column into the
        softmax itself. This keeps the serving loop's ragged cache write
        OUT of the kernel's READ path: an XLA vector-index scatter feeding
        the pallas_call forces a cache layout ({3,2,4,1,0} — scattered
        dims major) conflicting with the default layout this call
        requires, and XLA then inserts TWO 67 MB layout-conversion copies
        per LAYER (~9 of 12 ms/step at b=8 cache 256,
        tools/serve_profile.py --profile round 3). The caller writes the
        column with a per-row dynamic_update_slice CHAIN instead (layout-
        neutral; see serve_loop._decode_layer). An in-kernel DMA write on
        input_output-aliased cache buffers was implemented and REJECTED by
        Mosaic on v5e: the K-cache column write at a dynamic cache offset
        is a width-1 lane-dim slice, and Mosaic requires lane slices to be
        128-aligned (interpret mode passes; the chip doesn't).
        bf16 caches only (serving's kernel path is bf16-gated).
    ->     (B, nq, hd)
    blocks: optional (nkvb, cb) grid-block override for tuning.
    """
    b, nq, hd = q.shape
    _, _, nkv, _, c = k_full.shape
    ghd = nq // nkv
    assert c % BLOCK_C == 0, f"cache length {c} must be a multiple of 128"
    nkvb, cb = blocks or _pick_blocks(b, nkv, ghd, hd, c)

    # mask pre-broadcast over ghd so the kernel never relayouts it
    mask3 = jnp.broadcast_to(mask.astype(jnp.float32)[:, None, :],
                             (b, ghd, c))
    quant = k_scale is not None
    sideband = k_new is not None
    assert not (quant and sideband), \
        "sideband current-frame column is bf16-KV only"

    # index maps take (*grid, *scalar_prefetch_refs); s[0] is the layer
    # index ref
    in_specs = [
        pl.BlockSpec((1, b, nkvb, ghd, hd),
                     lambda g, j, *s: (0, 0, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, nkvb, hd, cb),
                     lambda g, j, *s: (s[0][0], 0, g, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, nkvb, cb, hd),
                     lambda g, j, *s: (s[0][0], 0, g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, ghd, cb), lambda g, j, *s: (0, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    scalars = [jnp.asarray(li, jnp.int32).reshape(1)]
    args = [q.reshape(1, b, nkv, ghd, hd), k_full, v_full, mask3]
    if sideband:
        new_spec = pl.BlockSpec((1, b, nkvb, 1, hd),
                                lambda g, j, *s: (0, 0, g, 0, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [new_spec, new_spec,
                     pl.BlockSpec((b, 128), lambda g, j, *s: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [k_new.reshape(1, b, nkv, 1, hd),
                 v_new.reshape(1, b, nkv, 1, hd),
                 jnp.broadcast_to(
                     new_valid.astype(jnp.float32)[:, None], (b, 128))]
    if quant:
        scale_spec = pl.BlockSpec((1, b, nkvb, 1, cb),
                                  lambda g, j, *s: (s[0][0], 0, g, 0, j),
                                  memory_space=pltpu.VMEM)
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]

    single = c == cb  # one column block: no online-softmax scratch needed
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(nkv // nkvb, c // cb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b, nkvb, ghd, hd),
                               lambda g, j, *s: (0, 0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[] if single else [
            pltpu.VMEM((b * nkvb, ghd, 128), jnp.float32),  # running max
            pltpu.VMEM((b * nkvb, ghd, 128), jnp.float32),  # running denom
            pltpu.VMEM((b * nkvb, ghd, hd), jnp.float32),   # out accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_single if single else _kernel,
                          hd=hd, quant=quant, sideband=sideband),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, b, nkv, ghd, hd), q.dtype),
        interpret=interpret,
    )(*scalars, *args)
    return out.reshape(b, nq, hd)


def decode_attention(q: jnp.ndarray, kt: jnp.ndarray, v: jnp.ndarray,
                     mask: jnp.ndarray, interpret: bool = False,
                     blocks=None) -> jnp.ndarray:
    """Single-layer convenience wrapper: kt (B, nkv, hd, C) /
    v (B, nkv, C, hd) -> (B, nq, hd). See decode_attention_cached."""
    return decode_attention_cached(q, kt[None], v[None], 0, mask,
                                   interpret=interpret, blocks=blocks)
