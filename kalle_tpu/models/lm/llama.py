"""Llama-3.2 decoder backbone, TPU-first functional JAX.

Design (deliberately not a torch translation):
  * params are a plain pytree; the L transformer layers are STACKED on a
    leading axis and traversed with `lax.scan` -> one compiled layer body,
    fast XLA compile, natural pjit sharding on the stacked axis.
  * static shapes everywhere; right-padded batches with an additive
    causal+padding mask (equivalent to HF attention_mask semantics used at
    ref model_sigmaVAE.py:74-81).
  * decode path carries a static-size KV cache updated with
    dynamic_update_slice — replaces the reference's cache-less O(T^2)
    AR loop (ref model_sigmaVAE.py:123-124).

Weight import from the HF torch checkpoint is in `convert.py`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.config import LlamaConfig
from ...ops.attention import make_causal_padding_mask, mha, mha_t


class KVCache(NamedTuple):
    """Per-model KV cache: stacked over layers, static max_len.

    Layout is attention-kernel-native (ops.pallas.decode_attention): keys
    are stored TRANSPOSED per head so the t=1 decode QK^T needs no
    in-kernel transpose, and values keep (seq, head_dim) minor dims for
    the PV matmul. The XLA path reads the same layout via ops.attention
    .mha_t.

    int8 mode (cfg.kv_cache_dtype == "int8"): k/v hold int8 with per-
    (token, kv-head) absmax scales — halves KV HBM traffic and doubles the
    servable context. The scale tensors carry a broadcast-ready singleton
    dim so the decode kernel multiplies them in without any relayout:
    scores pick up k_scale POST-matmul (per score column), and v_scale
    folds into the probabilities PRE-matmul — int8 never materializes as
    dequantized f32 in HBM."""

    k: jnp.ndarray  # (L, b, n_kv, head_dim, max_len) — transposed keys
    v: jnp.ndarray  # (L, b, n_kv, max_len, head_dim)
    length: jnp.ndarray  # () int32 — number of valid positions
    k_scale: Optional[jnp.ndarray] = None  # (L, b, n_kv, 1, max_len) f32
    v_scale: Optional[jnp.ndarray] = None  # (L, b, n_kv, 1, max_len) f32

    @property
    def max_len(self) -> int:
        return self.k.shape[-1]

    @staticmethod
    def zeros(cfg: LlamaConfig, batch: int, max_len: int, dtype=None) -> "KVCache":
        nkv, hd, L = cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
        int8 = dtype is None and cfg.kv_cache_dtype == "int8"
        dtype = jnp.int8 if int8 else (dtype or jnp.dtype(cfg.dtype))
        return KVCache(
            k=jnp.zeros((L, batch, nkv, hd, max_len), dtype),
            v=jnp.zeros((L, batch, nkv, max_len, hd), dtype),
            length=jnp.zeros((), jnp.int32),
            k_scale=(jnp.zeros((L, batch, nkv, 1, max_len), jnp.float32)
                     if int8 else None),
            v_scale=(jnp.zeros((L, batch, nkv, 1, max_len), jnp.float32)
                     if int8 else None),
        )


def _quantize_kv(x: jnp.ndarray):
    """x (b, t, n_kv, hd) -> (int8 same shape, scale (b, t, n_kv, 1))."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# RoPE (llama3 frequency scaling — matches HF rope_scaling for Llama-3.2)
# ---------------------------------------------------------------------------

def rope_inv_freq(cfg: LlamaConfig) -> jnp.ndarray:
    dim = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    rs = cfg.rope_scaling
    if rs is None:
        return inv_freq
    low_wl = rs.original_max_position_embeddings / rs.low_freq_factor
    high_wl = rs.original_max_position_embeddings / rs.high_freq_factor
    wavelen = 2.0 * jnp.pi / inv_freq
    smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
        rs.high_freq_factor - rs.low_freq_factor
    )
    smoothed = (1.0 - smooth) * inv_freq / rs.factor + smooth * inv_freq
    out = jnp.where(wavelen > low_wl, inv_freq / rs.factor, inv_freq)
    is_mid = jnp.logical_and(wavelen <= low_wl, wavelen >= high_wl)
    return jnp.where(is_mid, smoothed, out)


def rope_cos_sin(cfg: LlamaConfig, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions: (t,) or (b, t) int -> cos/sin of shape positions.shape + (head_dim,)."""
    inv_freq = rope_inv_freq(cfg)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (b, t, h, d); cos/sin: (t, d) or (b, t, d). HF rotate-half layout."""
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, key: jax.Array) -> dict:
    """Random init (normal/0.02) with layers stacked on axis 0."""
    pdt = jnp.dtype(cfg.param_dtype)
    h, ffn = cfg.hidden_size, cfg.intermediate_size
    nq, nkv, hd, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    ks = jax.random.split(key, 8)

    def norm01(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(pdt)

    return {
        "embed": norm01(ks[0], (cfg.vocab_size, h), h),
        "layers": {
            "attn_norm": jnp.ones((L, h), pdt),
            "wq": norm01(ks[1], (L, h, nq * hd), h),
            "wk": norm01(ks[2], (L, h, nkv * hd), h),
            "wv": norm01(ks[3], (L, h, nkv * hd), h),
            "wo": norm01(ks[4], (L, nq * hd, h), nq * hd),
            "mlp_norm": jnp.ones((L, h), pdt),
            "wg": norm01(ks[5], (L, h, ffn), h),
            "wu": norm01(ks[6], (L, h, ffn), h),
            "wd": norm01(ks[7], (L, ffn, h), ffn),
        },
        "final_norm": jnp.ones((h,), pdt),
    }


def embed_tokens(params: dict, input_ids: jnp.ndarray, cfg: LlamaConfig) -> jnp.ndarray:
    return params["embed"].astype(jnp.dtype(cfg.dtype))[input_ids]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _megatron_fg(axis: str):
    """Megatron's f/g conjugate operators for MANUALLY differentiated
    shard_map bodies (parallel/pipeline_1f1b.py). Inside a shard_map body
    `jax.vjp` blindly transposes psum -> psum, which double-counts a
    replicated cotangent by the axis size; these custom transposes encode
    the replication structure instead:
      f: identity forward / psum backward — marks a replicated activation
         entering tp-local (column-sharded) compute, so the per-shard
         input cotangents are summed.
      g: psum forward / identity backward — combines row-parallel partial
         outputs; the replicated output cotangent IS each shard's partial
         cotangent.
    Not needed when jax.grad differentiates THROUGH the shard_map (the
    GPipe path): the shard_map transpose machinery handles bare psums."""
    @jax.custom_vjp
    def f(x):
        return x

    f.defvjp(lambda x: (x, None),
             lambda _, ct: (jax.lax.psum(ct, axis),))

    @jax.custom_vjp
    def g(x):
        return jax.lax.psum(x, axis)

    g.defvjp(lambda x: (jax.lax.psum(x, axis), None),
             lambda _, ct: (ct,))
    return f, g


def _layer(cfg: LlamaConfig, x, lp, cos, sin, mask, cache_kv=None,
           cache_len=None, flash_pad_mask=None, flash_interpret=False,
           tp_axis=None, tp_megatron_vjp=False):
    """One transformer block. cache_kv: optional (k_full, v_full, li) —
    the FULL (L, b, max_len, n_kv, hd) caches plus the layer index; the new
    K/V entries are written in place at (li, :, cache_len) and attention
    reads the updated layer slice. Returns (x_out, (k_full, v_full)).
    flash_pad_mask: when set (b, t), attention runs through the Pallas
    flash kernel (differentiable — custom VJP) instead of the XLA path.
    tp_axis: manual tensor parallelism for shard_map bodies (pp x tp): lp
    holds this rank's Megatron column/row shards (heads and ffn columns
    divided by the tp size), x/mask are replicated over tp, and the
    row-parallel wo/wd matmul outputs are psum-reduced over `tp_axis`
    before the residual adds. tp_megatron_vjp: route the tp collectives
    through the _megatron_fg custom-transpose operators — REQUIRED when the
    caller differentiates this body with a manual jax.vjp inside shard_map
    (the 1F1B schedule); leave False under plain jax.grad-through-shard_map."""
    dt = jnp.dtype(cfg.dtype)
    b, t, h = x.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    tp_n = 1 if tp_axis is None else jax.lax.axis_size(tp_axis)
    if tp_n > 1:
        assert nq % tp_n == 0 and nkv % tp_n == 0, (nq, nkv, tp_n)
        nq, nkv = nq // tp_n, nkv // tp_n

    from ...ops.quant import maybe_matmul

    if tp_axis is not None and tp_megatron_vjp:
        tp_in, psum_tp = _megatron_fg(tp_axis)
    else:
        tp_in = lambda y: y

        def psum_tp(y):  # row-parallel partial sums -> full output
            return y if tp_axis is None else jax.lax.psum(y, tp_axis)

    attn_in = tp_in(rms_norm(x, lp["attn_norm"].astype(dt), cfg.rms_norm_eps))
    if "wqkv" in lp:
        # fused decode layout (ops.quant.fuse_decode_params): one wide
        # weight stream, split back into q/k/v — same math
        qkv = maybe_matmul(attn_in, lp["wqkv"])
        q = qkv[..., : nq * hd].reshape(b, t, nq, hd)
        k = qkv[..., nq * hd: (nq + nkv) * hd].reshape(b, t, nkv, hd)
        v = qkv[..., (nq + nkv) * hd:].reshape(b, t, nkv, hd)
    else:
        q = maybe_matmul(attn_in, lp["wq"]).reshape(b, t, nq, hd)
        k = maybe_matmul(attn_in, lp["wk"]).reshape(b, t, nkv, hd)
        v = maybe_matmul(attn_in, lp["wv"]).reshape(b, t, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    def mlp(x):
        mlp_in = tp_in(rms_norm(x, lp["mlp_norm"].astype(dt),
                                cfg.rms_norm_eps))
        if "wgu" in lp:  # fused decode layout: one gate|up stream
            gu = maybe_matmul(mlp_in, lp["wgu"])
            g, up = jnp.split(gu, 2, axis=-1)
            gate = jax.nn.silu(g)
        else:
            gate = jax.nn.silu(maybe_matmul(mlp_in, lp["wg"]))
            up = maybe_matmul(mlp_in, lp["wu"])
        return x + psum_tp(maybe_matmul(gate * up, lp["wd"]))

    if flash_pad_mask is not None and cache_kv is None:
        from ...ops.pallas.flash_attention import flash_attention

        attn = flash_attention(q, k, v, flash_pad_mask,
                               interpret=flash_interpret)
        x = x + psum_tp(maybe_matmul(attn.reshape(b, t, nq * hd), lp["wo"]))
        return mlp(x), (k, v)

    if cache_kv is not None:
        # cache layouts: k (L,b,nkv,hd,C) transposed, v (L,b,nkv,C,hd);
        # optional int8 mode with per-(token, head) scales (L,b,nkv,1,C)
        k_full, v_full, ks_full, vs_full, li = cache_kv
        if ks_full is not None:
            k_st, ks = _quantize_kv(k)
            v_st, vs = _quantize_kv(v)
            ks_full = jax.lax.dynamic_update_slice(
                ks_full, jnp.transpose(ks, (0, 2, 3, 1))[None],
                (li, 0, 0, 0, cache_len))
            vs_full = jax.lax.dynamic_update_slice(
                vs_full, jnp.transpose(vs, (0, 2, 3, 1))[None],
                (li, 0, 0, 0, cache_len))
        else:
            k_st, v_st = k, v
        k_full = jax.lax.dynamic_update_slice(
            k_full, jnp.transpose(k_st, (0, 2, 3, 1))[None].astype(
                k_full.dtype), (li, 0, 0, 0, cache_len))
        v_full = jax.lax.dynamic_update_slice(
            v_full, jnp.transpose(v_st, (0, 2, 1, 3))[None].astype(
                v_full.dtype), (li, 0, 0, cache_len, 0))
        c = k_full.shape[-1]
        # bf16 KV only (ks_full None): with an int8 cache XLA's fused
        # dequant-attention matches/beats the kernel everywhere measured;
        # for bf16 the kernel wins from b=8 up (+4%..+27%, growing with
        # batch and cache — decode_microbench r3, see config.py)
        if (t == 1 and b >= cfg.decode_attention_min_batch
                and ks_full is None
                and cfg.use_decode_attention and c % 128 == 0
                and jax.default_backend() == "tpu"):
            # fused kernel reads layer li of the FULL cache via
            # scalar-prefetch — no XLA gather copy of the layer slice
            from ...ops.pallas.decode_attention import (
                decode_attention_cached)

            attn = decode_attention_cached(
                q[:, 0], k_full, v_full, li, mask[:, 0, 0, :],
                k_scale=ks_full, v_scale=vs_full)[:, None]
        else:
            kt_l = jax.lax.dynamic_index_in_dim(k_full, li, 0, False)
            vt_l = jax.lax.dynamic_index_in_dim(v_full, li, 0, False)
            if ks_full is not None:
                ks_l = jax.lax.dynamic_index_in_dim(ks_full, li, 0, False)
                vs_l = jax.lax.dynamic_index_in_dim(vs_full, li, 0, False)
                kt_l = (kt_l.astype(jnp.float32) * ks_l).astype(dt)
                vt_l = (vt_l.astype(jnp.float32)
                        * jnp.swapaxes(vs_l, -1, -2)).astype(dt)
            attn = mha_t(q, kt_l, vt_l, mask)
        new_kv = (k_full, v_full, ks_full, vs_full)
    else:
        attn = mha(q, k, v, mask)
        new_kv = (k, v)

    x = x + psum_tp(maybe_matmul(attn.reshape(b, t, nq * hd), lp["wo"]))
    return mlp(x), new_kv


def forward(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (b, t, h)
    attention_mask: jnp.ndarray,  # (b, t) 1 = real
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Full-sequence forward -> final hidden states (b, t, h).
    Equivalent of `base_model.model(inputs_embeds, attention_mask)[0]`
    (ref: model_sigmaVAE.py:78-81).

    use_flash: None (default) follows cfg.use_flash_attention on TPU and is
    off on CPU; an explicit True on CPU runs the Pallas kernel in interpret
    mode (slow — test use only). Flash needs t % 128 == 0 (every batch
    bucket satisfies this, core/config.py length_buckets); t is never sp-
    sharded inside the kernel because flash runs per-(b, head) rows and the
    sp constraint applies between layers."""
    dt = jnp.dtype(cfg.dtype)
    x = inputs_embeds.astype(dt)
    b, t, _ = x.shape
    positions = jnp.arange(t)
    cos, sin = rope_cos_sin(cfg, positions)
    on_cpu = jax.default_backend() == "cpu"
    if use_flash is None:
        use_flash = cfg.use_flash_attention and not on_cpu
    flash_ok = use_flash and t % 128 == 0
    flash_pad = attention_mask if flash_ok else None
    mask = None if flash_pad is not None else make_causal_padding_mask(
        attention_mask, t)

    from ...parallel.mesh import (activation_seq_constraint,
                                  layer_slice_constraint)
    from ...parallel.pipeline import PP_AXIS, pipelined_layer_stack

    ambient = jax.sharding.get_abstract_mesh()
    if (ambient is not None and PP_AXIS in getattr(ambient, "axis_names", ())
            and dict(ambient.shape)[PP_AXIS] > 1):
        # pipeline parallelism: layers partitioned over pp stages,
        # microbatches rotate through them (parallel/pipeline.py). The mask
        # travels with its microbatch; attention uses the XLA path (the
        # per-stage microbatch shapes are small). With a tp axis in the
        # mesh, each stage's layer weights are additionally Megatron-
        # sharded and the body psums over tp (pp x tp composition).
        pmask = mask if mask is not None else make_causal_padding_mask(
            attention_mask, t)
        from ...parallel.mesh import TP_AXIS
        shape = dict(ambient.shape)
        tp_ax = (TP_AXIS if shape.get(TP_AXIS, 1) > 1 else None)

        def pp_layer(state, lp):
            h, mk = state
            h, _ = _layer(cfg, h, lp, cos, sin, mk, tp_axis=tp_ax)
            return h, mk

        if cfg.remat:
            pp_layer = jax.checkpoint(pp_layer, policy=_remat_policy(cfg))
        x = pipelined_layer_stack(pp_layer, params["layers"], x, pmask,
                                  n_microbatches=cfg.pp_microbatches)
        return rms_norm(x, params["final_norm"].astype(dt), cfg.rms_norm_eps)

    def body(x, lp):
        x = activation_seq_constraint(x)  # sequence parallelism (sp axis)
        lp = layer_slice_constraint(lp)  # clean scan-bwd resharding
        x, _ = _layer(cfg, x, lp, cos, sin, mask, flash_pad_mask=flash_pad,
                      flash_interpret=on_cpu)
        return x, None

    if cfg.remat:
        body = jax.checkpoint(body, policy=_remat_policy(cfg))
    x, _ = jax.lax.scan(body, x, params["layers"], unroll=cfg.scan_unroll)
    return rms_norm(x, params["final_norm"].astype(dt), cfg.rms_norm_eps)


def _remat_policy(cfg: LlamaConfig):
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None  # "full": recompute everything


def forward_with_cache(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (b, t, h)
    cache: KVCache,
    attention_mask: Optional[jnp.ndarray] = None,  # (b, max_len) over cache
    positions: Optional[jnp.ndarray] = None,  # (b, t) RoPE positions
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill/decode forward. Writes K/V at [cache.length, cache.length+t)
    and attends over the whole static cache with position-validity masking.

    `positions` overrides the default arange-from-cache.length RoPE
    positions — used for batched decode with left-padded prompts, where
    each row's local position differs from its cache slot."""
    dt = jnp.dtype(cfg.dtype)
    x = inputs_embeds.astype(dt)
    b, t, _ = x.shape
    max_len = cache.max_len

    slots = cache.length + jnp.arange(t)
    if positions is None:
        positions = jnp.broadcast_to(slots[None, :], (b, t))
    cos, sin = rope_cos_sin(cfg, positions)

    k_pos = jnp.arange(max_len)[None, :]
    valid = k_pos < (cache.length + t)  # (1, max_len)
    if attention_mask is not None:
        valid = jnp.logical_and(valid, attention_mask.astype(bool))
    else:
        valid = jnp.broadcast_to(valid, (b, max_len))
    q_slot = slots[None, :, None]  # (1, t, 1) — causality by cache slot
    causal = k_pos[None, :, :] <= q_slot  # (1, t, max_len)
    mask = jnp.logical_and(causal, valid[:, None, :])[:, None, :, :]

    # The full (L, ...) cache rides the scan CARRY and is updated in place
    # with a layer-indexed dynamic_update_slice: XLA aliases the carry
    # buffer across scan/while iterations, so each decode step writes only
    # the new (b, t, n_kv, hd) entries instead of materializing fresh
    # scan-ys cache arrays (measured on v5e, b=32 int8 decode: 6.0 -> 4.2
    # ms/step at cache 160; 11.7 -> 7.3 at cache 1024).
    def body(carry, layer_in):
        x, k_full, v_full, ks, vs = carry
        li, lp = layer_in
        x, (k_full, v_full, ks, vs) = _layer(
            cfg, x, lp, cos, sin, mask, (k_full, v_full, ks, vs, li),
            cache.length)
        return (x, k_full, v_full, ks, vs), None

    (x, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
        (jnp.arange(cfg.num_layers), params["layers"]))
    x = rms_norm(x, params["final_norm"].astype(dt), cfg.rms_norm_eps)
    return x, KVCache(k=new_k, v=new_v, length=cache.length + t,
                      k_scale=new_ks, v_scale=new_vs)
