#!/usr/bin/env python
"""A/B the fused Pallas decode-attention kernel vs the XLA lowering.

Times L=16 flagship decode-attention calls (chained inside one jitted
fori_loop; host-fetch fence per the axon rules) for batch x cache x block
configurations. This is the isolated-call measurement behind the kernel
gate in llama._layer / serve_loop._decode_layer (bf16 KV + batch >=
decode_attention_min_batch; int8 KV always takes the XLA fused-dequant
path) — rerun it when tuning `ops/pallas/decode_attention._pick_blocks`,
and confirm gate decisions with tools/decode_microbench.py (in-step).

The XLA arm reproduces the fallback exactly: dynamic_index_in_dim layer
gather -> GQA einsum -> masked f32 softmax -> einsum (llama.py:253-261).

Usage: python tools/attn_ab.py [--batches 8,16,32] [--caches 256,1024]
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--caches", default="256,1024")
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--iters", type=int, default=64,
                    help="attention calls per timed fori_loop")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--blocks", default="",
                    help="extra (nkvb,cb) overrides to sweep, e.g. "
                         "'8x256,4x256' — default arm uses _pick_blocks")
    ap.add_argument("--int8", action="store_true",
                    help="int8 KV cache with per-(token, head) scales: XLA "
                         "arm dequantizes the layer slice (llama.py "
                         "fallback), kernel folds scales in-flight")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from kalle_tpu.ops.attention import mha_t
    from kalle_tpu.ops.pallas.decode_attention import (_pick_blocks,
                                                       decode_attention_cached)

    L, nkv, ghd, hd = args.layers, 8, 4, 64  # flagship GQA geometry
    nq = nkv * ghd
    interp = jax.default_backend() != "tpu"

    def bench(fn, *fargs, reps=args.reps):
        out = fn(*fargs)
        float(np.asarray(out.ravel()[0]))  # compile + warmup, honest fence
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*fargs)
            float(np.asarray(out.ravel()[0]))
        return (time.perf_counter() - t0) / reps / args.iters * 1e6  # us/call

    def xla_arm(q, k_full, v_full, mask, ks_full=None, vs_full=None):
        m4 = mask[:, None, None, :]

        def body(i, qq):
            li = jax.lax.rem(i, L)
            kt_l = jax.lax.dynamic_index_in_dim(k_full, li, 0, False)
            vt_l = jax.lax.dynamic_index_in_dim(v_full, li, 0, False)
            if ks_full is not None:  # dequant exactly as llama.py:253-260
                ks_l = jax.lax.dynamic_index_in_dim(ks_full, li, 0, False)
                vs_l = jax.lax.dynamic_index_in_dim(vs_full, li, 0, False)
                kt_l = (kt_l.astype(jnp.float32) * ks_l).astype(jnp.bfloat16)
                vt_l = (vt_l.astype(jnp.float32)
                        * jnp.swapaxes(vs_l, -1, -2)).astype(jnp.bfloat16)
            attn = mha_t(qq[:, None], kt_l, vt_l, m4)
            return (qq + attn[:, 0] * 1e-6).astype(qq.dtype)

        return jax.lax.fori_loop(0, args.iters, body, q)

    def kernel_arm(q, k_full, v_full, mask, ks_full=None, vs_full=None,
                   blocks=None):
        def body(i, qq):
            li = jax.lax.rem(i, L)
            attn = decode_attention_cached(qq, k_full, v_full, li, mask,
                                           k_scale=ks_full, v_scale=vs_full,
                                           interpret=interp, blocks=blocks)
            return (qq + attn * 1e-6).astype(qq.dtype)

        return jax.lax.fori_loop(0, args.iters, body, q)

    xla_j = jax.jit(xla_arm)
    kern_j = jax.jit(kernel_arm, static_argnames=("blocks",))

    extra = []
    for spec in filter(None, args.blocks.split(",")):
        a, b = spec.split("x")
        extra.append((int(a), int(b)))

    batches = [int(b) for b in args.batches.split(",")]
    caches = [int(c) for c in args.caches.split(",")]
    print(f"{'b':>4} {'cache':>6} {'xla us':>8}  kernel us by blocks")
    for b, c in itertools.product(batches, caches):
        key = jax.random.key(b * 1000 + c)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, nq, hd), jnp.bfloat16)
        k_full = jax.random.normal(kk, (L, b, nkv, hd, c), jnp.bfloat16)
        v_full = jax.random.normal(kv, (L, b, nkv, c, hd), jnp.bfloat16)
        ks_full = vs_full = None
        if args.int8:
            amax = jnp.max(jnp.abs(k_full), axis=3, keepdims=True)
            ks_full = (amax / 127.0).astype(jnp.float32)
            k_full = jnp.round(k_full / jnp.maximum(amax, 1e-6) * 127
                               ).astype(jnp.int8)
            amax_v = jnp.max(jnp.abs(v_full), axis=4, keepdims=True)
            vs_full = jnp.swapaxes(amax_v / 127.0, -1, -2).astype(jnp.float32)
            v_full = jnp.round(v_full / jnp.maximum(amax_v, 1e-6) * 127
                               ).astype(jnp.int8)
        # realistic ragged occupancy: rows valid up to ~3/4 of the cache
        valid = (np.arange(c)[None, :]
                 < (c * (0.5 + 0.5 * np.arange(b)[:, None] / b) + 1))
        mask = jnp.asarray(valid)

        t_x = bench(xla_j, q, k_full, v_full, mask, ks_full, vs_full)
        cells = []
        auto = _pick_blocks(b, nkv, ghd, hd, c)
        for blocks in [auto] + [e for e in extra if e != auto]:
            nkvb, cb = blocks
            if nkv % nkvb or c % cb:
                continue
            try:
                t_k = bench(kern_j, q, k_full, v_full, mask, ks_full,
                            vs_full, blocks)
            except Exception as e:  # noqa: BLE001 — mosaic rejects some
                cells.append(f"{nkvb}x{cb}:FAIL({type(e).__name__})")
                continue
            tag = "*" if blocks == auto else ""
            cells.append(f"{nkvb}x{cb}{tag}:{t_k:7.1f}")
        print(f"{b:>4} {c:>6} {t_x:8.1f}  " + "  ".join(cells))


if __name__ == "__main__":
    main()
