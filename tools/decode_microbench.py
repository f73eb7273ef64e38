#!/usr/bin/env python
"""Decode-step microbenchmark: localize where the AR decode step time goes.

Variants (all 1B flagship shapes, batch B, one frame per step):
  weights   -- scan over L layers doing only the 7 weight matmuls on a
               (B, h) activation: the pure weight-streaming floor as XLA
               actually achieves it (no attention / cache / norms).
  step      -- one full decode step: llama.forward_with_cache(t=1) with a
               realistic cache (prompt 32 + 128 frames) + head + embed.
  step_nokv -- same but cache_len=128 (minimal) to isolate KV-cache cost.
  gen       -- full generate() loop amortized per step (cross-check).

Each variant runs STEPS iterations inside one jitted fori_loop (chained
data dependence), so per-step time excludes host dispatch. Fence = host
fetch of an 8-byte reduction (axon: block_until_ready is a no-op).

Usage: python tools/decode_microbench.py [--batch 32] [--int8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=3):
    fn(*args)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(*args)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int4", action="store_true",
                    help="int4 g128 weight-only (group-wise scales; "
                         "quarter weight traffic)")
    ap.add_argument("--fused", action="store_true",
                    help="fused wqkv/wgu decode weight layout")
    ap.add_argument("--int8-kv", action="store_true",
                    help="int8 KV cache with per-token scales")
    ap.add_argument("--kernel-min-batch", type=int, default=None,
                    help="override decode_attention_min_batch (1 forces the "
                         "fused kernel on, 10**9 forces it off)")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from kalle_tpu.models.lm import llama, llasa
    from kalle_tpu.ops.quant import (fuse_decode_params, maybe_matmul,
                                     quantize_llama_params)

    cfg = _flagship_cfg()
    lcfg = cfg.llama
    import dataclasses

    if args.int8_kv:
        lcfg = dataclasses.replace(lcfg, kv_cache_dtype="int8")
    if args.kernel_min_batch is not None:
        lcfg = dataclasses.replace(
            lcfg, decode_attention_min_batch=args.kernel_min_batch)
    B, STEPS = args.batch, args.steps
    params = llasa.init_params(cfg, jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if args.int4:
        params = quantize_llama_params(params, bits=4)
    elif args.int8:
        params = quantize_llama_params(params)
    if args.fused:
        params = fuse_decode_params(params)

    layers = params["llama"]["layers"]

    def wbytes(t):
        return sum(x.nbytes for x in jax.tree.leaves(t))

    stream_gb = wbytes(layers) / 1e9
    print(f"batch={B} int8={args.int8} int4={args.int4} "
          f"streamed weights {stream_gb:.2f} GB "
          f"(+embed {params['llama']['embed'].nbytes/1e9:.2f} GB gathered)")

    # ---- weights-only floor ----------------------------------------------
    @jax.jit
    def weights_only(params, x):
        layers = params["llama"]["layers"]

        def one(x, lp):
            if "wqkv" in lp:
                qkv = maybe_matmul(x, lp["wqkv"])
                q, kv = qkv[:, :2048], qkv[:, 2048:]
                x = x + maybe_matmul(q, lp["wo"])
                gu = maybe_matmul(x, lp["wgu"])
                g, u = jnp.split(gu, 2, axis=-1)
                x = (x + maybe_matmul(jax.nn.silu(g) * u, lp["wd"])
                     + kv.sum())
            else:
                q = maybe_matmul(x, lp["wq"])
                k = maybe_matmul(x, lp["wk"])
                v = maybe_matmul(x, lp["wv"])
                x = x + maybe_matmul(q, lp["wo"])
                g = jax.nn.silu(maybe_matmul(x, lp["wg"]))
                u = maybe_matmul(x, lp["wu"])
                x = x + maybe_matmul(g * u, lp["wd"]) + k.sum() + v.sum()
            return x, None

        def step(i, x):
            x, _ = jax.lax.scan(one, x, layers)
            return x

        return jax.lax.fori_loop(0, STEPS, step, x).sum()

    x = jnp.ones((B, lcfg.hidden_size), jnp.bfloat16)
    dt = bench(lambda: np.asarray(weights_only(params, x)))
    print(f"weights-only: {dt/STEPS*1e3:7.3f} ms/step   "
          f"BW {stream_gb/(dt/STEPS):6.0f} GB/s")

    # ---- full decode step -------------------------------------------------
    def make_step(cache_len):
        @jax.jit
        def run(params, emb0):
            cache = llama.KVCache.zeros(lcfg, B, cache_len)
            valid = jnp.ones((B, cache_len), bool)

            def step(i, carry):
                emb, cache = carry
                h, cache = llama.forward_with_cache(
                    params["llama"], lcfg, emb, cache,
                    attention_mask=valid,
                    positions=jnp.full((B, 1), 64, jnp.int32))
                mean = llasa.distribution_head(params, h, jnp.bfloat16)
                emb = llasa.audio_proj(params, mean, jnp.bfloat16)
                # keep cache.length static across iterations
                cache = cache._replace(length=jnp.zeros((), jnp.int32) + 32)
                return emb, cache

            emb, cache = jax.lax.fori_loop(0, STEPS, step, (emb0, cache))
            return emb.sum()

        return run

    emb0 = jnp.ones((B, 1, lcfg.hidden_size), jnp.bfloat16)
    for cache_len, label in ((256, "step (cache 256)"),
                             (1024, "step (cache 1024)")):
        run = make_step(cache_len)
        dt = bench(lambda r=run: np.asarray(r(params, emb0)))
        kv_gb = (2 * lcfg.num_layers * B * cache_len * lcfg.num_kv_heads
                 * lcfg.head_dim * 2) / 1e9
        print(f"{label}: {dt/STEPS*1e3:7.3f} ms/step   kv={kv_gb*1e3:.0f} MB "
              f"eff-BW {(stream_gb+kv_gb)/(dt/STEPS):6.0f} GB/s")


if __name__ == "__main__":
    main()
