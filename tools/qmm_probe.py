#!/usr/bin/env python
"""Probe: Pallas streaming qmm / fused_mlp vs XLA qmatmul on the real chip.

Flagship decode shapes (M=32 rows): wq/wo (2048,2048), wg/wu (2048,8192),
wd (8192,2048). Reports per-call time and effective HBM bandwidth on the
weight bytes. Chained fori_loop iterations, 8-byte fence fetch.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--scan-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kalle_tpu.ops.pallas.qmm import fused_mlp, qmm
    from kalle_tpu.ops.quant import qmatmul, quantize_weight

    M, STEPS, BN = args.m, args.steps, args.block
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    wg = quantize_weight(jax.random.normal(k1, (2048, 8192)) * 0.02)
    wu = quantize_weight(jax.random.normal(k2, (2048, 8192)) * 0.02)
    wd = quantize_weight(jax.random.normal(k3, (8192, 2048)) * 0.02)
    x = jax.random.normal(k4, (M, 2048), jnp.bfloat16)

    gb_mlp = (wg["q"].nbytes + wu["q"].nbytes + wd["q"].nbytes) / 1e9

    def bench(fn, label, gb, *ws):
        # weights are explicit jit ARGUMENTS: closing over them would embed
        # them as HLO constants and ship them through the remote-compile
        # pipe (the 768 MB layer stack reliably breaks it)
        @jax.jit
        def loop(x, *ws):
            def step(i, x):
                y = fn(x, *ws)
                return (x + y[:, :2048].astype(x.dtype) * 0).astype(x.dtype)
            return jax.lax.fori_loop(0, STEPS, step, x).sum()

        np.asarray(loop(x, *ws))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(loop(x, *ws))
        dt = (time.perf_counter() - t0) / 3 / STEPS
        print(f"{label:28s} {dt*1e3:7.3f} ms   BW {gb/dt:6.0f} GB/s")

    if not args.scan_only:
        # single big matmul: wg only
        bench(lambda x, wg: qmatmul(x, wg), "XLA qmatmul (2048x8192)",
              wg["q"].nbytes / 1e9, wg)
        bench(lambda x, wg: qmm(x, wg["q"], wg["scale"], block_n=BN),
              f"pallas qmm bn={BN}", wg["q"].nbytes / 1e9, wg)

        # full MLP
        def xla_mlp(x, wg, wu, wd):
            g = jax.nn.silu(qmatmul(x, wg))
            u = qmatmul(x, wu)
            return qmatmul((g * u).astype(x.dtype), wd)

        bench(xla_mlp, "XLA 3-matmul MLP", gb_mlp, wg, wu, wd)
        for bf in (256, 512, 1024):
            bench(lambda x, wg, wu, wd, bf=bf:
                  fused_mlp(x, wg, wu, wd, block_f=bf),
                  f"pallas fused_mlp bf={bf}", gb_mlp, wg, wu, wd)

    # --- product structure: 16 layers stacked, lax.scan over layers -------
    L = 16
    stack = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), (wg, wu, wd))
    gb_l = gb_mlp * L

    def scan_of(mlp_fn, x, stack):
        def body(x, lp):
            g, u, d = lp
            return (x + mlp_fn(x, g, u, d).astype(x.dtype) * 0).astype(
                x.dtype), None
        y, _ = jax.lax.scan(body, x, stack)
        return y

    bench(lambda x, stack: scan_of(
        lambda x, g, u, d: qmatmul(
            (jax.nn.silu(qmatmul(x, g)) * qmatmul(x, u)).astype(x.dtype), d),
        x, stack), "XLA MLP in 16-layer scan", gb_l, stack)
    bench(lambda x, stack: scan_of(
        lambda x, g, u, d: fused_mlp(x, g, u, d, block_f=512), x, stack),
        "pallas fused_mlp in scan", gb_l, stack)


if __name__ == "__main__":
    main()
