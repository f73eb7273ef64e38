#!/usr/bin/env python
"""Training-step microbenchmark: flagship 1B Llasa on one chip.

Sweeps (batch, bucket, remat, flash) configs through the REAL jitted
train_step (loss + grads + AdamW update) and prints ms/step, tokens/s and
MFU (6·N·tokens model FLOPs over v5e bf16 peak 197 TFLOP/s).

Steps run chained inside one jitted fori-style loop per measurement
(python loop over train_step calls re-uses the donated state; fence =
host fetch of the loss) — >= 8 iters amortizes the axon RPC overhead.

Usage: python tools/train_microbench.py [--configs b8,t512,remat ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--configs", nargs="*", default=[
        "b8,t512,flash",            # round-1 best
        "b16,t512,flash",
        "b4,t1024,flash",
        "b8,t1024,flash,remat",
        "b2,t2048,flash,remat",
    ], help="each: b<batch>,t<bucket>[,remat][,flash][,a<accum>][,u<unroll>]"
            " — a<N> stacks N microbatches (A, B, ...) through the in-step "
            "grad-accumulation scan (tokens/step = N*b*t); u<N> unrolls "
            "the layer scan (scan_unroll)")
    ap.add_argument("--breakdown", action="store_true",
                    help="attribute step time per config: forward-only "
                         "(2N FLOPs/token), forward+backward (6N), full "
                         "step (+AdamW update & global grad norm) — the "
                         "difference columns localize the non-MFU time")
    ap.add_argument("--profile", default="",
                    help="capture a jax.profiler trace of ~8 steps of the "
                         "FIRST config into this dir")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke of the harness itself; "
                         "MFU numbers are meaningless off-chip)")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from kalle_tpu.core.config import TrainConfig
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.train.optim import make_optimizer
    from kalle_tpu.train.step import make_train_state, train_step

    n_params = 1.23e9  # backbone+heads (embed gather excluded from FLOPs)

    for spec in args.configs:
        parts = spec.split(",")
        b = int(parts[0][1:])
        t = int(parts[1][1:])
        accum = next((int(p[1:]) for p in parts
                      if p.startswith("a") and p[1:].isdigit()), 1)
        unroll = next((int(p[1:]) for p in parts
                       if p.startswith("u") and p[1:].isdigit()), 1)
        tcfg = TrainConfig(lr=1e-4, warmup_steps=10, total_steps=1000,
                           gradient_accumulation_steps=accum)
        tx = make_optimizer(tcfg)
        remat = "remat" in parts or "dots" in parts
        flash = "flash" in parts
        if args.tiny:
            from kalle_tpu.core.config import LlasaConfig

            cfg = LlasaConfig.tiny()
            n_params = sum(
                int(np.prod(x.shape)) for x in jax.tree.leaves(
                    llasa.init_params(cfg, jax.random.key(0))))
            flash = False  # interpret-mode flash is pointlessly slow on CPU
        else:
            cfg = _flagship_cfg()
        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(
                cfg.llama, remat=remat, use_flash_attention=flash,
                remat_policy="dots" if "dots" in parts else "full",
                scan_unroll=unroll))

        params = llasa.init_params(cfg, jax.random.key(0))
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        state = make_train_state(params, tx)
        batch_np = _synthetic_batch(cfg, b=b, text_len=32, audio_len=t - 64,
                                    bucket=t)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if isinstance(v, np.ndarray)}
        if accum > 1:
            batch = {k: jnp.broadcast_to(v[None], (accum,) + v.shape)
                     for k, v in batch.items()}
        rng = jax.random.key(1)

        try:
            state, m = train_step(state, cfg, tcfg, tx, batch, rng)  # compile
            float(m["total_loss"])
            if args.profile and spec == args.configs[0]:
                with jax.profiler.trace(args.profile):
                    for _ in range(8):
                        state, m = train_step(state, cfg, tcfg, tx, batch,
                                               rng)
                    float(m["total_loss"])
                print(f"# trace -> {args.profile}", flush=True)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, m = train_step(state, cfg, tcfg, tx, batch, rng)
            loss = float(m["total_loss"])  # fence
            dt = (time.perf_counter() - t0) / args.iters
        except Exception as e:  # OOM etc.
            print(f"{spec:28s} FAILED: {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
            continue
        toks = accum * b * t
        flops = 6 * n_params * toks
        print(f"{spec:28s} {dt*1e3:7.1f} ms/step  {toks/dt/1e3:7.1f}k tok/s"
              f"  MFU {flops/dt/1e12/PEAK_TFLOPS*100:5.1f}%"
              f"  (loss {loss:.3f})", flush=True)

        if args.breakdown:
            from kalle_tpu.train.step import loss_fn

            # forward only (fence: the scalar loss)
            fwd = jax.jit(lambda p, bt, r: loss_fn(p, cfg, tcfg, bt, r)[0])

            # forward+backward WITHOUT the optimizer. DCE guard: returning
            # only the loss would let XLA prune the per-layer dW GEMMs, so
            # also return a sum over every grad leaf (one elementwise read
            # pass over ~2.5 GB of grads, ~3 ms at HBM peak — subtract
            # mentally when comparing against the full step)
            def _fb(p, bt, r):
                (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, cfg, tcfg, bt, r)
                s = jax.tree.reduce(
                    lambda a, x: a + x.sum().astype(jnp.float32), g, 0.0)
                return l, s

            fb = jax.jit(_fb)
            rows = []
            bp = state.params  # `params` was donated into the state
            # breakdown always runs ONE microbatch (b, t); under accum the
            # full step is ~accum x fwd+bwd + the amortized optimizer
            bd_batch = ({k: v[0] for k, v in batch.items()} if accum > 1
                        else batch)
            toks_micro = b * t
            for name, fn, nflops in (("fwd", fwd, 2), ("fwd+bwd", fb, 6)):
                out = fn(bp, bd_batch, rng)
                jax.tree.map(lambda x: np.asarray(x), out)  # compile+fence
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(bp, bd_batch, rng)
                jax.tree.map(lambda x: np.asarray(x), out)
                d = (time.perf_counter() - t0) / args.iters
                rows.append((name, d, nflops))
            for name, d, nf in rows:
                mfu = nf * n_params * toks_micro / d / 1e12 / PEAK_TFLOPS * 100
                print(f"    {name:10s} {d*1e3:7.1f} ms  MFU {mfu:5.1f}%",
                      flush=True)
            fb_ms = rows[1][1] * 1e3
            print(f"    opt+rest   {dt*1e3 - accum * fb_ms:7.1f} ms  "
                  f"(full step - {accum} x fwd+bwd; includes the "
                  f"DCE-guard pass{' and accum adds' if accum > 1 else ''})",
                  flush=True)


if __name__ == "__main__":
    main()
