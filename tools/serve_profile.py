#!/usr/bin/env python
"""Profile / time the CONTINUOUS-BATCHING decode step in isolation.

tools/decode_microbench.py times llama.forward_with_cache (the aligned
generate path: all rows share one write position -> dynamic_update_slice).
The serving loop's decode_step differs: each row scatters its KV at its own
`lengths[row]` (infer/serve_loop._decode_layer). The fused decode-attention
kernel's win/loss can differ between the two: PRE-sideband, the kernel lost
in serving below b=32 (the `--profile` trace from this tool attributed that
to two 67 MB XLA layout-conversion copies per layer, not the kernel); the
sideband-column redesign removed the copies and the kernel now wins from
b>=8 on bf16 KV (the current gate default). Gate decisions for serving must
come from THIS benchmark, and `--profile` captures a jax.profiler trace to
attribute any gap.

Usage:
  python tools/serve_profile.py --batch 8 --steps 128 [--kernel-min-batch N]
      [--occupancy 0.75] [--profile /tmp/serve_trace]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--max-frames", type=int, default=160)
    ap.add_argument("--kernel-min-batch", type=int, default=None,
                    help="override decode_attention_min_batch (1 forces the "
                         "fused kernel on, 10**9 forces it off)")
    ap.add_argument("--int8", action="store_true", help="int8 weights")
    ap.add_argument("--int8-kv", action="store_true", help="int8 KV cache")
    ap.add_argument("--occupancy", type=float, default=0.75,
                    help="fraction of rows active (ragged lengths)")
    ap.add_argument("--profile", default="",
                    help="capture a jax.profiler trace of ~16 steps here")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from kalle_tpu.infer.serve_loop import ContinuousBatcher, decode_until
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.ops.quant import quantize_llama_params

    cfg = _flagship_cfg()
    if args.kernel_min_batch is not None or args.int8_kv:
        lcfg = cfg.llama
        if args.kernel_min_batch is not None:
            lcfg = dataclasses.replace(
                lcfg, decode_attention_min_batch=args.kernel_min_batch)
        if args.int8_kv:
            lcfg = dataclasses.replace(lcfg, kv_cache_dtype="int8")
        cfg = dataclasses.replace(cfg, llama=lcfg)

    params = llasa.init_params(cfg, jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if args.int8:
        params = quantize_llama_params(params)

    B = args.batch
    rng = np.random.default_rng(0)
    # fill every row through the real prefill/insert path, then mark a
    # fraction inactive to reproduce serving raggedness
    cb = ContinuousBatcher(params, cfg, batch_size=B,
                           max_frames=args.max_frames,
                           prompt_buckets=(16, 32, 64))
    prompts = [rng.integers(1, cfg.llama.vocab_size - 9, (n,))
               .astype(np.int32)
               for n in rng.integers(8, 60, (B,))]
    for r, ids in enumerate(prompts):
        cb._admit(r, r, ids)
    n_act = max(1, int(round(B * args.occupancy)))
    active = np.zeros((B,), bool)
    active[:n_act] = True
    cb.state = cb.state._replace(active=jnp.asarray(active))

    # host snapshot so the timed run starts from identical state (the
    # warmup compile call consumes real decode steps AND donates the state)
    snap = jax.tree.map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, cb.state)

    def restore():
        return jax.tree.map(
            lambda a: jnp.asarray(a) if hasattr(a, "shape") else a, snap)

    # warmup + compile with the SAME static max_steps as the timed call
    st, rk, _ = decode_until(params, restore(), cfg, cb.rng,
                             max_steps=args.steps)
    np.asarray(st.n_frames)

    if args.profile:
        st, rk, _ = decode_until(params, restore(), cfg, cb.rng, max_steps=8)
        np.asarray(st.n_frames)  # compile the profile-arm step count
        with jax.profiler.trace(args.profile):
            st, rk, _ = decode_until(params, restore(), cfg, cb.rng,
                                     max_steps=8)
            np.asarray(st.n_frames)  # fence
        print(f"trace written to {args.profile}")

    st0 = restore()
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, st0)
    t0 = time.perf_counter()
    st, rk, n = decode_until(params, st0, cfg, cb.rng,
                             max_steps=args.steps)
    np.asarray(st.n_frames)  # host fetch = honest fence on axon
    dt = time.perf_counter() - t0
    n = int(n)
    print(json.dumps({
        "metric": "serve_decode_step", "batch": B, "active_rows": n_act,
        "steps": n, "ms_per_step": round(dt / max(n, 1) * 1e3, 3),
        "cache_len": int(cb.state.k.shape[-1]),
        "kernel_min_batch": cfg.llama.decode_attention_min_batch,
        "int8_w": args.int8, "int8_kv": args.int8_kv,
    }))


if __name__ == "__main__":
    main()
