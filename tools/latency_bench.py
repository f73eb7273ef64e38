#!/usr/bin/env python
"""Serving latency benchmark: p50 time-to-first-audio (TTFA) and end-to-end
RTF including codec decode.

BASELINE.md north-star: p50 TTFA minimized, tracked per release. TTFA here =
prefill + decode `chunk_frames` frames + codec-decode of that first chunk
(streaming playback can start once the first chunk exists).

Prints one JSON line per metric.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chunk-frames", type=int, default=8)
    ap.add_argument("--max-frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke)")
    ap.add_argument("--platform", default="")
    ap.add_argument("--continuous", type=int, default=0, metavar="N",
                    help="continuous-batching curve: N requests through "
                         "infer.serve_loop at batch sizes 1/2/4/8/16 "
                         "(8+ engages the fused decode-attention kernel "
                         "for bf16 KV caches)")
    ap.add_argument("--kernel-min-batch", type=int, default=None,
                    help="override decode_attention_min_batch (1 forces the "
                         "fused kernel on, 10**9 forces it off)")
    ap.add_argument("--poisson", default="", metavar="RATES",
                    help="open-loop SLO bench: comma-separated arrival "
                         "rates (req/s); each rate serves --continuous N "
                         "requests with Exp-distributed inter-arrivals "
                         "through ContinuousBatcher.serve and reports "
                         "p50/p95 TTFA + e2e under load")
    ap.add_argument("--serve-batch", type=int, default=8,
                    help="decode batch for the --poisson server")
    ap.add_argument("--interleave", action="store_true",
                    help="benchmark the text/audio streaming-interleave "
                         "mode (infer/streaming.stream_generate: "
                         "delay-frames warmup + speaker-VAE frame + "
                         "KV-cached lockstep decode, ref infer_backup/"
                         "infer_stream.py:146-207) instead of batch decode")
    ap.add_argument("--delay-frames", type=int, default=3,
                    help="interleave mode: audio stream delay in frames")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kalle_tpu.core.config import LlasaConfig
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.infer.pipeline import Codec
    from kalle_tpu.models.codecs.sigmavae import SigmaVAEConfig
    from kalle_tpu.models.lm import llasa

    if args.tiny:
        cfg = LlasaConfig.tiny()
        codec = Codec.random_init("sigma", cfg=SigmaVAEConfig.tiny())
        cfg = LlasaConfig(llama=cfg.llama, latent_dim=codec.cfg.latent_dim,
                          audio_proj_dim=cfg.audio_proj_dim)
        dt = jnp.float32
    else:
        from __graft_entry__ import _flagship_cfg

        cfg = _flagship_cfg()
        codec = Codec.random_init("sigma")
        dt = jnp.bfloat16

    if args.kernel_min_batch is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, llama=dataclasses.replace(
            cfg.llama, decode_attention_min_batch=args.kernel_min_batch))

    params = llasa.init_params(cfg, jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(dt), params)

    rng = np.random.default_rng(0)
    frame_hz = codec.cfg.frame_rate

    if args.interleave:
        # BASELINE.md's TTFA row names THIS mode: the delay-frames
        # text/audio interleave with a sampled speaker-VAE frame. TTFA =
        # prefill + first chunk_frames lockstep steps + codec decode of the
        # first chunk (same accounting as the batch-decode TTFA above it)
        import dataclasses

        from kalle_tpu.infer.streaming import (sample_speaker_cond,
                                               stream_generate)
        from kalle_tpu.models.lm import variants

        cfg = dataclasses.replace(cfg, head_variant="stableaudio")
        vparams = variants.init_variant_params(cfg, jax.random.key(0),
                                               speaker_vae=True)
        vparams = jax.tree.map(lambda x: x.astype(dt), vparams)
        B = args.batch
        t_text = 64  # fixed pad length (ref infer_stream.py:447)
        ids = jnp.asarray(rng.integers(0, cfg.llama.vocab_size - 9,
                                       (B, t_text)), jnp.int32)
        # delay warmup: encode silence through the codec, take the means
        n = int(round(args.delay_frames * codec.cfg.sample_rate / frame_hz))
        warm = codec.encode_audio(jnp.zeros((B, n), jnp.float32))
        warm = jnp.asarray(warm)[:, : args.delay_frames].astype(dt)
        spk = jnp.tile(sample_speaker_cond(vparams, jax.random.key(1),
                                           cfg.audio_proj_dim).astype(dt),
                       (B, 1))

        def chunk(key, steps):
            res = stream_generate(vparams, cfg, ids, warm, spk, key,
                                  max_steps=steps, end_kl_threshold=-1.0)
            return np.asarray(codec.decode_latents(res.samples))

        chunk(jax.random.key(1), args.chunk_frames)  # compile
        chunk(jax.random.key(1), args.max_frames)
        ttfas = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            chunk(jax.random.key(2 + i), args.chunk_frames)
            ttfas.append(time.perf_counter() - t0)
        n_full = max(args.iters // 2, 1)
        t0 = time.perf_counter()
        for i in range(n_full):
            chunk(jax.random.key(100 + i), args.max_frames)
        dt_full = (time.perf_counter() - t0) / n_full
        rtf = dt_full / (B * args.max_frames / frame_hz)
        print(json.dumps({
            "metric": "interleave_p50_ttfa_s",
            "value": round(sorted(ttfas)[len(ttfas) // 2], 4),
            "p95": round(sorted(ttfas)[int(len(ttfas) * 0.95)], 4),
            "unit": f"s (batch={B}, delay={args.delay_frames}fr, "
                    f"{args.chunk_frames}fr = "
                    f"{args.chunk_frames / frame_hz:.2f}s chunk)"}))
        print(json.dumps({
            "metric": "interleave_rtf_incl_codec",
            "value": round(rtf, 6),
            "unit": f"wall_s_per_audio_s (batch={B})",
            "vs_baseline": round(0.1 / rtf, 2)}))
        return

    if args.poisson:
        from kalle_tpu.infer.serve_loop import ContinuousBatcher

        n_req = args.continuous or 32
        lens = rng.integers(8, 60, (n_req,))
        prompts = [rng.integers(0, cfg.llama.vocab_size - 9, (l,))
                   .astype(np.int32) for l in lens]
        bsz = args.serve_batch
        # compile everything once on a throwaway batcher
        ContinuousBatcher(params, cfg, batch_size=bsz,
                          max_frames=args.max_frames,
                          prompt_buckets=(16, 32, 64)).run(prompts[:bsz])
        for rate in (float(r) for r in args.poisson.split(",")):
            arrivals = np.cumsum(rng.exponential(1.0 / rate, n_req)).tolist()
            cb = ContinuousBatcher(params, cfg, batch_size=bsz,
                                   max_frames=args.max_frames,
                                   prompt_buckets=(16, 32, 64))
            ttfa, e2e = {}, {}
            t0 = time.perf_counter()
            for ev, p in cb.serve(prompts, arrivals=arrivals,
                                  chunk_frames=args.chunk_frames):
                now = time.perf_counter() - t0
                if ev == "chunk" and p.index not in ttfa:
                    ttfa[p.index] = now - arrivals[p.index]
                elif ev == "done":
                    e2e[p.index] = now - arrivals[p.index]
            wall = time.perf_counter() - t0

            def pct(d, q):
                v = sorted(d.values())
                if not v:  # e.g. --chunk-frames 0 yields no chunk events
                    return None
                return round(v[min(int(len(v) * q), len(v) - 1)], 3)

            print(json.dumps({
                "metric": "poisson_slo", "rate_req_s": rate, "batch": bsz,
                "requests": n_req, "wall_s": round(wall, 2),
                "p50_ttfa_s": pct(ttfa, 0.5), "p95_ttfa_s": pct(ttfa, 0.95),
                "p50_e2e_s": pct(e2e, 0.5), "p95_e2e_s": pct(e2e, 0.95),
                "chunk_frames": args.chunk_frames,
            }))
        return

    if args.continuous:
        from kalle_tpu.infer.serve_loop import ContinuousBatcher

        n_req = args.continuous
        lens = rng.integers(8, 60, (n_req,))
        prompts = [rng.integers(0, cfg.llama.vocab_size - 9, (l,))
                   .astype(np.int32) for l in lens]
        for bsz in (1, 2, 4, 8, 16):
            # warmup/compile on a fresh batcher (jit caches are module-level)
            ContinuousBatcher(params, cfg, batch_size=bsz,
                              max_frames=args.max_frames,
                              prompt_buckets=(16, 32, 64)).run(prompts[:bsz])
            cb = ContinuousBatcher(params, cfg, batch_size=bsz,
                                   max_frames=args.max_frames,
                                   prompt_buckets=(16, 32, 64))
            t0 = time.perf_counter()
            comps = cb.run(prompts)
            dt = time.perf_counter() - t0
            step_s = dt / max(cb.step_count, 1)
            lats = sorted(c.steps_waited * step_s for c in comps)
            frames = sum(c.n_frames for c in comps)
            print(json.dumps({
                "metric": "continuous_batching", "batch": bsz,
                "requests": n_req,
                "req_per_s": round(n_req / dt, 3),
                "frames_per_s": round(frames / dt, 1),
                "audio_s_per_wall_s": round(frames / frame_hz / dt, 3),
                "p50_latency_s": round(lats[len(lats) // 2], 3),
                "p95_latency_s": round(lats[int(len(lats) * 0.95)], 3),
            }))
        return

    B = args.batch
    ids = jnp.asarray(rng.integers(0, cfg.llama.vocab_size - 9, (B, 32)),
                      jnp.int32)
    mask = jnp.ones((B, 32), jnp.int32)

    def first_chunk(key):
        res = generate(params, cfg, ids, mask, key,
                       max_frames=args.chunk_frames, end_kl_threshold=-1.0)
        audio = codec.decode_latents(res.samples)
        return np.asarray(audio)

    def full(key):
        res = generate(params, cfg, ids, mask, key,
                       max_frames=args.max_frames, end_kl_threshold=-1.0)
        return codec.decode_latents(res.samples)

    first_chunk(jax.random.key(1))  # compile
    full(jax.random.key(1))

    ttfas = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        first_chunk(jax.random.key(2 + i))
        ttfas.append(time.perf_counter() - t0)
    p50 = sorted(ttfas)[len(ttfas) // 2]

    t0 = time.perf_counter()
    n_full = max(args.iters // 2, 1)
    for i in range(n_full):
        full(jax.random.key(100 + i))
    dt_full = (time.perf_counter() - t0) / n_full
    audio_s = B * args.max_frames / frame_hz
    rtf = dt_full / audio_s

    print(json.dumps({"metric": "p50_time_to_first_audio_s",
                      "value": round(p50, 4),
                      "unit": f"s (batch={B}, {args.chunk_frames} frames "
                              f"= {args.chunk_frames / frame_hz:.2f}s chunk)"}))
    print(json.dumps({"metric": "e2e_rtf_incl_codec",
                      "value": round(rtf, 6),
                      "unit": f"wall_s_per_audio_s (batch={B})",
                      "vs_baseline": round(0.1 / rtf, 2)}))


if __name__ == "__main__":
    main()
