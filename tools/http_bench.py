#!/usr/bin/env python
"""Poisson SLO benchmark THROUGH the HTTP layer.

Round 3's Poisson numbers drove ContinuousBatcher.serve directly
(tools/latency_bench.py --poisson) while the HTTP server serialized
requests on a per-request lock — two good halves that didn't compose.
Round 4's serve/service.BatcherService gives every /tts request a row in
ONE shared decode batch; this tool measures the composition end-to-end:
open-loop Poisson arrivals fired as real HTTP requests against a live
serve/http.py server, reporting p50/p95 time-to-first-audio (first PCM
byte after the streaming wav header, ref backup/web.py:145) and e2e.

Usage:
  python tools/http_bench.py --tiny --platform cpu --rates 1,2 --requests 8
  python tools/http_bench.py --rates 2,5,10 --requests 32   (real chip)

Prints one JSON line per rate.
"""
import argparse
import json
import os
import sys
import threading
import time
import urllib.parse
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="2.0",
                    help="comma-separated arrival rates (req/s)")
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--serve-batch", type=int, default=8)
    ap.add_argument("--chunk-frames", type=int, default=8)
    ap.add_argument("--max-frames", type=int, default=64)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kalle_tpu.core.config import LlasaConfig
    from kalle_tpu.data.tokens import build_tokenizer
    from kalle_tpu.infer.pipeline import Codec
    from kalle_tpu.models.codecs.sigmavae import SigmaVAEConfig
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.serve.http import make_stream_fn, serve_http
    from kalle_tpu.serve.web import wav_chunk_header

    if args.tiny:
        codec = Codec.random_init("sigma", cfg=SigmaVAEConfig.tiny())
        cfg = LlasaConfig.tiny()
        cfg = LlasaConfig(llama=cfg.llama, latent_dim=codec.cfg.latent_dim,
                          audio_proj_dim=64, head_variant="sigma")
        dt = jnp.float32
    else:
        from __graft_entry__ import _flagship_cfg

        cfg = _flagship_cfg()
        codec = Codec.random_init("sigma")
        dt = jnp.bfloat16
    import dataclasses

    cfg = dataclasses.replace(cfg, end_kl_threshold=-1.0)
    tok = build_tokenizer(None)
    params = jax.tree.map(lambda x: x.astype(dt),
                          llasa.init_params(cfg, jax.random.key(0)))

    stream = make_stream_fn(params, cfg, tok, codec,
                            chunk_frames=args.chunk_frames,
                            max_frames=args.max_frames,
                            batch_size=args.serve_batch, greedy=True)
    srv = serve_http(stream, sample_rate=codec.sample_rate,
                     host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    hdr_len = len(wav_chunk_header(codec.sample_rate))

    texts = [f"utterance number {i} with some extra words " * (1 + i % 3)
             for i in range(args.requests)]
    # warmup: compile prefill/decode/codec graphs through the full stack
    urllib.request.urlopen(base + "/tts?text=warmup+request",
                           timeout=1200).read()

    rng = np.random.default_rng(0)
    for rate in (float(r) for r in args.rates.split(",")):
        arrivals = np.cumsum(rng.exponential(1.0 / rate,
                                             args.requests)).tolist()
        ttfa, e2e, errs = {}, {}, []
        t0 = time.perf_counter()

        def client(i):
            try:
                delay = arrivals[i] - (time.perf_counter() - t0)
                if delay > 0:
                    time.sleep(delay)
                resp = urllib.request.urlopen(
                    base + "/tts?text=" + urllib.parse.quote(texts[i]),
                    timeout=1200)
                got = b""
                while len(got) <= hdr_len:  # first PCM byte after header
                    chunk = resp.read(hdr_len + 1 - len(got))
                    if not chunk:
                        break
                    got += chunk
                ttfa[i] = time.perf_counter() - t0 - arrivals[i]
                while resp.read(65536):
                    pass
                e2e[i] = time.perf_counter() - t0 - arrivals[i]
            except Exception as e:  # noqa: BLE001
                errs.append((i, repr(e)))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        def pct(d, q):
            v = sorted(d.values())
            if not v:
                return None
            return round(v[min(int(len(v) * q), len(v) - 1)], 3)

        print(json.dumps({
            "metric": "http_poisson_slo", "rate_req_s": rate,
            "batch": args.serve_batch, "requests": args.requests,
            "errors": len(errs), "wall_s": round(wall, 2),
            "p50_ttfa_s": pct(ttfa, 0.5), "p95_ttfa_s": pct(ttfa, 0.95),
            "p50_e2e_s": pct(e2e, 0.5), "p95_e2e_s": pct(e2e, 0.95),
            "chunk_frames": args.chunk_frames,
        }), flush=True)
        if errs:
            print(f"# errors: {errs[:3]}", file=sys.stderr)

    srv.shutdown()
    stream.service.close()


if __name__ == "__main__":
    main()
