#!/usr/bin/env python
"""Web demo launcher (tools/web_nos.py equivalent).

Usage: python -m kalle_tpu.serve.app -c cfg.yaml -p ckpt [--port 7860]
Default UI needs gradio (absent here -> clear error); `--http` serves the
dependency-free stdlib streaming server instead (serve/http.py — chunked
wav, playback starts at the first chunk).
"""
from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-p", "--checkpoint", default="")
    ap.add_argument("--codec-kind", default="sigma")
    ap.add_argument("--codec-config", default="")
    ap.add_argument("--codec-ckpt", default="")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--max-frames", type=int, default=200)
    ap.add_argument("--http", action="store_true",
                    help="stdlib streaming server (no gradio needed): "
                         "GET /tts?text=... streams chunked wav")
    ap.add_argument("--chunk-frames", type=int, default=25,
                    help="--http mode: decode sync interval (frames) "
                         "between streamed chunks")
    ap.add_argument("--serve-batch", type=int, default=8,
                    help="--http mode: rows in the SHARED decode batch all "
                         "concurrent requests ride (serve/service.py)")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from ..core.checkpoint import load_reference_llasa_checkpoint
    from ..core.config import load_experiment_config
    from ..data.tokens import build_tokenizer
    from ..infer.pipeline import Codec, InferTools
    from ..models.lm import llasa
    from .web import build_app

    exp = load_experiment_config(args.config)
    tokenizer = build_tokenizer(exp.tokenizer_path or None)
    cfg = exp.model
    if args.checkpoint:
        params = load_reference_llasa_checkpoint(args.checkpoint, cfg)
    else:
        params = llasa.init_params(cfg, jax.random.key(0))
    if args.codec_config and args.codec_ckpt:
        codec = Codec.load(args.codec_kind, args.codec_config, args.codec_ckpt)
    else:
        codec = Codec.random_init(args.codec_kind, latent_dim=cfg.latent_dim)

    if args.http:
        from .http import make_stream_fn, serve_http

        stream = make_stream_fn(params, cfg, tokenizer, codec,
                                chunk_frames=args.chunk_frames,
                                max_frames=args.max_frames,
                                batch_size=args.serve_batch)
        srv = serve_http(stream, sample_rate=codec.sample_rate,
                         port=args.port)
        print(f"streaming TTS server on :{args.port} (GET /tts?text=...)")
        srv.serve_forever()
        return

    it = InferTools(cfg, params, tokenizer, codec, output_root="/tmp/serve_out")
    app = build_app(it, max_frames=args.max_frames)
    app.launch(server_name="0.0.0.0", server_port=args.port)


if __name__ == "__main__":
    main()
