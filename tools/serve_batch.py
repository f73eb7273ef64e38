#!/usr/bin/env python
"""Continuous-batching synthesis server (offline driver).

Reads a jsonl of {"id", "caption"} rows, admits them into the persistent
decode batch (infer/serve_loop.py), and writes each utterance's wav the
moment its row completes — requests never wait for the whole batch. This is
the high-throughput counterpart of tools/infer.py (one-shot test sets) and
the reference's tools/batch_infer.py (fixed padded batch).

Usage:
  python tools/serve_batch.py -c cfg.yaml -i req.jsonl -o out \
      [--batch 8] [-m 200] [--platform cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-p", "--checkpoint", default="")
    ap.add_argument("-i", "--input-jsonl", required=True)
    ap.add_argument("-o", "--output-dir", default="serve_out")
    ap.add_argument("-m", "--max-frames", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--codec-kind", default="sigma",
                    choices=["sigma", "stableaudio", "melvae"])
    ap.add_argument("--codec-config", default="")
    ap.add_argument("--codec-ckpt", default="")
    ap.add_argument("--platform", default="")
    ap.add_argument("--fused", action="store_true",
                    help="fused wqkv/wgu decode weight layout — wins at "
                         "long KV caches (+22%% at 1024 on v5e), loses at "
                         "short ones (-15%% at 160); use for long-context "
                         "serving")
    ap.add_argument("--int8-kv", action="store_true",
                    help="int8 KV cache with per-(token, head) scales: "
                         "half the cache memory (2x batch/context)")
    ap.add_argument("--int4", action="store_true",
                    help="int4 g128 weight-only LM decode (group-wise "
                         "scales, quarter weight traffic; run the quality "
                         "gate on YOUR checkpoint before enabling)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight-only LM decode (quality-gated by "
                         "tests/test_quant.py on a trained model)")
    ap.add_argument("--stream", type=int, default=0, metavar="CHUNK_FRAMES",
                    help="stream each wav incrementally: sync the device "
                         "every CHUNK_FRAMES decode steps and append PCM "
                         "chunks under an unbounded-size wav header "
                         "(serve/web.wav_chunk_header) — playback can start "
                         "at the first chunk")
    ap.add_argument("--stream-ctx", type=int, default=8,
                    help="left-context frames re-decoded per chunk to keep "
                         "codec conv state warm across chunk boundaries")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from kalle_tpu.core.checkpoint import load_reference_llasa_checkpoint
    from kalle_tpu.core.config import load_experiment_config
    from kalle_tpu.data.datasets import read_jsonl
    from kalle_tpu.data.tokens import build_prompt_ids, build_tokenizer
    from kalle_tpu.infer.pipeline import Codec
    from kalle_tpu.infer.serve_loop import ContinuousBatcher
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.utils.audio import write_wav

    exp = load_experiment_config(args.config)
    cfg = exp.model
    if args.int8_kv:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))
    tok = build_tokenizer(exp.tokenizer_path or None)
    if args.checkpoint:
        params = load_reference_llasa_checkpoint(args.checkpoint, cfg)
    else:
        print("WARNING: no checkpoint given — random init (smoke mode)")
        params = llasa.init_params(cfg, jax.random.key(0))
    if args.int8 or args.int4:
        from kalle_tpu.ops.quant import quantize_llama_params

        params = quantize_llama_params(params, bits=4 if args.int4 else 8)
    if args.fused:
        from kalle_tpu.ops.quant import fuse_decode_params

        params = fuse_decode_params(params)
    if args.codec_config and args.codec_ckpt:
        codec = Codec.load(args.codec_kind, args.codec_config, args.codec_ckpt)
    else:
        print("WARNING: no codec checkpoint — random codec (smoke mode)")
        overrides = {}
        if args.codec_kind == "sigma" and cfg.latent_dim != 64:
            from kalle_tpu.models.codecs.sigmavae import SigmaVAEConfig

            overrides["cfg"] = SigmaVAEConfig.tiny()
        codec = Codec.random_init(args.codec_kind, **overrides)

    rows = read_jsonl(args.input_jsonl)
    os.makedirs(args.output_dir, exist_ok=True)
    prompts, ids_of = [], []
    for i, row in enumerate(rows):
        text = str(row.get("caption") or row.get("AudioSetCaps")
                   or row.get("text"))
        prompts.append(np.asarray(build_prompt_ids(tok, text), np.int32))
        ids_of.append(str(row.get("id", i)))

    cb = ContinuousBatcher(params, cfg, batch_size=args.batch,
                           max_frames=args.max_frames)
    spf = codec.samples_per_frame
    t0 = time.perf_counter()
    n_done = 0

    if args.stream:
        from kalle_tpu.serve.web import wav_chunk_header

        sigma = cfg.head_variant == "sigma"
        files, bufs, ttfa = {}, {}, {}
        for ev, payload in cb.serve(prompts, chunk_frames=args.stream):
            if ev == "chunk":
                ch = payload
                if ch.index not in files:
                    path = os.path.join(args.output_dir,
                                        f"{ids_of[ch.index]}.wav")
                    files[ch.index] = open(path, "wb")
                    files[ch.index].write(
                        wav_chunk_header(codec.sample_rate))
                    bufs[ch.index] = np.zeros((0, ch.means.shape[-1]),
                                              np.float32)
                    ttfa[ch.index] = time.perf_counter() - t0
                lat = ch.samples if sigma else ch.means
                bufs[ch.index] = np.concatenate([bufs[ch.index], lat])
                # re-decode with left context so codec conv receptive
                # fields span the chunk boundary; emit only the new samples
                lo = max(0, ch.start_frame - args.stream_ctx)
                audio = codec.decode_latents(bufs[ch.index][None, lo:])
                new = audio[0, :, (ch.start_frame - lo) * spf:]
                pcm = np.clip(np.asarray(new[0], np.float32), -1, 1)
                files[ch.index].write(
                    (pcm * 32767).astype("<i2").tobytes())
            else:
                comp = payload
                f = files.pop(comp.index, None)
                if f:
                    f.close()
                bufs.pop(comp.index, None)
                n_done += 1
                print(f"[{time.perf_counter()-t0:7.2f}s] "
                      f"{ids_of[comp.index]}.wav ({comp.n_frames} frames, "
                      f"ttfa {ttfa.get(comp.index, 0.0):.2f}s)")
        dt = time.perf_counter() - t0
        print(json.dumps({"requests": n_done, "wall_s": round(dt, 2),
                          "req_per_s": round(n_done / dt, 3),
                          "chunk_frames": args.stream}))
        return

    for comp in cb.run_iter(prompts):
        lat = (comp.samples if cfg.head_variant == "sigma" else comp.means)
        audio = codec.decode_latents(lat[None])
        n = max(comp.n_frames, 1)
        path = os.path.join(args.output_dir, f"{ids_of[comp.index]}.wav")
        write_wav(path, audio[0, :, :n * spf], codec.sample_rate)
        n_done += 1
        print(f"[{time.perf_counter()-t0:7.2f}s] {path} "
              f"({comp.n_frames} frames, waited {comp.steps_waited} steps)")
    dt = time.perf_counter() - t0
    print(json.dumps({"requests": n_done, "wall_s": round(dt, 2),
                      "req_per_s": round(n_done / dt, 3)}))


if __name__ == "__main__":
    main()
