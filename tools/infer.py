#!/usr/bin/env python
"""Synthesis CLI.

Usage:
  python tools/infer.py -c cfg.yaml -p ckpt -i test.jsonl -o out_root \
      [-m max_frames] [--codec-kind sigma]

Mirrors the reference inference scripts' argparse surface
(ref infer_vibevoice.py:434-448: -c/-d/-m/-p/-i/-s/-o).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-p", "--checkpoint", default="")
    ap.add_argument("-i", "--input-jsonl", required=True)
    ap.add_argument("-o", "--output-root", default="inference_results")
    ap.add_argument("-m", "--max-frames", type=int, default=200)
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--codec-kind", default="sigma",
                    choices=["sigma", "stableaudio", "melvae"])
    ap.add_argument("--codec-config", default="")
    ap.add_argument("--codec-ckpt", default="")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--platform", default="",
                    help="force jax platform (e.g. cpu); the environment's "
                         "sitecustomize pins the TPU otherwise")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from kalle_tpu.core.checkpoint import load_reference_llasa_checkpoint
    from kalle_tpu.core.config import load_experiment_config
    from kalle_tpu.data.tokens import build_tokenizer
    from kalle_tpu.infer.pipeline import Codec, InferTools
    from kalle_tpu.models.lm import llasa

    exp = load_experiment_config(args.config)
    tokenizer = build_tokenizer(exp.tokenizer_path or None)
    cfg = exp.model

    if args.checkpoint and args.checkpoint.endswith(".pt"):
        params = load_reference_llasa_checkpoint(args.checkpoint, cfg)
    elif args.checkpoint and args.checkpoint.endswith(".npz"):
        from kalle_tpu.core.checkpoint import load_params_npz

        params = load_params_npz(args.checkpoint)
    else:
        print("WARNING: no checkpoint given — random init (smoke mode)")
        params = llasa.init_params(cfg, jax.random.key(args.seed))

    if args.codec_config and args.codec_ckpt:
        codec = Codec.load(args.codec_kind, args.codec_config, args.codec_ckpt)
    else:
        print("WARNING: no codec checkpoint — random codec (smoke mode)")
        if args.codec_kind == "sigma":
            codec = Codec.random_init("sigma", latent_dim=cfg.latent_dim)
        elif args.codec_kind == "stableaudio":
            codec = Codec.random_init("stableaudio", latent_dim=cfg.latent_dim,
                                      encoder_out_dim=2 * cfg.latent_dim)
        else:
            codec = Codec.random_init("melvae", latent_dim=cfg.latent_dim)

    ckpt_name = os.path.basename(args.checkpoint) or "random"
    it = InferTools(cfg, params, tokenizer, codec,
                    output_root=args.output_root,
                    version=exp.project_name, ckpt_name=ckpt_name,
                    seed=args.seed)
    files = it.infer_jsonl(args.input_jsonl, max_frames=args.max_frames,
                           limit=args.limit)
    print(f"wrote {len(files)} files to {it.output_dir}")


if __name__ == "__main__":
    main()
