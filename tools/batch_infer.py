#!/usr/bin/env python
"""Batched sampling demo: repeat one prompt N times, decode a fixed number
of AR steps, report the per-step end-KL trace.

Equivalent of tools/batch_infer.py (repeats the prompt x5, 50 fixed steps,
per-step KL printout) — here the batch runs in ONE KV-cached jitted decode.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="a dog barking in the distance")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--config", default="")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--chat-template", action="store_true",
                    help="wrap the caption in the tokenizer chat template "
                         "(ref tools/batch_infer.py:72-77) instead of the "
                         "raw text+special-tokens prompt")
    ap.add_argument("--platform", default="",
                    help="force jax platform (e.g. cpu); the environment's "
                         "sitecustomize pins the TPU otherwise")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kalle_tpu.core.config import LlasaConfig, load_experiment_config
    from kalle_tpu.data.tokens import (build_chat_prompt_ids,
                                       build_prompt_ids, build_tokenizer)
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.models.lm import llasa

    if args.config:
        exp = load_experiment_config(args.config)
        cfg = exp.model
        tokenizer = build_tokenizer(exp.tokenizer_path or None)
    else:
        cfg = LlasaConfig.tiny()
        tokenizer = build_tokenizer()

    if args.checkpoint:
        from kalle_tpu.core.checkpoint import load_reference_llasa_checkpoint

        params = load_reference_llasa_checkpoint(args.checkpoint, cfg)
    else:
        params = llasa.init_params(cfg, jax.random.key(0))

    build = build_chat_prompt_ids if args.chat_template else build_prompt_ids
    ids = np.asarray(build(tokenizer, args.text), np.int32)
    batch_ids = jnp.asarray(np.tile(ids[None], (args.repeats, 1)))
    mask = jnp.ones_like(batch_ids)
    res = generate(params, cfg, batch_ids, mask, jax.random.key(1),
                   max_frames=args.steps, end_kl_threshold=-1.0)
    kl = np.asarray(res.end_kl)
    for i in range(args.steps):
        print(f"step {i:3d}  end-KL " +
              " ".join(f"{kl[b, i]:.3f}" for b in range(args.repeats)))
    print("n_frames:", res.n_frames.tolist())


if __name__ == "__main__":
    main()
