#!/usr/bin/env python
"""Training CLI.

Usage: python tools/train.py configs/sigma_overfit.yaml [--max-steps N]
Accepts the reference's experiment-YAML schema verbatim
(ref train_offline.py:29 takes the config path as argv[1]).
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--platform", default="",
                    help="force jax platform (e.g. cpu); the environment's "
                         "sitecustomize pins the TPU otherwise")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from kalle_tpu.core.config import load_experiment_config
    from kalle_tpu.data.tokens import build_tokenizer
    from kalle_tpu.train.trainer import Trainer

    exp = load_experiment_config(args.config)
    os.makedirs(os.path.join(exp.exp_dir, exp.project_name), exist_ok=True)
    # config snapshot into the exp dir (ref train_offline.py:58)
    shutil.copyfile(args.config,
                    os.path.join(exp.exp_dir, exp.project_name, "config.yaml"))

    tokenizer = build_tokenizer(exp.tokenizer_path or None)
    trainer = Trainer(exp, tokenizer)
    metrics = trainer.fit(max_steps=args.max_steps)
    print("final:", metrics)


if __name__ == "__main__":
    main()
