#!/usr/bin/env python
"""Checkpoint converter CLI.

  reference .pt -> npz:  python tools/convert_ckpt.py pt2npz in.pt out.npz -c cfg.yaml
  npz -> reference .pt:  python tools/convert_ckpt.py npz2pt in.npz out.pt -c cfg.yaml
  orbax -> npz:          python tools/convert_ckpt.py orbax2npz exp_output_dir out.npz -c cfg.yaml
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["pt2npz", "npz2pt", "orbax2npz"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from kalle_tpu.core.checkpoint import (
        CheckpointManager,
        load_params_npz,
        save_params_npz,
    )
    from kalle_tpu.core.config import load_experiment_config
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.models.lm.convert import (
        llasa_params_from_state_dict,
        llasa_state_dict_from_params,
        load_torch_checkpoint,
    )

    exp = load_experiment_config(args.config)
    cfg = exp.model

    if args.mode == "pt2npz":
        sd = load_torch_checkpoint(args.src)
        params = llasa_params_from_state_dict(sd, cfg)
        save_params_npz(args.dst, params)
    elif args.mode == "npz2pt":
        import torch

        params = load_params_npz(args.src)
        sd = llasa_state_dict_from_params(params, cfg)
        torch.save(sd, args.dst)
    else:  # orbax2npz
        params = llasa.init_params(cfg, jax.random.key(0))
        from kalle_tpu.train.optim import make_optimizer
        from kalle_tpu.train.step import make_train_state

        tx = make_optimizer(exp.train)
        state = make_train_state(params, tx)
        mgr = CheckpointManager(args.src)
        state, step = mgr.restore(state)
        print(f"restored step {step}")
        save_params_npz(args.dst, jax.device_get(state.params))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
