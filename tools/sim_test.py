#!/usr/bin/env python
"""Speaker-similarity harness CLI (tools/sim_test.py equivalent).

Usage: python tools/sim_test.py <wav_dir> --meta meta.lst [--ecapa-ckpt x.pt]
Without an external WavLM checkpoint it uses this framework's ECAPA-TDNN
(random or imported weights) through the on-device mel frontend — the
cosine-similarity protocol and output files match the reference.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav_dir")
    ap.add_argument("--meta", required=True)
    ap.add_argument("--ecapa-ckpt", default="",
                    help="torch ECAPA_TDNN state_dict (backup/ecapa_tdnn.py)")
    ap.add_argument("--train-synthetic", action="store_true", default=None,
                    help="train the ECAPA on synthetic speaker "
                         "classification first (the default when no "
                         "--ecapa-ckpt is given; --no-train-synthetic for "
                         "raw random weights)")
    ap.add_argument("--no-train-synthetic", dest="train_synthetic",
                    action="store_false")
    ap.add_argument("--spk-steps", type=int, default=350)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from kalle_tpu.eval.harness import (
        make_ecapa_embedder,
        read_meta_lst,
        speaker_similarity,
    )
    from kalle_tpu.models.conditioning.ecapa import (
        EcapaConfig,
        init_params,
        params_from_state_dict,
    )

    meta = read_meta_lst(args.meta)
    if args.ecapa_ckpt:
        from kalle_tpu.models.lm.convert import load_torch_checkpoint

        ecfg = EcapaConfig()
        sd = load_torch_checkpoint(args.ecapa_ckpt)
        params = params_from_state_dict(sd, ecfg)
        embed = make_ecapa_embedder(params, ecfg)
    elif args.train_synthetic is not False:
        # default: a DISCRIMINATIVE embedder trained on synthetic speaker
        # classification (the reference's trained WavLM-ECAPA role,
        # ref tools/sim_test.py:26-49) — a random-init ECAPA saturates
        # (all sims ~0.99) and cannot rank clones
        import dataclasses as _dc

        from kalle_tpu.eval import speaker_embedder as se

        cfg = _dc.replace(se.SpeakerTrainConfig(), steps=args.spk_steps)
        params, ecfg2, _ = se.train_speaker_embedder(cfg)
        pos, neg = se.margin(params, ecfg2, cfg)
        print(f"trained synthetic embedder: heldout margin "
              f"pos {pos:.3f} / neg {neg:.3f}")
        embed = se.make_trained_embedder(params, ecfg2, cfg)
    else:
        print("WARNING: random ECAPA weights (relative scores only)")
        ecfg = EcapaConfig()
        params = init_params(ecfg, jax.random.key(0))
        embed = make_ecapa_embedder(params, ecfg)

    mean = speaker_similarity(args.wav_dir, meta, embed)
    print(f"mean speaker similarity: {mean:.4f}")


if __name__ == "__main__":
    main()
