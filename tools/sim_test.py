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

    ecfg = EcapaConfig()
    if args.ecapa_ckpt:
        from kalle_tpu.models.lm.convert import load_torch_checkpoint

        sd = load_torch_checkpoint(args.ecapa_ckpt)
        params = params_from_state_dict(sd, ecfg)
    else:
        print("WARNING: random ECAPA weights (relative scores only)")
        params = init_params(ecfg, jax.random.key(0))

    meta = read_meta_lst(args.meta)
    embed = make_ecapa_embedder(params, ecfg)
    mean = speaker_similarity(args.wav_dir, meta, embed)
    print(f"mean speaker similarity: {mean:.4f}")


if __name__ == "__main__":
    main()
