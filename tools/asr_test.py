#!/usr/bin/env python
"""ASR transcription harness CLI (tools/asr_test.py equivalent).

Usage: python tools/asr_test.py <lang> <wav_dir> --meta meta.lst
EN uses Whisper (requires local weights, --model path), ZH expects a
Paraformer-style backend; both are injectable in eval.harness for
environments without checkpoints.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("lang", choices=["en", "zh"])
    ap.add_argument("wav_dir")
    ap.add_argument("--meta", required=True,
                    help="meta.lst: utt|prompt_text|prompt_wav|target_text")
    ap.add_argument("--model", default="openai/whisper-large-v3",
                    help="local ASR model path")
    args = ap.parse_args()

    from kalle_tpu.eval.harness import (
        make_whisper_transcriber,
        read_meta_lst,
        run_asr,
    )

    meta = read_meta_lst(args.meta)
    try:
        transcriber = make_whisper_transcriber(args.model, language=args.lang)
    except Exception as e:
        print(f"ERROR: could not load ASR model '{args.model}': {e}\n"
              "This environment has no model hub; point --model at a local "
              "checkpoint directory.", file=sys.stderr)
        return 1
    gt, hyp = run_asr(args.lang, args.wav_dir, meta, transcriber)
    print(f"wrote {gt} and {hyp}; score with tools/compute_wer.py "
          f"--char={'1' if args.lang == 'zh' else '0'} --v=1 {gt} {hyp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
