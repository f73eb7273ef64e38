#!/usr/bin/env python
"""WER scorer CLI — drop-in for tools/compute-wer.py:
python tools/compute_wer.py --char=1 --v=1 gt.txt asr.txt > wer.txt"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kalle_tpu.eval.wer import main

if __name__ == "__main__":
    sys.exit(main())
