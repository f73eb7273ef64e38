"""WER / CER scorer — Kaldi-style alignment and statistics.

Behavioral equivalent of tools/compute-wer.py (CLI `--char=1 --v=1 gt asr`):
char-level tokenization splits CJK characters and keeps Latin words
(`characterize`), dynamic-programming alignment produces per-utterance
Cor/Sub/Del/Ins counts, verbose mode prints the aligned `lab:`/`rec:` pair,
and the summary reports overall WER. This is an original implementation,
not a port; the output contract (TOTAL WER line, per-utt alignments)
matches what tools/compute-wer.sh consumes (ref :24-27).

The O(n*m) alignment core optionally dispatches to the native C++ library
(kalle_tpu/native) when built; pure-Python fallback otherwise.
"""
from __future__ import annotations

import re
import sys
import unicodedata
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple

_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF), (0x2A700, 0x2B73F), (0x3040, 0x30FF),
    (0xAC00, 0xD7AF),
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def characterize(text: str, char_level: bool = True) -> List[str]:
    """Tokenize: CJK chars as units, Latin/digit runs as words; punctuation
    dropped (the reference maps punctuation to spaces before scoring,
    ref tools/asr_test.py:96-99)."""
    text = unicodedata.normalize("NFKC", text)
    tokens: List[str] = []
    word = ""
    for ch in text:
        if _is_cjk(ch) and char_level:
            if word:
                tokens.append(word)
                word = ""
            tokens.append(ch)
        elif ch.isalnum() or ch == "'":
            word += ch.lower()
        else:
            if word:
                tokens.append(word)
                word = ""
    if word:
        tokens.append(word)
    return tokens


@dataclass
class UttResult:
    utt: str
    cor: int = 0
    sub: int = 0
    dele: int = 0
    ins: int = 0
    lab_align: List[str] = field(default_factory=list)
    rec_align: List[str] = field(default_factory=list)

    @property
    def n_ref(self) -> int:
        return self.cor + self.sub + self.dele

    @property
    def errors(self) -> int:
        return self.sub + self.dele + self.ins

    @property
    def wer(self) -> float:
        return 100.0 * self.errors / max(self.n_ref, 1)


def _align_python(ref: List[str], hyp: List[str]):
    n, m = len(ref), len(hyp)
    INF = 1 << 30
    cost = [[0] * (m + 1) for _ in range(n + 1)]
    back = [[0] * (m + 1) for _ in range(n + 1)]  # 0=cor/sub 1=del 2=ins
    for i in range(1, n + 1):
        cost[i][0] = i
        back[i][0] = 1
    for j in range(1, m + 1):
        cost[0][j] = j
        back[0][j] = 2
    for i in range(1, n + 1):
        ri = ref[i - 1]
        ci_1 = cost[i - 1]
        ci = cost[i]
        bi = back[i]
        for j in range(1, m + 1):
            s = ci_1[j - 1] + (0 if ri == hyp[j - 1] else 1)
            d = ci_1[j] + 1
            ins = ci[j - 1] + 1
            best = s
            b = 0
            if d < best:
                best, b = d, 1
            if ins < best:
                best, b = ins, 2
            ci[j] = best
            bi[j] = b
    # backtrace
    ops = []
    i, j = n, m
    while i > 0 or j > 0:
        b = back[i][j]
        if i > 0 and j > 0 and b == 0:
            ops.append(("C" if ref[i - 1] == hyp[j - 1] else "S", i - 1, j - 1))
            i, j = i - 1, j - 1
        elif i > 0 and (j == 0 or b == 1):
            ops.append(("D", i - 1, -1))
            i -= 1
        else:
            ops.append(("I", -1, j - 1))
            j -= 1
    ops.reverse()
    return ops


def _align(ref: List[str], hyp: List[str]):
    try:
        from ..native.host import align_tokens  # C++ fast path

        return align_tokens(ref, hyp)
    except Exception:
        return _align_python(ref, hyp)


def score_pair(utt: str, ref_text: str, hyp_text: str,
               char_level: bool = True) -> UttResult:
    ref = characterize(ref_text, char_level)
    hyp = characterize(hyp_text, char_level)
    res = UttResult(utt)
    for op, i, j in _align(ref, hyp):
        if op == "C":
            res.cor += 1
            res.lab_align.append(ref[i])
            res.rec_align.append(hyp[j])
        elif op == "S":
            res.sub += 1
            res.lab_align.append(ref[i])
            res.rec_align.append(hyp[j])
        elif op == "D":
            res.dele += 1
            res.lab_align.append(ref[i])
            res.rec_align.append("*" * max(len(ref[i]), 1))
        else:
            res.ins += 1
            res.lab_align.append("*" * max(len(hyp[j]), 1))
            res.rec_align.append(hyp[j])
    return res


def read_trn(path: str) -> Dict[str, str]:
    """Read `utt text...` transcription files (the aaa_gt.txt / aaa_asr.txt
    format written by the asr harness, ref tools/asr_test.py:96-99)."""
    out: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if not parts:
                continue
            out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def compute_wer(ref: Dict[str, str], hyp: Dict[str, str],
                char_level: bool = True, verbose: bool = False,
                out=sys.stdout) -> Tuple[float, List[UttResult]]:
    results = []
    tot_err = tot_ref = 0
    for utt, rtext in ref.items():
        htext = hyp.get(utt, "")
        r = score_pair(utt, rtext, htext, char_level)
        results.append(r)
        tot_err += r.errors
        tot_ref += r.n_ref
        if verbose:
            print(f"utt: {utt}", file=out)
            print(f"WER: {r.wer:.2f} % N={r.n_ref} C={r.cor} S={r.sub} "
                  f"D={r.dele} I={r.ins}", file=out)
            print("lab: " + " ".join(r.lab_align), file=out)
            print("rec: " + " ".join(r.rec_align), file=out)
            print(file=out)
    wer = 100.0 * tot_err / max(tot_ref, 1)
    n_cor = sum(r.cor for r in results)
    n_sub = sum(r.sub for r in results)
    n_del = sum(r.dele for r in results)
    n_ins = sum(r.ins for r in results)
    print(f"Overall -> {wer:.2f} % N={tot_ref} C={n_cor} S={n_sub} "
          f"D={n_del} I={n_ins}", file=out)
    return wer, results


def main(argv=None):
    """CLI: compute_wer [--char=1] [--v=1] ref_file hyp_file
    (drop-in for tools/compute-wer.py usage in compute-wer.sh:27)."""
    argv = argv if argv is not None else sys.argv[1:]
    char_level = True
    verbose = False
    files = []
    for a in argv:
        if a.startswith("--char"):
            char_level = a.split("=")[-1] in ("1", "true", "True")
        elif a.startswith("--v"):
            verbose = a.split("=")[-1] in ("1", "true", "True")
        else:
            files.append(a)
    ref, hyp = read_trn(files[0]), read_trn(files[1])
    compute_wer(ref, hyp, char_level, verbose)
    return 0


if __name__ == "__main__":
    sys.exit(main())
