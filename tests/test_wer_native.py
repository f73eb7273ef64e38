"""WER scorer + native host library."""
import io

import numpy as np
import pytest

from kalle_tpu.eval.wer import (
    characterize,
    compute_wer,
    score_pair,
    _align_python,
)


def test_characterize_mixed():
    toks = characterize("Hello 世界 world 123!")
    assert toks == ["hello", "世", "界", "world", "123"]


def test_score_pair_counts():
    r = score_pair("u1", "the cat sat", "the cat sat")
    assert r.wer == 0.0 and r.cor == 3
    r = score_pair("u2", "the cat sat", "the bat sat down")
    assert (r.sub, r.ins, r.dele) == (1, 1, 0)
    assert abs(r.wer - 100 * 2 / 3) < 1e-6


def test_compute_wer_overall():
    ref = {"a": "hello world", "b": "好 的"}
    hyp = {"a": "hello word", "b": "好"}
    out = io.StringIO()
    wer, results = compute_wer(ref, hyp, verbose=True, out=out)
    assert abs(wer - 100 * 2 / 4) < 1e-6
    text = out.getvalue()
    assert "lab:" in text and "rec:" in text and "Overall" in text


def test_native_align_matches_python():
    host = pytest.importorskip("kalle_tpu.native.host")
    try:
        host.get_lib()
    except Exception as e:
        pytest.skip(f"no toolchain: {e}")
    rng = np.random.default_rng(0)
    for _ in range(10):
        ref = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
        hyp = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
        a = host.align_tokens(ref, hyp)
        b = _align_python(ref, hyp)
        # same error count (alignments may tie-break differently)
        errs_a = sum(1 for op, _, _ in a if op != "C")
        errs_b = sum(1 for op, _, _ in b if op != "C")
        assert errs_a == errs_b


def test_native_npy_loader(tmp_path):
    host = pytest.importorskip("kalle_tpu.native.host")
    try:
        host.get_lib()
    except Exception as e:
        pytest.skip(f"no toolchain: {e}")
    rng = np.random.default_rng(1)
    paths = []
    arrays = []
    for i, dt in enumerate([np.float32, np.float16, np.int32, np.int64]):
        a = rng.normal(size=(3, 4, 5)).astype(dt)
        p = str(tmp_path / f"x{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    for p, a in zip(paths, arrays):
        got = host.load_npy(p)
        np.testing.assert_array_equal(got, a)
    batch = host.load_npy_batch(paths, n_threads=2)
    for got, a in zip(batch, arrays):
        np.testing.assert_array_equal(got, a)


# ---- reference option-surface parity (ref tools/compute-wer.py:298-389) ----

def test_tag_tokens_and_stripping():
    from kalle_tpu.eval.wer import normalize_tokens, stripoff_tags
    # <unk><noise> separates into two tag tokens (ref :37-48)...
    assert characterize("a <unk><noise> b") == ["a", "<unk>", "<noise>", "b"]
    # ...which the default --rt=1 removes entirely (ref :54-67,79-81)
    assert normalize_tokens(["a", "<unk>", "<noise>", "b"]) == ["a", "b"]
    assert normalize_tokens(["a", "<unk>"], remove_tag=False) == ["a", "<unk>"]
    assert stripoff_tags("foo<tag>bar") == "foobar"
    # a tag-bearing hypothesis scores as if the tags were absent
    r = score_pair("u", "hello world", "hello <unk> world <noise>")
    assert r.errors == 0 and r.cor == 2


def test_ignore_words_and_case():
    r = score_pair("u", "uh hello world", "hello world",
                   ignore_words=["uh"])
    assert r.errors == 0 and r.n_ref == 2
    # case-insensitive by default; --cs=1 makes case differences subs
    assert score_pair("u", "Hello", "hello").errors == 0
    assert score_pair("u", "Hello", "hello", case_sensitive=True).sub == 1
    # ignore list is case-folded when not case-sensitive (ref :391-393)
    r = score_pair("u", "UH hello", "hello", ignore_words=["uh"])
    assert r.errors == 0


def test_split_table():
    r = score_pair("u", "gonna go", "going to go",
                   split={"gonna": ["going", "to"]})
    assert r.errors == 0 and r.n_ref == 3


def test_padding_symbol_and_cluster_output():
    import io
    from kalle_tpu.eval.wer import compute_wer
    out = io.StringIO()
    wer, _ = compute_wer({"a": "hello 世界"}, {"a": "hi 世界"},
                         verbose=True, out=out, padding_symbol="_")
    text = out.getvalue()
    assert "hello" in text and "hi___" in text  # padded to common width
    assert "Mandarin -> 0.00 %" in text          # per-script breakdown
    assert "English -> 100.00 %" in text


def test_cluster_file_and_cli(tmp_path):
    import contextlib
    from kalle_tpu.eval.wer import main
    (tmp_path / "gt.txt").write_text("u1 hello world\nu2 好 的\n")
    (tmp_path / "hyp.txt").write_text("u1 hello <unk> word\nu2 好\n")
    (tmp_path / "ig.txt").write_text("uh\n")
    (tmp_path / "cl.txt").write_text("<Greet> hello 好 </Greet>\n")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--char=1", "--v=1", "--cs=0", f"--ig={tmp_path}/ig.txt",
                   f"--cluster={tmp_path}/cl.txt",
                   "--padding-symbol=underline",
                   str(tmp_path / "gt.txt"), str(tmp_path / "hyp.txt")])
    assert rc == 0
    text = buf.getvalue()
    assert "Overall -> 50.00 % N=4 C=2 S=1 D=1 I=0" in text
    assert "Greet -> 0.00 % N=2 C=2" in text  # cluster-file section
