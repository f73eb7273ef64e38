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
