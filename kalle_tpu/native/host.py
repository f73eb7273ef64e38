"""ctypes bindings for the native host runtime (libkalle_host.so).

Auto-builds with g++ on first use (cached next to the source); every entry
point has a pure-Python fallback in its caller, so missing toolchains only
cost speed, never correctness.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libkalle_host.so")
_SRC = os.path.join(_HERE, "host.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
         _SRC, "-o", _SO],
        check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.kalle_align.restype = ctypes.c_int64
        lib.kalle_align.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.kalle_npy_info.restype = ctypes.c_int32
        lib.kalle_npy_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.kalle_npy_read.restype = ctypes.c_int32
        lib.kalle_npy_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_int64]
        lib.kalle_npy_read_batch.restype = ctypes.c_int32
        lib.kalle_npy_read_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib


_OPS = {0: "C", 1: "S", 2: "D", 3: "I"}
_DTYPES = {0: np.float32, 1: np.float16, 2: np.int32, 3: np.int64}


def align_tokens(ref: Sequence[str], hyp: Sequence[str]):
    """Edit-distance alignment; same op-list contract as eval.wer._align."""
    lib = get_lib()
    vocab: Dict[str, int] = {}
    def ids(tokens):
        out = np.empty(len(tokens), np.int32)
        for i, t in enumerate(tokens):
            out[i] = vocab.setdefault(t, len(vocab))
        return out

    r, h = ids(ref), ids(hyp)
    cap = 3 * (len(ref) + len(hyp) + 1)
    ops = np.empty(cap, np.int32)
    n = lib.kalle_align(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n < 0:
        raise RuntimeError("kalle_align overflow")
    out = [( _OPS[int(ops[3 * k])], int(ops[3 * k + 1]), int(ops[3 * k + 2]))
           for k in range(int(n))]
    out.reverse()  # C side emits backtrace order
    return out


def npy_info(path: str) -> Tuple[Tuple[int, ...], np.dtype]:
    lib = get_lib()
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int32()
    dtype = ctypes.c_int32()
    rc = lib.kalle_npy_info(path.encode(), shape, ctypes.byref(ndim),
                            ctypes.byref(dtype))
    if rc != 0:
        raise IOError(f"npy_info({path}) rc={rc}")
    return tuple(shape[i] for i in range(ndim.value)), np.dtype(
        _DTYPES[dtype.value])


def load_npy(path: str) -> np.ndarray:
    """Native np.load for C-order little-endian arrays."""
    lib = get_lib()
    shape, dt = npy_info(path)
    out = np.empty(shape, dt)
    rc = lib.kalle_npy_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                            out.nbytes)
    if rc != 0:
        raise IOError(f"npy_read({path}) rc={rc}")
    return out


def load_npy_batch(paths: Sequence[str], n_threads: int = 4) -> List[np.ndarray]:
    """Concurrent batched .npy load (the dataloader hot path)."""
    lib = get_lib()
    arrays = []
    bufs = (ctypes.c_void_p * len(paths))()
    sizes = (ctypes.c_int64 * len(paths))()
    for i, p in enumerate(paths):
        shape, dt = npy_info(p)
        a = np.empty(shape, dt)
        arrays.append(a)
        bufs[i] = a.ctypes.data_as(ctypes.c_void_p).value
        sizes[i] = a.nbytes
    packed = b"\0".join(p.encode() for p in paths) + b"\0"
    status = (ctypes.c_int32 * len(paths))()
    lib.kalle_npy_read_batch(packed, len(paths), bufs, sizes, n_threads,
                             status)
    for i, p in enumerate(paths):
        if status[i] != 0:
            raise IOError(f"npy_read({p}) rc={status[i]}")
    return arrays
