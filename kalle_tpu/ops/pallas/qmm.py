"""Pallas streaming matmul kernels for the memory-bound AR decode step.

AR decode multiplies a tiny activation (M = batch rows, M <= ~64) against
every weight matrix once per generated frame — pure weight streaming.
MEASURED OUTCOME on v5e (tools/qmm_probe.py, 256-step amortization, weights
as jit arguments): XLA's own in-scan lowering of `x @ int8.astype(bf16)`
streams the 16-layer MLP stack at 641 GB/s (78% of HBM peak) while
fused_mlp reaches 448 GB/s — XLA wins, so the product decode path keeps
XLA matmuls (ops.quant.maybe_matmul) and these kernels stay as
parity-tested alternates. (Isolated single-matmul microbenches are
launch-latency-bound and meaningless here; always measure in-scan.)

Two kernels:
  qmm(x, q, scale)       -- N-tiled (K, N) int8 (or bf16) weight stream.
  fused_mlp(x, wg,wu,wd) -- the whole SwiGLU MLP in ONE kernel: grid over
                            ffn tiles; per tile computes g/u slices, the
                            SwiGLU product, and accumulates h @ wd_tile
                            into a VMEM f32 accumulator. Weights are read
                            exactly once; h never round-trips to HBM.

Replaces the decode-path use of ops.quant.qmatmul (ref flash-attention-2 /
cuBLAS GEMMs in the torch reference, model.py:20-23); training keeps the
XLA path (M is large there — MXU-bound, XLA is already optimal).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dequant_dot(x, w, scale):
    """x (M, K) f32-ish, w (K, BN) int8/bf16, scale (BN,) or None."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    return y


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref):
    o_ref[:] = _dequant_dot(x_ref[:], w_ref[:],
                            s_ref[0] if s_ref is not None else None
                            ).astype(o_ref.dtype)


def _qmm_kernel_noscale(x_ref, w_ref, o_ref):
    o_ref[:] = _dequant_dot(x_ref[:], w_ref[:], None).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def qmm(x: jnp.ndarray, q: jnp.ndarray, scale=None,
        block_n: int = 512, interpret: bool = False) -> jnp.ndarray:
    """x (M, K) @ q (K, N) [int8 or any dtype] * scale (N,) -> (M, N) in
    x.dtype. N-tiled weight stream; M stays resident in VMEM."""
    m, k = x.shape
    kw, n = q.shape
    assert k == kw, (x.shape, q.shape)
    assert n % block_n == 0, (n, block_n)
    grid = (n // block_n,)
    in_specs = [
        pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, q]
    kernel = _qmm_kernel_noscale
    if scale is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(scale.reshape(1, n))
        kernel = _qmm_kernel
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(*args)


def _fused_mlp_kernel(x_ref, wg_ref, gs_ref, wu_ref, us_ref, wd_ref, ds_ref,
                      o_ref, acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    g = _dequant_dot(x, wg_ref[:], gs_ref[0] if gs_ref is not None else None)
    u = _dequant_dot(x, wu_ref[:], us_ref[0] if us_ref is not None else None)
    h = (jax.nn.silu(g) * u).astype(x.dtype)               # (M, BF)
    acc_ref[:] += jnp.dot(h, wd_ref[:].astype(x.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        acc = acc_ref[:]
        if ds_ref is not None:
            acc = acc * ds_ref[0].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)


def _fused_mlp_kernel_noscale(x_ref, wg_ref, wu_ref, wd_ref, o_ref, acc_ref):
    _fused_mlp_kernel(x_ref, wg_ref, None, wu_ref, None, wd_ref, None,
                      o_ref, acc_ref)


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_mlp(x: jnp.ndarray, wg, wu, wd, block_f: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    """SwiGLU MLP silu(x@wg) * (x@wu) @ wd in one weight-streaming pass.

    x (M, K); wg/wu/wd either quantized dicts {'q': int8, 'scale': (N,)}
    (ops.quant layout) or dense (K, F)/(F, K) arrays. Output (M, K) in
    x.dtype. NOTE: wd's per-output-channel scale commutes with the
    F-contraction, so it is applied once to the final accumulator.
    """
    quant = isinstance(wg, dict)
    gq, gs = (wg["q"], wg["scale"]) if quant else (wg, None)
    uq, us = (wu["q"], wu["scale"]) if quant else (wu, None)
    dq, ds = (wd["q"], wd["scale"]) if quant else (wd, None)
    m, k = x.shape
    f = gq.shape[1]
    assert f % block_f == 0, (f, block_f)
    grid = (f // block_f,)

    w_spec = pl.BlockSpec((k, block_f), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, block_f), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((block_f, k), lambda j: (j, 0),
                          memory_space=pltpu.VMEM)
    ds_spec = pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM)

    if quant:
        in_specs = [x_spec, w_spec, s_spec, w_spec, s_spec, d_spec, ds_spec]
        args = [x, gq, gs.reshape(1, f), uq, us.reshape(1, f), dq,
                ds.reshape(1, k)]
        kernel = _fused_mlp_kernel
    else:
        in_specs = [x_spec, w_spec, w_spec, d_spec]
        args = [x, gq, uq, dq]
        kernel = _fused_mlp_kernel_noscale

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, k), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, k), jnp.float32)],
        interpret=interpret,
    )(*args)
