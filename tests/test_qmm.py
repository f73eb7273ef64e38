"""Parity tests for the Pallas streaming decode matmuls (ops/pallas/qmm.py)
against the XLA reference path (ops.quant.qmatmul) in interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kalle_tpu.ops.pallas.qmm import fused_mlp, qmm
from kalle_tpu.ops.quant import qmatmul, quantize_weight


@pytest.fixture(scope="module")
def rngs():
    return jax.random.split(jax.random.key(0), 8)


def test_qmm_matches_qmatmul(rngs):
    w = quantize_weight(jax.random.normal(rngs[0], (256, 512)) * 0.02)
    x = jax.random.normal(rngs[1], (8, 256), jnp.float32)
    ref = qmatmul(x, w)
    got = qmm(x, w["q"], w["scale"], block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_qmm_dense_weight(rngs):
    w = jax.random.normal(rngs[2], (256, 512), jnp.float32) * 0.02
    x = jax.random.normal(rngs[3], (8, 256), jnp.float32)
    got = qmm(x, w, None, block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                               atol=1e-5, rtol=1e-5)


def test_fused_mlp_matches_three_qmatmuls(rngs):
    wg = quantize_weight(jax.random.normal(rngs[4], (128, 512)) * 0.05)
    wu = quantize_weight(jax.random.normal(rngs[5], (128, 512)) * 0.05)
    wd = quantize_weight(jax.random.normal(rngs[6], (512, 128)) * 0.05)
    x = jax.random.normal(rngs[7], (8, 128), jnp.float32)

    g = jax.nn.silu(qmatmul(x, wg))
    u = qmatmul(x, wu)
    ref = qmatmul((g * u).astype(x.dtype), wd)

    got = fused_mlp(x, wg, wu, wd, block_f=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_mlp_dense(rngs):
    wg = jax.random.normal(rngs[4], (128, 512), jnp.float32) * 0.05
    wu = jax.random.normal(rngs[5], (128, 512), jnp.float32) * 0.05
    wd = jax.random.normal(rngs[6], (512, 128), jnp.float32) * 0.05
    x = jax.random.normal(rngs[7], (8, 128), jnp.float32)
    ref = (jax.nn.silu(x @ wg) * (x @ wu)) @ wd
    got = fused_mlp(x, wg, wu, wd, block_f=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
