"""Fused decode-attention kernel vs the XLA mha path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kalle_tpu.ops.attention import mha
from kalle_tpu.ops.pallas.decode_attention import decode_attention


def _case(b, c, nq, nkv, hd, seed=0, holes=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, nq, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, c, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, c, nkv, hd)), jnp.float32)
    # realistic decode mask: causal-by-slot prefix with left-pad holes
    mask = np.zeros((b, c), bool)
    for i in range(b):
        n_valid = rng.integers(1, c + 1)
        mask[i, :n_valid] = True
        if holes and n_valid > 2:
            mask[i, : rng.integers(0, n_valid - 1)] = False
            mask[i, 0] = True  # at least one valid key
    return q, k, v, jnp.asarray(mask)


def _kernel_layout(k, v):
    """(B, C, nkv, hd) natural cache -> kernel kt (B, nkv, hd, C) /
    v (B, nkv, C, hd)."""
    return jnp.transpose(k, (0, 2, 3, 1)), jnp.transpose(v, (0, 2, 1, 3))


@pytest.mark.parametrize("b,c,nq,nkv,hd", [
    (4, 128, 8, 2, 16),    # gqa groups=4
    (2, 128, 4, 4, 8),     # mha (groups=1)
    (1, 128, 8, 1, 32),    # mqa, batch 1
    (3, 128, 32, 8, 64),   # flagship head geometry
])
def test_matches_mha(b, c, nq, nkv, hd):
    q, k, v, mask = _case(b, c, nq, nkv, hd)
    ref = mha(q[:, None], k, v, mask[:, None, None, :])[:, 0]
    kt, vk = _kernel_layout(k, v)
    got = decode_attention(q, kt, vk, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_multi_block_accumulation():
    """C spanning several grid blocks exercises the online-softmax carry."""
    q, k, v, mask = _case(2, 384, 8, 2, 16, seed=3)
    ref = mha(q[:, None], k, v, mask[:, None, None, :])[:, 0]
    kt, vk = _kernel_layout(k, v)
    got = decode_attention(q, kt, vk, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_fully_masked_trailing_block():
    """A whole trailing 128-block masked off (the cache-padding case)."""
    q, k, v, mask = _case(2, 256, 8, 2, 16, seed=4, holes=False)
    mask = mask.at[:, 128:].set(False)
    mask = mask.at[:, :8].set(True)
    ref = mha(q[:, None], k, v, mask[:, None, None, :])[:, 0]
    kt, vk = _kernel_layout(k, v)
    got = decode_attention(q, kt, vk, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_bf16_io():
    q, k, v, mask = _case(2, 128, 8, 2, 16, seed=5)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = mha(q[:, None], k, v, mask[:, None, None, :])[:, 0]
    kt, vk = _kernel_layout(k, v)
    got = decode_attention(q, kt, vk, mask, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_cached_layer_selection():
    """decode_attention_cached must read the requested layer of the full
    (L, ...) cache (scalar-prefetch index maps), not layer 0."""
    from kalle_tpu.ops.pallas.decode_attention import decode_attention_cached

    L = 3
    cases = [_case(2, 128, 8, 2, 16, seed=10 + l) for l in range(L)]
    k_full = jnp.stack([jnp.transpose(k, (0, 2, 3, 1))
                        for _, k, _, _ in cases])
    v_full = jnp.stack([jnp.transpose(v, (0, 2, 1, 3))
                        for _, _, v, _ in cases])
    for li in range(L):
        q, k, v, mask = cases[li]
        ref = mha(q[:, None], k, v, mask[:, None, None, :])[:, 0]
        got = decode_attention_cached(q, k_full, v_full, li, mask,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)


def test_cached_int8_scales():
    """int8 K/V with per-(token, head) scales must reproduce the dequantized
    reference: K scales applied to score columns, V scales folded into p."""
    from kalle_tpu.ops.pallas.decode_attention import decode_attention_cached

    q, k, v, mask = _case(2, 128, 8, 2, 16, seed=6)
    kt, vk = _kernel_layout(k, v)

    def quant(x, axis):
        absmax = np.abs(np.asarray(x)).max(axis=axis, keepdims=True)
        scale = np.maximum(absmax, 1e-8) / 127.0
        qx = np.clip(np.round(np.asarray(x) / scale), -127, 127)
        return jnp.asarray(qx, jnp.int8), jnp.asarray(scale, jnp.float32)

    # kt (B, nkv, hd, C): per-token scale over hd -> (B, nkv, 1, C)
    kq, ks = quant(kt, axis=2)
    # v (B, nkv, C, hd): per-token over hd -> (B, nkv, C, 1) -> (B,nkv,1,C)
    vq, vs = quant(vk, axis=3)
    vs = jnp.swapaxes(vs, -1, -2)

    deq_k = kq.astype(jnp.float32) * ks
    deq_v = vq.astype(jnp.float32) * jnp.swapaxes(vs, -1, -2)
    ref = decode_attention_cached(q, deq_k[None], deq_v[None], 0, mask,
                                  interpret=True)
    got = decode_attention_cached(q, kq[None], vq[None], 0, mask,
                                  k_scale=ks[None], v_scale=vs[None],
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)
