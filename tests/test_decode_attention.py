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


@pytest.mark.parametrize("c", [384, 512])
def test_cached_int8_scales_multi_block(c):
    """int8 quant + MULTI-BLOCK cache (c > cb): the per-column K scales and
    the p-folded V scales must compose with the online-softmax carry and the
    128-lane-narrowed stats scratch across grid steps (the combination
    tools/attn_ab.py --int8 exercises at cache 256+)."""
    from kalle_tpu.ops.pallas.decode_attention import decode_attention_cached

    q, k, v, mask = _case(2, c, 8, 2, 16, seed=8)
    kt, vk = _kernel_layout(k, v)

    def quant(x, axis):
        absmax = np.abs(np.asarray(x)).max(axis=axis, keepdims=True)
        scale = np.maximum(absmax, 1e-8) / 127.0
        qx = np.clip(np.round(np.asarray(x) / scale), -127, 127)
        return jnp.asarray(qx, jnp.int8), jnp.asarray(scale, jnp.float32)

    kq, ks = quant(kt, axis=2)
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


@pytest.mark.parametrize("c", [128, 384])
def test_sideband_current_column(c):
    """k_new/v_new/new_valid must reproduce attention over the cache WITH
    the current column written and marked valid — at both single-block
    (c == cb) and multi-block cache lengths. Rows with new_valid=False
    must ignore their sideband column entirely."""
    from kalle_tpu.ops.pallas.decode_attention import decode_attention_cached

    b, nq, nkv, hd = 3, 8, 2, 16
    rng = np.random.default_rng(42)
    q, k, v, _ = _case(b, c, nq, nkv, hd, seed=7, holes=False)
    # each row's cache is valid up to lengths[i]; the current column is
    # written AT lengths[i]
    lengths = np.array([5, c // 2, c - 1])
    prev_mask = np.zeros((b, c), bool)
    for i in range(b):
        prev_mask[i, : lengths[i]] = True
    live = np.array([True, True, False])
    k_new = jnp.asarray(rng.normal(size=(b, nkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(b, nkv, hd)), jnp.float32)

    # reference: write the column into the cache, extend the mask by `live`
    k_ref = np.asarray(k).copy()
    v_ref = np.asarray(v).copy()
    post_mask = prev_mask.copy()
    for i in range(b):
        k_ref[i, lengths[i]] = np.asarray(k_new)[i]
        v_ref[i, lengths[i]] = np.asarray(v_new)[i]
        post_mask[i, lengths[i]] = live[i]
    ref = mha(q[:, None], jnp.asarray(k_ref), jnp.asarray(v_ref),
              jnp.asarray(post_mask)[:, None, None, :])[:, 0]

    kt, vk = _kernel_layout(k, v)
    got = decode_attention_cached(
        q, kt[None], vk[None], 0, jnp.asarray(prev_mask),
        k_new=k_new, v_new=v_new, new_valid=jnp.asarray(live),
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_sideband_rejects_int8():
    """The sideband column is bf16-KV only (serving's kernel path is
    bf16-gated); combining it with int8 scales must assert. An in-kernel
    DMA cache write (input_output-aliased buffers) was also tried and is
    NOT lowerable on v5e — Mosaic requires lane-dim slices to be
    128-aligned and the K column write at a dynamic cache offset is a
    width-1 lane slice — so the serving loop writes the column with a
    per-row dynamic_update_slice chain instead (serve_loop._decode_layer)."""
    from kalle_tpu.ops.pallas.decode_attention import decode_attention_cached

    b, c, nq, nkv, hd = 2, 128, 8, 2, 16
    q, k, v, mask = _case(b, c, nq, nkv, hd, seed=3, holes=False)
    kt, vk = _kernel_layout(k, v)
    scale = jnp.ones((1, b, nkv, 1, c), jnp.float32)
    kn = jnp.zeros((b, nkv, hd), jnp.float32)
    with pytest.raises(AssertionError):
        decode_attention_cached(
            q, kt[None].astype(jnp.int8), vk[None].astype(jnp.int8), 0,
            mask, k_scale=scale, v_scale=scale,
            k_new=kn, v_new=kn, new_valid=jnp.ones((b,), bool),
            interpret=True)
