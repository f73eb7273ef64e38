"""Int8 / int4 weight-only quantization for the memory-bound decode path.

AR decode reads every weight once per generated frame; on v5e the step time
is HBM-bandwidth-bound (~2.5 GB bf16 for the 1B flagship). Per-output-
channel absmax int8 halves the traffic; the scale multiplies the matmul
OUTPUT (x @ w_q) * scale == x @ (w_q * scale), so XLA keeps the weights
int8 in HBM and fuses the convert into the dot.

int4 (XLA S4, native on TPU) quarters the weight traffic. Per-output-
channel scales are too coarse at 4 bits, so int4 uses GROUP-WISE scales
along the contraction dim (`group` inputs share one scale per output
column, GPTQ/AWQ-style): y[o] = sum_g s[g,o] * (sum_i x[g,i] q[g,i,o]) —
the inner contraction stays an int4->bf16 fused dot per group and the
group weighting is a cheap (..., n_groups, out) reduction.

Quality: weight-only int8 with per-channel scales is transparent for
generation-quality purposes; int4 g128 adds a few-percent per-matmul error
— gate it with the trained-model decode-quality test before enabling in
production (tests/test_quant.py pattern).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def quantize_weight(w: jnp.ndarray):
    """(in, out) -> {'q': int8 (in, out), 'scale': f32 (out,)}."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_weight_int4(w: jnp.ndarray, group: int = 128):
    """(in, out) -> {'q': int4 (in, out), 'scale': f32 (in//group, out)}."""
    i, o = w.shape
    assert i % group == 0, (i, group)
    wg = w.reshape(i // group, group, o)
    absmax = jnp.max(jnp.abs(wg), axis=1)  # (n_groups, out)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    return {"q": q.reshape(i, o).astype(jnp.int4),
            "scale": scale.astype(jnp.float32)}


def qmatmul(x: jnp.ndarray, wq: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x (..., in) @ quantized weight -> (..., out) in x.dtype.
    Per-channel (int8: scale (out,)) or group-wise (int4: scale
    (in//group, out)) — dispatched on the scale rank."""
    q, scale = wq["q"], wq["scale"]
    if scale.ndim == q.ndim:  # group-wise (int4)
        i, o = q.shape
        ng = scale.shape[0]
        g = i // ng
        xg = x.reshape(x.shape[:-1] + (ng, g))
        qg = q.reshape(ng, g, o).astype(x.dtype)
        # per-group int->bf16 fused dots, then the group-weighted sum
        part = jnp.einsum("...gi,gio->...go", xg, qg,
                          preferred_element_type=jnp.float32)
        return (part * scale).sum(axis=-2).astype(x.dtype)
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "q" in p and "scale" in p


def quantize_llama_params(params: dict, bits: int = 8,
                          group: int = 128) -> dict:
    """Quantize the big per-layer matrices of a Llasa/llama param tree
    (leading L axis preserved). Embeddings/norms/heads stay dense.
    Accepts either a Llasa tree ({'llama': ...}) or a bare llama tree.
    bits=8: per-output-channel scales; bits=4: group-wise scales over
    `group` contraction inputs (int4 needs the finer granularity)."""
    assert bits in (8, 4), bits
    bare = "llama" not in params
    if bare:
        params = {"llama": params}
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    layers = dict(out["llama"]["layers"])
    for k in QUANT_KEYS:
        w = layers[k]  # (L, in, out)
        if bits == 4:
            L, i, o = w.shape
            grp = min(group, i)
            wg = w.reshape(L, i // grp, grp, o)
            absmax = jnp.max(jnp.abs(wg), axis=2)  # (L, n_groups, out)
            scale = jnp.maximum(absmax, 1e-8) / 7.0
            q = jnp.clip(jnp.round(wg / scale[:, :, None, :]), -7, 7)
            layers[k] = {"q": q.reshape(L, i, o).astype(jnp.int4),
                         "scale": scale.astype(jnp.float32)}
        else:
            absmax = jnp.max(jnp.abs(w), axis=1)  # (L, out)
            scale = jnp.maximum(absmax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / scale[:, None, :]),
                         -127, 127).astype(jnp.int8)
            layers[k] = {"q": q, "scale": scale.astype(jnp.float32)}
    out["llama"] = dict(out["llama"])
    out["llama"]["layers"] = layers
    return out["llama"] if bare else out


def maybe_matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """Dense or quantized matmul, dispatched on the param structure."""
    if is_quantized(w):
        return qmatmul(x, w)
    return x @ w.astype(x.dtype)


def fuse_decode_params(params: dict) -> dict:
    """Decode-time layout: concat per-layer wq|wk|wv -> wqkv and wg|wu ->
    wgu along the output dim. One wide weight stream instead of three/two
    narrow ones per layer — fewer kernel launches and better HBM streaming
    in the memory-bound AR decode step (each output column's dot product is
    unchanged, so this is exactly equivalent math; per-output-channel int8
    scales concatenate the same way).

    Works on dense (L, in, out) arrays or quantized {'q','scale'} dicts,
    and on a Llasa tree ({'llama': ...}) or a bare llama tree. The canonical
    (training/checkpoint) tree keeps separate matrices; llama._layer
    dispatches on the fused keys' presence."""
    bare = "llama" not in params
    tree = {"llama": params} if bare else params
    out = dict(tree)
    llama_t = dict(out["llama"])
    layers = dict(llama_t["layers"])

    def cat(ws):
        if is_quantized(ws[0]):
            return {"q": jnp.concatenate([w["q"] for w in ws], axis=-1),
                    "scale": jnp.concatenate([w["scale"] for w in ws],
                                             axis=-1)}
        return jnp.concatenate(ws, axis=-1)

    layers["wqkv"] = cat([layers.pop("wq"), layers.pop("wk"),
                          layers.pop("wv")])
    layers["wgu"] = cat([layers.pop("wg"), layers.pop("wu")])
    llama_t["layers"] = layers
    out["llama"] = llama_t
    return out["llama"] if bare else out
