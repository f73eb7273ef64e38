"""Int8 weight-only quantization for the memory-bound decode path.

AR decode reads every weight once per generated frame; on v5e the step time
is HBM-bandwidth-bound (~2.5 GB bf16 for the 1B flagship). Per-output-
channel absmax int8 halves the traffic; the scale multiplies the matmul
OUTPUT (x @ w_q) * scale == x @ (w_q * scale), so XLA keeps the weights
int8 in HBM and fuses the convert into the dot.

Quality: weight-only int8 with per-channel scales is transparent for
generation-quality purposes (activations stay bf16).
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


def qmatmul(x: jnp.ndarray, wq: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x (..., in) @ int8 weight -> (..., out) in x.dtype."""
    y = jnp.dot(x, wq["q"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    return (y * wq["scale"]).astype(x.dtype)


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "q" in p and "scale" in p


def quantize_llama_params(params: dict) -> dict:
    """Quantize the big per-layer matrices of a Llasa/llama param tree
    (leading L axis preserved). Embeddings/norms/heads stay dense.
    Accepts either a Llasa tree ({'llama': ...}) or a bare llama tree."""
    bare = "llama" not in params
    if bare:
        params = {"llama": params}
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    layers = dict(out["llama"]["layers"])
    for k in QUANT_KEYS:
        w = layers[k]  # (L, in, out)
        absmax = jnp.max(jnp.abs(w), axis=1)  # (L, out)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127).astype(jnp.int8)
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
