"""Int8 weight-only quantization (opt-in serving mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig
from kalle_tpu.models.lm import llama
from kalle_tpu.ops.quant import (
    maybe_matmul,
    qmatmul,
    quantize_llama_params,
    quantize_weight,
)


def test_qmatmul_close_to_dense():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    dense = x @ w
    quant = qmatmul(x, wq)
    err = np.abs(np.asarray(dense - quant)) / (np.abs(np.asarray(dense)) + 1e-2)
    assert err.mean() < 0.05  # few-percent per-matmul error for int8


def test_quantized_llama_forward_close():
    cfg = LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    qparams = quantize_llama_params(params)  # bare llama tree in/out
    for k in ("wq", "wk", "wv", "wo", "wg", "wu", "wd"):
        assert qparams["layers"][k]["q"].dtype == jnp.int8

    ids = jnp.asarray(np.random.default_rng(1).integers(0, 300, (2, 16)))
    mask = jnp.ones((2, 16), jnp.int32)
    emb = llama.embed_tokens(params, ids, cfg)
    dense = np.asarray(llama.forward(params, cfg, emb, mask))
    quant = np.asarray(llama.forward(qparams, cfg, emb, mask))
    # per-matmul int8 noise compounds over layers; stays bounded
    rel = np.abs(dense - quant).mean() / (np.abs(dense).mean() + 1e-8)
    assert rel < 0.15, rel
