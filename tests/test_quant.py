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


def test_int4_qmatmul_close_to_dense():
    from kalle_tpu.ops.quant import quantize_weight_int4

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(256, 32)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
    wq = quantize_weight_int4(w, group=128)
    assert wq["q"].dtype == jnp.int4
    assert wq["scale"].shape == (2, 32)
    dense = np.asarray(x @ w)
    quant = np.asarray(qmatmul(x, wq))
    # iid-gaussian w/x is the WORST case for weight quant (no structure to
    # exploit, dot outputs ~N(0, in) while quant noise grows with sqrt(in)):
    # int4 g128 sits at ~12% RMS here; the trained-model decode gate below
    # is the real quality criterion
    rel_rms = np.linalg.norm(quant - dense) / np.linalg.norm(dense)
    assert rel_rms < 0.2, rel_rms


def test_int4_groupwise_beats_perchannel_int4():
    """The reason int4 carries group-wise scales: per-channel int4 on the
    same matrix is measurably worse."""
    from kalle_tpu.ops.quant import quantize_weight_int4

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.normal(size=(512, 32)) *
                    (1 + 3 * rng.random((512, 1))), jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
    dense = np.asarray(x @ w)

    grouped = np.asarray(qmatmul(x, quantize_weight_int4(w, group=128)))
    # per-channel int4 = one group spanning the whole contraction dim
    chan = np.asarray(qmatmul(x, quantize_weight_int4(w, group=512)))
    err_g = np.abs(grouped - dense).mean()
    err_c = np.abs(chan - dense).mean()
    assert err_g < err_c, (err_g, err_c)


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


def test_int8_decode_quality_on_trained_model():
    """Trained-weight quality gate for int8 weight-only decode (round-1 left
    it opt-in pending this): overfit the tiny Llasa, then greedy-decode with
    int8 weights — the latent trajectory must stay close to the bf16-dense
    decode AND still track the training latents."""
    import dataclasses

    from kalle_tpu.core.config import LlamaConfig, LlasaConfig, TrainConfig
    from kalle_tpu.data.collate import Item, collate
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.ops.quant import quantize_llama_params
    from kalle_tpu.train.optim import make_optimizer
    from kalle_tpu.train.step import make_train_state, train_step

    cfg = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=64), latent_dim=8,
                      audio_proj_dim=64, head_variant="sigma")
    tcfg = TrainConfig(lr=3e-3, warmup_steps=10, total_steps=400,
                       scheduler="cosine")
    rng = np.random.default_rng(0)
    n_frames = 12
    ids = rng.integers(1, 64, (6,)).astype(np.int32)
    lat = (np.sin(np.linspace(0, 3, n_frames))[:, None]
           * np.linspace(0.5, 2.0, 8)[None, :]).astype(np.float32)
    items = [Item(input_ids=ids, audio_latents=lat,
                  audio_distribution=lat.copy())]
    batch_np = collate(items, pad_token_id=0, buckets=(32,))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray)}

    params = llasa.init_params(cfg, jax.random.key(0))
    tx = make_optimizer(tcfg)
    state = make_train_state(params, tx)
    for _ in range(400):
        state, m = train_step(state, cfg, tcfg, tx, batch, jax.random.key(1))

    def decode(p):
        res = generate(p, cfg, jnp.asarray(ids[None]),
                       jnp.ones((1, len(ids)), jnp.int32), jax.random.key(2),
                       max_frames=n_frames, end_kl_threshold=-1.0,
                       greedy=True)
        return np.asarray(res.means[0], np.float32)

    dense = decode(state.params)
    int8 = decode(quantize_llama_params(state.params))
    # int8-vs-dense deviation must be small relative to the signal
    sig = float(np.var(lat))
    dev = float(np.mean((dense - int8) ** 2))
    assert dev < 0.02 * sig, (dev, sig)
    # and int8 still tracks the ground-truth trajectory about as well
    mse_dense = float(np.mean((dense[:n_frames] - lat) ** 2))
    mse_int8 = float(np.mean((int8[:n_frames] - lat) ** 2))
    assert mse_int8 < 2.0 * mse_dense + 0.02 * sig, (mse_int8, mse_dense)

    # int4 g128 (same trained weights): looser but still signal-faithful
    int4 = decode(quantize_llama_params(state.params, bits=4))
    dev4 = float(np.mean((dense - int4) ** 2))
    assert dev4 < 0.06 * sig, (dev4, sig)
    mse_int4 = float(np.mean((int4[:n_frames] - lat) ** 2))
    assert mse_int4 < 3.0 * mse_dense + 0.06 * sig, (mse_int4, mse_dense)


def test_fused_decode_params_exact_parity():
    """fuse_decode_params (wqkv / wgu concat) is exactly equivalent math:
    full forward and KV-cached decode must reproduce the unfused outputs on
    CPU (same dot per output column), for dense and int8 trees."""
    from kalle_tpu.ops.quant import fuse_decode_params

    cfg = LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 300, (2, 16)))
    mask = jnp.ones((2, 16), jnp.int32)
    emb = llama.embed_tokens(params, ids, cfg)

    for tree in (params, quantize_llama_params(params),
                 quantize_llama_params(params, bits=4)):
        fused = fuse_decode_params(tree)
        assert "wq" not in fused["layers"] and "wqkv" in fused["layers"]
        ref = np.asarray(llama.forward(tree, cfg, emb, mask))
        got = np.asarray(llama.forward(fused, cfg, emb, mask))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

        cache = llama.KVCache.zeros(cfg, 2, 24)
        h_ref, c_ref = llama.forward_with_cache(tree, cfg, emb, cache)
        h_got, c_got = llama.forward_with_cache(fused, cfg, emb, cache)
        np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(c_got.k), np.asarray(c_ref.k),
                                   atol=1e-5, rtol=1e-5)


def test_int8_kv_cache_decode_close():
    """generate() with an int8 KV cache (kv_cache_dtype='int8') stays close
    to the bf16-cache decode on the XLA fallback path (CPU)."""
    import dataclasses

    from kalle_tpu.core.config import LlasaConfig
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.models.lm import llasa

    base = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=64), latent_dim=8,
                       audio_proj_dim=64, head_variant="sigma")
    params = llasa.init_params(base, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(3).integers(1, 64, (2, 6)))
    mask = jnp.ones((2, 6), jnp.int32)

    def decode(cfg):
        res = generate(params, cfg, ids, mask, jax.random.key(2),
                       max_frames=10, end_kl_threshold=-1.0, greedy=True)
        return np.asarray(res.means, np.float32)

    dense = decode(base)
    int8kv = decode(dataclasses.replace(
        base, llama=dataclasses.replace(base.llama, kv_cache_dtype="int8")))
    # per-token absmax int8 KV is near-transparent
    sig = float(np.var(dense)) + 1e-9
    dev = float(np.mean((dense - int8kv) ** 2))
    assert dev < 0.02 * sig, (dev, sig)


def test_fused_weights_with_int8_kv_compose():
    """fuse_decode_params + kv_cache_dtype='int8' together (the long-context
    serving configuration) stay close to the plain decode."""
    import dataclasses

    from kalle_tpu.core.config import LlasaConfig
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.ops.quant import fuse_decode_params

    base = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=64), latent_dim=8,
                       audio_proj_dim=64, head_variant="sigma")
    params = llasa.init_params(base, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(4).integers(1, 64, (2, 6)))
    mask = jnp.ones((2, 6), jnp.int32)

    def decode(p, cfg):
        res = generate(p, cfg, ids, mask, jax.random.key(2), max_frames=10,
                       end_kl_threshold=-1.0, greedy=True)
        return np.asarray(res.means, np.float32)

    plain = decode(params, base)
    cfg8 = dataclasses.replace(
        base, llama=dataclasses.replace(base.llama, kv_cache_dtype="int8"))
    combo = decode(fuse_decode_params(params), cfg8)
    sig = float(np.var(plain)) + 1e-9
    assert float(np.mean((plain - combo) ** 2)) < 0.02 * sig
