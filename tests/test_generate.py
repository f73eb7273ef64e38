"""KV-cached decode vs the reference algorithm (cache-less full re-forward).

The naive loop below mirrors Llasa.infer (ref model_sigmaVAE.py:106-148):
full-sequence forward each step, no cache. The jitted generate() must
produce identical latents given the same rng stream.
"""
import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig, LlasaConfig
from kalle_tpu.infer.generate import generate, _head_step
from kalle_tpu.models.lm import llama, llasa


def _cfg(variant="sigma"):
    return LlasaConfig(
        llama=LlamaConfig.tiny(vocab_size=300),
        latent_dim=8,
        audio_proj_dim=64,
        head_variant=variant,
    )


def _naive_generate(params, cfg, ids, rng, max_frames):
    """Reference algorithm: re-forward the whole prefix each step."""
    lcfg = cfg.llama
    dt = jnp.dtype(lcfg.dtype)
    embeds = llama.embed_tokens(params["llama"], ids[None, :], lcfg)
    samples, means = [], []
    steps = 0
    for i in range(max_frames):
        mask = jnp.ones((1, embeds.shape[1]), jnp.int32)
        hidden = llama.forward(params["llama"], lcfg, embeds, mask)
        rng, krng = jax.random.split(rng)
        mean, logs, sample = _head_step(cfg, params, hidden[:, -1:, :], krng)
        means.append(np.asarray(mean)[0, 0])
        samples.append(np.asarray(sample)[0, 0])
        steps += 1
        kl = llasa.end_kl(cfg, mean, jnp.exp(logs.astype(jnp.float32)))[0, 0]
        if float(kl) < cfg.end_kl_threshold and i > 3:
            break
        embeds = jnp.concatenate(
            [embeds, llasa.audio_proj(params, sample, dt)], axis=1)
    return np.stack(means), np.stack(samples), steps - 1


def test_cached_matches_naive_sigma():
    cfg = _cfg("sigma")
    params = llasa.init_params(cfg, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 300, (6,)))
    rng = jax.random.key(7)
    max_frames = 8

    n_means, n_samples, n_valid = _naive_generate(params, cfg, ids, rng, max_frames)

    res = generate(params, cfg, ids[None, :], jnp.ones((1, 6), jnp.int32),
                   rng, max_frames=max_frames)
    assert int(res.n_frames[0]) == n_valid == max_frames - 1  # sigma never stops
    np.testing.assert_allclose(np.asarray(res.means)[0], n_means, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.samples)[0], n_samples, rtol=1e-4, atol=1e-5)


def test_left_padding_invariance():
    """Extra left pads must not change the generated latents."""
    cfg = _cfg("sigma")
    params = llasa.init_params(cfg, jax.random.key(1))
    ids = np.random.default_rng(1).integers(0, 300, (5,))
    rng = jax.random.key(3)

    r1 = generate(params, cfg, jnp.asarray(ids[None, :]),
                  jnp.ones((1, 5), jnp.int32), rng, max_frames=6)
    padded = np.concatenate([np.zeros(3, np.int64), ids])[None, :]
    mask = np.concatenate([np.zeros(3, np.int64), np.ones(5, np.int64)])[None, :]
    r2 = generate(params, cfg, jnp.asarray(padded), jnp.asarray(mask),
                  rng, max_frames=6)
    np.testing.assert_allclose(np.asarray(r1.means)[0], np.asarray(r2.means)[0],
                               rtol=1e-4, atol=1e-5)


def test_early_stop_counts():
    """With a huge threshold every row stops at i=4 (i>3 gate), and the
    last emitted frame is discarded -> n_frames == 4."""
    cfg = _cfg("melvae")
    params = llasa.init_params(cfg, jax.random.key(2))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 300, (2, 4)))
    res = generate(params, cfg, ids, jnp.ones((2, 4), jnp.int32),
                   jax.random.key(0), max_frames=16, end_kl_threshold=1e9)
    assert res.n_frames.tolist() == [4, 4]
    # frames beyond steps are zero-masked
    assert np.asarray(res.samples)[0, 6:].max() == 0.0


def test_generate_with_tp_sharded_params():
    """Multi-chip serving: generate() under a dp x tp mesh with TP-sharded
    params must reproduce the single-device decode (jit inserts the
    collectives from the shardings)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from kalle_tpu.core.config import LlamaConfig, LlasaConfig
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.parallel.mesh import make_mesh, shard_params

    cfg = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=300), latent_dim=8,
                      audio_proj_dim=64, head_variant="stableaudio")
    params = llasa.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 300, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    ref = generate(params, cfg, ids, mask, jax.random.key(1), max_frames=6,
                   end_kl_threshold=-1.0, greedy=True)

    mesh = make_mesh(dp=2, tp=4)
    with jax.sharding.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        out = generate(sharded, cfg, ids, mask, jax.random.key(1),
                       max_frames=6, end_kl_threshold=-1.0, greedy=True)
    np.testing.assert_allclose(np.asarray(out.means, np.float32),
                               np.asarray(ref.means, np.float32),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.n_frames),
                                  np.asarray(ref.n_frames))
