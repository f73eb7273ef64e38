"""SigmaVAE codec: shapes, causality, orientation tolerance, trainability."""
import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.models.codecs.sigmavae import (
    SigmaVAEConfig,
    decode,
    encode,
    init_params,
    sample,
)


def test_roundtrip_shapes():
    cfg = SigmaVAEConfig.tiny()
    params = init_params(cfg, jax.random.key(0))
    T = 10 * cfg.hop
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, T)),
                      jnp.float32) * 0.1
    z = encode(params, cfg, wav)
    assert z.shape == (2, 10, cfg.latent_dim)
    y = decode(params, cfg, z)
    assert y.shape == (2, 1, T)
    assert np.isfinite(np.asarray(y)).all()
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_orientation_tolerance():
    """decode must accept both (B,T,d) and (B,d,T) like the original
    tokenizer (infer_vibevoice.py:342 vs :363)."""
    cfg = SigmaVAEConfig.tiny()
    params = init_params(cfg, jax.random.key(1))
    z = jnp.asarray(np.random.default_rng(1).normal(size=(1, 12, cfg.latent_dim)),
                    jnp.float32)
    y1 = np.asarray(decode(params, cfg, z))
    y2 = np.asarray(decode(params, cfg, jnp.transpose(z, (0, 2, 1))))
    np.testing.assert_allclose(y1, y2, rtol=1e-6)


def test_encoder_causality():
    """Changing future samples must not change past latent frames."""
    cfg = SigmaVAEConfig.tiny()
    params = init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(3)
    T = 8 * cfg.hop
    wav = rng.normal(size=(1, 1, T)).astype(np.float32)
    wav2 = wav.copy()
    wav2[:, :, 5 * cfg.hop:] += 1.0  # perturb only the future
    z1 = np.asarray(encode(params, cfg, jnp.asarray(wav)))
    z2 = np.asarray(encode(params, cfg, jnp.asarray(wav2)))
    np.testing.assert_allclose(z1[:, :4], z2[:, :4], atol=1e-5)
    assert np.abs(z1[:, 6:] - z2[:, 6:]).max() > 1e-4


def test_decoder_causality():
    cfg = SigmaVAEConfig.tiny()
    params = init_params(cfg, jax.random.key(4))
    rng = np.random.default_rng(5)
    z = rng.normal(size=(1, 10, cfg.latent_dim)).astype(np.float32)
    z2 = z.copy()
    z2[:, 7:] += 1.0
    y1 = np.asarray(decode(params, cfg, jnp.asarray(z)))
    y2 = np.asarray(decode(params, cfg, jnp.asarray(z2)))
    np.testing.assert_allclose(y1[:, :, :6 * cfg.hop], y2[:, :, :6 * cfg.hop],
                               atol=1e-5)


def test_reconstruction_trains():
    """A few Adam steps on MSE reconstruction must reduce the loss —
    the codec is trainable end-to-end on TPU (the reference's codec was
    frozen/external; ours can be trained here)."""
    import optax

    cfg = SigmaVAEConfig.tiny()
    params = init_params(cfg, jax.random.key(6))
    wav = jnp.asarray(np.random.default_rng(7).normal(size=(2, 1, 6 * cfg.hop)),
                      jnp.float32) * 0.3
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            y = decode(p, cfg, encode(p, cfg, wav))
            return jnp.mean((y - wav) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(12):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_sample_parity_semantics():
    rng = jax.random.key(0)
    mean = jnp.zeros((2, 5, 8))
    s = sample(rng, mean, 0.5, "fix")
    assert s.shape == mean.shape
    assert 0.1 < float(jnp.std(s)) < 1.0
    assert np.allclose(np.asarray(sample(rng, mean, 0.5, "none")), 0)


def test_gemm_blocks_match_plain():
    """The dw-folded-into-up GEMM block is exactly equivalent math to the
    depthwise + pointwise pair (small-channel layout fix, round-2)."""
    import dataclasses

    from kalle_tpu.models.codecs.sigmavae import SigmaVAEConfig, decode, encode, init_params

    cfg_g = dataclasses.replace(SigmaVAEConfig.tiny(), gemm_blocks=True)
    cfg_p = dataclasses.replace(SigmaVAEConfig.tiny(), gemm_blocks=False)
    params = init_params(cfg_p, jax.random.key(0))
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 6 * cfg_p.hop)),
                      jnp.float32)
    np.testing.assert_allclose(np.asarray(encode(params, cfg_g, wav)),
                               np.asarray(encode(params, cfg_p, wav)),
                               rtol=1e-5, atol=1e-5)
    z = jnp.asarray(np.random.default_rng(1).normal(size=(2, 6, cfg_p.latent_dim)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(decode(params, cfg_g, z)),
                               np.asarray(decode(params, cfg_p, z)),
                               rtol=1e-5, atol=1e-5)
