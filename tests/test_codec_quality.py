"""Codec quality evidence (VERDICT r1 item 4): torch state-dict importer
roundtrip + a trained-codec copysyn SNR gate, and the WER-proxy LM quality
gate (item 10) — greedy decode of an overfit model must track its training
latents far better than an untrained model."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from kalle_tpu.models.codecs import sigmavae


# ---------------------------------------------------------------------------
# VibeVoice-shaped state-dict importer
# ---------------------------------------------------------------------------

def test_sigmavae_state_dict_roundtrip():
    cfg = sigmavae.SigmaVAEConfig.tiny()
    params = sigmavae.init_params(cfg, jax.random.key(0))
    sd = sigmavae.state_dict_from_params(params, cfg)
    # torch Conv1d layout: (cout, cin, k)
    assert sd["encoder.pre.weight"].shape == (cfg.channels[0], 1, cfg.kernel)
    # ConvTranspose1d layout: (cin, cout, k)
    assert sd["decoder.stages.0.up.weight"].shape[2] == 2 * cfg.strides[-1]

    back = sigmavae.params_from_torch_state_dict(sd, cfg)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # imported params are functionally identical
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 4 * cfg.hop)),
                      jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sigmavae.encode(back, cfg, wav)),
        np.asarray(sigmavae.encode(params, cfg, wav)), atol=1e-6)


def test_sigmavae_import_strips_prefixes():
    cfg = sigmavae.SigmaVAEConfig.tiny()
    params = sigmavae.init_params(cfg, jax.random.key(1))
    sd = sigmavae.state_dict_from_params(params, cfg)
    prefixed = {f"acoustic_tokenizer.{k}": v for k, v in sd.items()}
    back = sigmavae.params_from_torch_state_dict(prefixed, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# trained-codec copysyn SNR gate
# ---------------------------------------------------------------------------

def test_codec_trains_to_snr_bar():
    """A 4x-compression sigma codec must exceed 20 dB copysyn SNR after a
    short overfit on a synthesizable clip (observed ~47 dB; generous bar).
    The full-size 3200x run lives in tools/train_codec_demo.py."""
    cfg = sigmavae.SigmaVAEConfig(latent_dim=16, strides=(2, 2),
                                  channels=(16, 32), blocks_per_stage=1)
    params = sigmavae.init_params(cfg, jax.random.key(0))
    sr = cfg.sample_rate
    t = np.arange(1024) / sr
    wav = jnp.asarray((0.6 * np.sin(2 * np.pi * 440 * t))[None, None, :],
                      jnp.float32)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    def loss_fn(p):
        y = sigmavae.decode(p, cfg, sigmavae.encode(p, cfg, wav))
        return jnp.mean((y - wav) ** 2)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for _ in range(500):
        params, opt, _ = step(params, opt)

    y = sigmavae.decode(params, cfg, sigmavae.encode(params, cfg, wav))
    err = np.asarray(y - wav)
    snr = 10 * np.log10(float(jnp.mean(wav ** 2)) / float(np.mean(err ** 2)))
    assert snr > 20.0, f"copysyn SNR {snr:.1f} dB below bar"


# ---------------------------------------------------------------------------
# WER-proxy LM quality gate (no external ASR needed)
# ---------------------------------------------------------------------------

def test_overfit_greedy_decode_tracks_training_latents():
    """Train the tiny Llasa on one fixed batch, then greedy-decode from the
    training prompt: the generated latent trajectory must be >=4x closer
    (MSE) to the ground-truth latents than the untrained model's output —
    a quality regression gate that needs no ASR weights."""
    from kalle_tpu.core.config import LlamaConfig, LlasaConfig, TrainConfig
    from kalle_tpu.data.collate import Item, collate
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.models.lm import llasa
    from kalle_tpu.train.optim import make_optimizer
    from kalle_tpu.train.step import make_train_state, train_step

    cfg = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=64), latent_dim=8,
                      audio_proj_dim=64, head_variant="sigma")
    tcfg = TrainConfig(lr=3e-3, warmup_steps=10, total_steps=400,
                       scheduler="cosine")
    rng = np.random.default_rng(0)
    n_frames = 12
    ids = rng.integers(1, 64, (6,)).astype(np.int32)
    # smooth, strongly structured latent trajectory (learnable signal)
    base = np.sin(np.linspace(0, 3, n_frames))[:, None] * np.linspace(
        0.5, 2.0, 8)[None, :]
    lat = base.astype(np.float32)
    items = [Item(input_ids=ids, audio_latents=lat,
                  audio_distribution=lat.copy())]
    batch_np = collate(items, pad_token_id=0, buckets=(32,))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray)}

    params0 = llasa.init_params(cfg, jax.random.key(0))

    def gen_mse(params):
        res = generate(params, cfg, jnp.asarray(ids[None]),
                       jnp.ones((1, len(ids)), jnp.int32), jax.random.key(2),
                       max_frames=n_frames, end_kl_threshold=-1.0,
                       greedy=True)
        n = min(int(res.n_frames[0]), n_frames)
        g = np.asarray(res.means[0, :n], np.float32)
        return float(np.mean((g - lat[:n]) ** 2))

    mse_untrained = gen_mse(params0)  # before train_step donates the tree

    tx = make_optimizer(tcfg)
    state = make_train_state(params0, tx)
    key = jax.random.key(1)
    for i in range(400):
        state, m = train_step(state, cfg, tcfg, tx, batch, key)
    assert float(m["audio_loss"]) < 0.2, float(m["audio_loss"])

    mse_trained = gen_mse(state.params)
    assert mse_trained * 4 < mse_untrained, (mse_trained, mse_untrained)
    # absolute sanity: within a fraction of the signal variance
    assert mse_trained < 0.5 * float(np.var(lat)), mse_trained
