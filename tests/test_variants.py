"""Variant models + advanced inference modes on tiny configs."""
import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig, LlasaConfig
from kalle_tpu.infer.cfg import cfg_generate
from kalle_tpu.infer.optim import prompt_fit, prompt_kl_loss
from kalle_tpu.infer.streaming import sample_speaker_cond, stream_generate
from kalle_tpu.models.conditioning.ecapa import EcapaConfig
from kalle_tpu.models.lm import llasa, variants


def _cfg():
    return LlasaConfig(llama=LlamaConfig.tiny(vocab_size=300), latent_dim=8,
                       audio_proj_dim=64, head_variant="stableaudio")


def _ecfg():
    return EcapaConfig(in_channels=8, channels=16, embd_dim=64, scale=4,
                       attn_bottleneck=8, pooled_channels=24)


def _batch(b=2, t_text=5, t_audio=7, d=8, seed=0):
    rng = np.random.default_rng(seed)
    T = t_text + t_audio
    ids_mask = np.zeros((b, T), bool)
    audio_mask = np.zeros((b, T), bool)
    target_mask = np.zeros((b, T), bool)
    end_mask = np.zeros((b, T), bool)
    ids_mask[:, :t_text] = True
    audio_mask[:, t_text:] = True
    target_mask[:, t_text - 1:T - 1] = True
    end_mask[:, T - 1] = True
    return {
        "input_ids": jnp.asarray(rng.integers(0, 300, (b, T)), jnp.int32),
        "audio_latents": jnp.asarray(rng.normal(size=(b, T, d)), jnp.float32),
        "distribute_labels": jnp.asarray(rng.normal(size=(b, T, 2 * d)),
                                         jnp.float32),
        "ids_mask": jnp.asarray(ids_mask),
        "audio_mask": jnp.asarray(audio_mask),
        "target_mask": jnp.asarray(target_mask),
        "end_mask": jnp.asarray(end_mask),
        "mels": jnp.asarray(rng.normal(size=(b, 8, 20)), jnp.float32),
        "speaker_cond_keep": jnp.asarray([True, False]),
    }


def test_speaker_forward_and_dropout():
    cfg, ecfg = _cfg(), _ecfg()
    params = variants.init_variant_params(cfg, jax.random.key(0), ecfg)
    batch = _batch()
    out = variants.speaker_forward(params, cfg, batch, ecfg)
    assert np.isfinite(float(out["audio_loss"]))
    out2 = variants.speaker_forward(params, cfg, batch, ecfg,
                                    speaker_dropout=True)
    assert np.isfinite(float(out2["audio_loss"]))
    # dropout must change the loss (row 1 speaker replaced by ones)
    assert float(out["audio_loss"]) != float(out2["audio_loss"])


def test_text_stream_forward():
    cfg, ecfg = _cfg(), _ecfg()
    params = variants.init_variant_params(cfg, jax.random.key(1), ecfg)
    out = variants.text_stream_forward(params, cfg, _batch(), ecfg)
    assert np.isfinite(float(out["audio_loss"]))
    assert out["end_loss"] is None


def test_stream_spkvae_forward():
    cfg, ecfg = _cfg(), _ecfg()
    params = variants.init_variant_params(cfg, jax.random.key(2), ecfg,
                                          speaker_vae=True)
    batch = _batch()
    T = batch["input_ids"].shape[1]
    batch["bos_mask"] = jnp.zeros((2, T), bool).at[:, 0].set(True)
    batch["bos_token"] = jnp.full((2, T), 5, jnp.int32)
    batch["attention_mask"] = jnp.ones((2, T), jnp.int32)
    out = variants.stream_spkvae_forward(params, cfg, batch, ecfg,
                                         jax.random.key(0))
    for k in ("audio_loss", "end_loss", "speaker_cond_kl"):
        assert np.isfinite(float(out[k])), k


def test_stream_generate():
    cfg, ecfg = _cfg(), _ecfg()
    params = variants.init_variant_params(cfg, jax.random.key(3), ecfg,
                                          speaker_vae=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 300, (1, 20)))
    warm = jnp.zeros((1, 3, 8), jnp.float32)
    spk = sample_speaker_cond(params, jax.random.key(1), 64)
    res = stream_generate(params, cfg, ids, warm, spk, jax.random.key(2),
                          max_steps=6)
    assert res.samples.shape == (1, 6, 8)
    assert np.isfinite(np.asarray(res.samples)).all()


def test_cfg_generate_both_variants():
    cfg = _cfg()
    params = llasa.init_params(cfg, jax.random.key(4))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 300, (1, 6)))
    for v in ("v1", "v2"):
        res = cfg_generate(params, cfg, ids, jax.random.key(0), max_frames=6,
                           cfg_variant=v, end_kl_threshold=-1.0)
        assert res.samples.shape == (1, 6, 8)
        assert np.isfinite(np.asarray(res.samples)).all()


def test_cfg_guidance_changes_output():
    cfg = _cfg()
    params = llasa.init_params(cfg, jax.random.key(5))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 300, (1, 6)))
    r0 = cfg_generate(params, cfg, ids, jax.random.key(0), max_frames=5,
                      cfg_variant="v1", guidance_k=0.0, end_kl_threshold=-1.0)
    r1 = cfg_generate(params, cfg, ids, jax.random.key(0), max_frames=5,
                      cfg_variant="v1", guidance_k=2.0, end_kl_threshold=-1.0)
    assert np.abs(np.asarray(r0.samples) - np.asarray(r1.samples)).max() > 1e-5


def test_prompt_fit_reduces_loss():
    cfg = _cfg()
    params = llasa.init_params(cfg, jax.random.key(6))
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 300, (1, 4)))
    mean = jnp.asarray(rng.normal(size=(1, 5, 8)), jnp.float32)
    logs = jnp.zeros((1, 5, 8), jnp.float32)
    before = float(prompt_kl_loss(params, cfg, ids, mean, logs,
                                  jax.random.key(0)))
    new_params, loss = prompt_fit(params, cfg, ids, mean, logs,
                                  jax.random.key(1), lr=1e-3,
                                  max_steps=15, warmup=2, train_steps=15)
    after = float(prompt_kl_loss(new_params, cfg, ids, mean, logs,
                                 jax.random.key(0)))
    assert after < before


def test_confidence_interval_sampling():
    rng = jax.random.key(0)
    mean = jnp.zeros((64,))
    std = jnp.ones((64,))
    s = variants.sample_within_confidence_interval(rng, mean, std,
                                                   confidence=0.95,
                                                   n_samples=100)
    assert s.shape == (100, 64)
    assert np.abs(np.asarray(s)).max() <= 1.96 + 1e-5


def test_framewise_speaker_forward_and_generate():
    cfg, ecfg = _cfg(), _ecfg()
    params = variants.init_variant_params(cfg, jax.random.key(8), ecfg)
    out = variants.framewise_speaker_forward(params, cfg, _batch(), ecfg)
    assert np.isfinite(float(out["audio_loss"]))

    from kalle_tpu.infer.generate import generate
    lp = llasa.init_params(cfg, jax.random.key(9))
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 300, (1, 5)))
    mask = jnp.ones((1, 5), jnp.int32)
    bias = jnp.ones((1, cfg.llama.hidden_size)) * 0.1
    r0 = generate(lp, cfg, ids, mask, jax.random.key(0), max_frames=5,
                  end_kl_threshold=-1.0)
    r1 = generate(lp, cfg, ids, mask, jax.random.key(0), max_frames=5,
                  end_kl_threshold=-1.0, embed_bias=bias)
    assert np.isfinite(np.asarray(r1.samples)).all()
    assert np.abs(np.asarray(r0.means) - np.asarray(r1.means)).max() > 1e-5
