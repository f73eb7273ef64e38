"""VAE-GAN codec training on TPU: alternating generator/discriminator steps.

Reference: AutoencoderTrainingWrapper (stable_audio_tools/training/
autoencoders.py:19 — MRSTFT + L1 + KL + adversarial + feature matching) and
the mel-VAE's BigVGAN-style recipe. Generator loss:
    w_mrstft * MRSTFT + w_l1 * L1 + w_kl * KL(q||N(0,1))
    + w_adv * LSGAN + w_fm * feature-matching
Both steps are single jitted functions; dp sharding comes from jit like the
LM train step.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.codecs import discriminators as disc
from ..models.codecs import melvae, oobleck, sigmavae
from .codec_losses import (
    discriminator_adv_loss,
    discriminator_hinge_loss,
    feature_matching_loss,
    generator_adv_loss,
    generator_hinge_loss,
    l1_time_loss,
    multi_resolution_stft_loss,
    sum_and_difference_stft_loss,
    vae_kl_loss,
)


class CodecTrainState(NamedTuple):
    gen_params: dict
    disc_params: dict
    gen_opt: optax.OptState
    disc_opt: optax.OptState
    step: jnp.ndarray
    # EMA copy of gen_params (None = disabled). The reference keeps an EMA
    # autoencoder for eval/export (ema_pytorch, beta=0.9999, power=3/4,
    # ref autoencoders.py:192-206); updated every generator step.
    gen_ema: dict = None


class LossWeights(NamedTuple):
    mrstft: float = 1.0
    l1: float = 0.1
    mse: float = 0.0
    kl: float = 1e-4
    adv: float = 1.0
    fm: float = 2.0

    @staticmethod
    def oobleck_default() -> "LossWeights":
        """The reference wrapper's default loss_config for the Oobleck arm
        (stable_audio_tools/training/autoencoders.py:76-117,450-453):
        mrstft 1.0, l1 0.0, adversarial 0.1, feature_matching 5.0, kl 1e-6."""
        return LossWeights(mrstft=1.0, l1=0.0, mse=0.0, kl=1e-6,
                           adv=0.1, fm=5.0)


def inverse_lr_schedule(base_lr: float, inv_gamma: float = 1.0,
                        power: float = 1.0, warmup: float = 0.0,
                        final_lr: float = 0.0):
    """InverseLR closed form (ref stable_audio_tools/training/utils.py:17-56):
    lr(t) = (1 - warmup**(t+1)) * max(final_lr, base_lr * (1 + t/inv_gamma)**-power)."""

    def schedule(step):
        w = 1.0 - warmup ** (step + 1.0)
        mult = (1.0 + step / inv_gamma) ** -power
        return w * jnp.maximum(final_lr, base_lr * mult)

    return schedule


def make_codec_optimizer(lr: float = 1e-4, betas=(0.8, 0.99),
                         use_inverse_lr: bool = False,
                         **sched_kwargs) -> optax.GradientTransformation:
    """Reference default codec optimizer: AdamW betas (0.8, 0.99)
    (ref stable_audio_tools/training/autoencoders.py:50-70), optionally under
    the InverseLR decay the training factory wires up."""
    sched = inverse_lr_schedule(lr, **sched_kwargs) if use_inverse_lr else lr
    return optax.adamw(sched, b1=betas[0], b2=betas[1])


def make_state(gen_params, disc_params, gen_tx, disc_tx,
               use_ema: bool = False) -> CodecTrainState:
    return CodecTrainState(gen_params, disc_params, gen_tx.init(gen_params),
                           disc_tx.init(disc_params),
                           jnp.zeros((), jnp.int32),
                           gen_ema=(jax.tree.map(jnp.copy, gen_params)
                                    if use_ema else None))


def ema_decay(step, beta: float = 0.9999, power: float = 0.75):
    """ema_pytorch's power-decay schedule (the reference's EMA settings,
    ref autoencoders.py:198-205): d(t) = clip(1 - (1+t)^-power, 0, beta) —
    fast tracking early, -> beta asymptotically."""
    t = jnp.maximum(step.astype(jnp.float32), 0.0)
    return jnp.clip(1.0 - (1.0 + t) ** -power, 0.0, beta)


def _reconstruct(kind: str, cfg, params, wav, rng,
                 freeze_encoder: bool = False,
                 latent_mask_ratio: float = 0.0):
    """-> (wav_hat, kl_loss). wav (B, 1, T). freeze_encoder stops gradients
    at the encoder output (encoder_freeze_on_warmup); latent_mask_ratio
    randomly zeros that fraction of latents before decode (both ref
    autoencoders.py:243-263)."""
    if kind == "melvae":
        wav_hat, (_, m_q, logs_q) = melvae.forward(
            params, cfg, wav, rng, freeze_encoder=freeze_encoder,
            latent_mask_ratio=latent_mask_ratio)
        kl = vae_kl_loss(jnp.transpose(m_q, (0, 2, 1)),
                         jnp.transpose(logs_q, (0, 2, 1)))
        return wav_hat, kl
    if kind == "sigma":
        z = sigmavae.encode(params, cfg, wav)
        if freeze_encoder:
            z = jax.lax.stop_gradient(z)
        z_noised = z + cfg.sigma * jax.random.normal(rng, z.shape, z.dtype)
        if latent_mask_ratio > 0.0:
            keep = jax.random.uniform(jax.random.fold_in(rng, 1),
                                      z.shape) >= latent_mask_ratio
            z_noised = jnp.where(keep, z_noised, jnp.zeros_like(z_noised))
        wav_hat = sigmavae.decode(params, cfg, z_noised)
        # sigma-VAE regularizer: E||mean||^2 (fixed variance)
        kl = jnp.mean(z * z)
        return wav_hat, kl
    if kind == "oobleck":
        # Stereo 44.1 kHz Oobleck VAE with the patched passthrough bottleneck:
        # encoder emits mean||scale, sampling happens vae_sample-style in the
        # caller with scale used DIRECTLY as the stdev (no softplus — ref
        # stable_audio_tools/models/bottleneck.py:51-62 as patched by kalle),
        # KL = (mean^2 + var - logvar - 1).sum(channels).mean() to match.
        ms = oobleck.encode_nwc(params, cfg, jnp.transpose(wav, (0, 2, 1)))
        if freeze_encoder:
            ms = jax.lax.stop_gradient(ms)
        d = ms.shape[-1] // 2
        mean, scale = ms[..., :d], ms[..., d:]
        z = mean + scale * jax.random.normal(rng, mean.shape, mean.dtype)
        if latent_mask_ratio > 0.0:
            keep = jax.random.uniform(jax.random.fold_in(rng, 1),
                                      z.shape) >= latent_mask_ratio
            z = jnp.where(keep, z, jnp.zeros_like(z))
        wav_hat = jnp.transpose(oobleck.decode_nwc(params, cfg, z), (0, 2, 1))
        var = scale * scale
        logvar = jnp.log(jnp.maximum(var, 1e-12))
        kl = jnp.mean(jnp.sum(mean * mean + var - logvar - 1.0, axis=-1))
        return wav_hat, kl
    raise ValueError(kind)


@functools.partial(jax.jit, static_argnames=("kind", "cfg", "dcfg", "gen_tx",
                                             "weights", "warmup_steps",
                                             "gan_on", "resolutions",
                                             "freeze_encoder",
                                             "latent_mask_ratio",
                                             "adv_type"))
def generator_step(state: CodecTrainState, kind: str, cfg, dcfg, gen_tx,
                   weights: LossWeights, wav: jnp.ndarray, rng: jax.Array,
                   warmup_steps: int = 0, gan_on: bool = True,
                   resolutions=None, freeze_encoder: bool = False,
                   latent_mask_ratio: float = 0.0,
                   adv_type: str = "lsgan"
                   ) -> Tuple[CodecTrainState, Dict[str, jnp.ndarray]]:
    """One generator update. Adversarial + feature-matching terms are zero
    until ``state.step >= warmup_steps`` (reference semantics:
    stable_audio_tools/training/autoencoders.py:228-292 — recon-only until
    warmed up, then the GAN terms switch on).

    ``gan_on=False`` compiles a recon-only graph with NO discriminator ops
    at all — the dynamic ``warmed`` gate multiplies by a traced scalar, so
    XLA cannot dead-code the disc forward/backward out of the warmup graph;
    hosts that know the phase statically (the train loop does) should pass
    ``gan_on=(step >= warmup)``. The saving scales with discriminator size
    (a few % for DiscriminatorConfig.tiny, substantial for the full
    MPD+MRD stack). The two graphs produce identical updates during warmup
    (tested).

    ``resolutions`` overrides the MRSTFT resolution bank (static tuple of
    (n_fft, hop, win); default = auraloss defaults, whose dense hops
    120/240/50 cost ~2x the sparser banks typically used for eval)."""
    rng = jax.random.fold_in(rng, state.step)
    warmed = (state.step >= warmup_steps).astype(jnp.float32)
    mr_kw = {} if resolutions is None else {"resolutions": resolutions}

    def loss_fn(gp):
        wav_hat, kl = _reconstruct(kind, cfg, gp, wav, rng,
                                   freeze_encoder=freeze_encoder,
                                   latent_mask_ratio=latent_mask_ratio)
        T = min(wav.shape[-1], wav_hat.shape[-1])
        x, y = wav_hat[..., :T], wav[..., :T]
        if wav.shape[1] == 2:
            # stereo: mid/side MRSTFT + per-channel terms (the reference's
            # SumAndDifferenceSTFTLoss composition, autoencoders.py:162-177)
            mr = sum_and_difference_stft_loss(x, y, **mr_kw)
        else:
            mr = multi_resolution_stft_loss(x[:, 0], y[:, 0], **mr_kw)
        l1 = l1_time_loss(x, y)
        mse = jnp.mean((x - y) ** 2)
        total = (weights.mrstft * mr + weights.l1 * l1 + weights.mse * mse
                 + weights.kl * kl)
        if gan_on:
            fake_logits, fake_feats = disc.forward(state.disc_params, dcfg, x)
            _, real_feats = disc.forward(state.disc_params, dcfg, y)
            adv = (generator_hinge_loss(fake_logits) if adv_type == "hinge"
                   else generator_adv_loss(fake_logits))
            fm = feature_matching_loss(real_feats, fake_feats)
            total = total + warmed * (weights.adv * adv + weights.fm * fm)
        else:
            adv = fm = jnp.zeros((), total.dtype)
        return total, {"mrstft": mr, "l1": l1, "mse": mse, "kl": kl,
                       "adv_g": adv, "fm": fm, "gen_total": total}

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.gen_params)
    updates, gen_opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, updates)
    gen_ema = state.gen_ema
    if gen_ema is not None:  # static: None means EMA disabled
        d = ema_decay(state.step)
        gen_ema = jax.tree.map(lambda e, p: e + (1.0 - d) * (p - e),
                               gen_ema, gen_params)
    return state._replace(gen_params=gen_params, gen_opt=gen_opt,
                          gen_ema=gen_ema, step=state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("kind", "cfg", "dcfg", "disc_tx",
                                             "adv_type"))
def discriminator_step(state: CodecTrainState, kind: str, cfg, dcfg, disc_tx,
                       wav: jnp.ndarray, rng: jax.Array,
                       adv_type: str = "lsgan"
                       ) -> Tuple[CodecTrainState, Dict[str, jnp.ndarray]]:
    rng = jax.random.fold_in(rng, state.step)
    wav_hat, _ = _reconstruct(kind, cfg, state.gen_params, wav, rng)
    T = min(wav.shape[-1], wav_hat.shape[-1])
    x = jax.lax.stop_gradient(wav_hat[..., :T])
    y = wav[..., :T]

    def loss_fn(dp):
        real_logits, _ = disc.forward(dp, dcfg, y)
        fake_logits, _ = disc.forward(dp, dcfg, x)
        if adv_type == "hinge":
            return discriminator_hinge_loss(real_logits, fake_logits)
        return discriminator_adv_loss(real_logits, fake_logits)

    loss, grads = jax.value_and_grad(loss_fn)(state.disc_params)
    updates, disc_opt = disc_tx.update(grads, state.disc_opt,
                                       state.disc_params)
    disc_params = optax.apply_updates(state.disc_params, updates)
    return state._replace(disc_params=disc_params, disc_opt=disc_opt), \
        {"adv_d": loss}
