"""Llasa: the KALL-E-style continuous-latent audio LM.

A frozen-ish Llama backbone plus:
  * audio_linear: latent_dim -> audio_proj_dim (== hidden) projection
    (ref: model_sigmaVAE.py:33-35)
  * distribution_linear: Linear -> GELU -> Linear MLP head emitting the
    next-frame latent distribution parameters (ref: model_sigmaVAE.py:42-50,
    model.py:43-51)

Three head variants, selected by LlasaConfig.head_variant:
  "sigma":       head -> mean (d); sigma fixed 0.5 on both sides; input
                 latents are noised by sample() before embedding; loss
                 KL(pred || label)                  (model_sigmaVAE.py:53-104)
  "stableaudio": head -> mean||log_scale (2d); labels are the encoder's
                 mean||scale stack, label std x1.25; loss KL(label || pred)
                                                    (model.py:52-107)
  "melvae":      head -> mean||log_scale (2d); labels mean||log_scale,
                 std=exp, no rescale; loss KL(label || pred)
                                        (training_version/melvae/model.py:51-100)

Sequence packing: one packed row per sample — [text ids][audio frames] —
merged by elementwise masks, with attention over the union
(ref: model_sigmaVAE.py:73-74).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.config import LlasaConfig
from . import llama
from .losses import (
    gaussian_kl,
    gaussian_kl_same_std,
    masked_frame_loss,
    split_mean_scale_btd,
)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(cfg: LlasaConfig, key: jax.Array) -> dict:
    k_llama, k_al, k_d0, k_d2 = jax.random.split(key, 4)
    d, p, o = cfg.latent_dim, cfg.audio_proj_dim, cfg.head_out_dim

    def lin(k, fan_in, fan_out):
        bound = fan_in ** -0.5
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
        }

    al = lin(k_al, d, p)
    d0 = lin(k_d0, p, o)
    d2 = lin(k_d2, o, o)
    return {
        "llama": llama.init_params(cfg.llama, k_llama),
        "audio_linear": al,
        "distribution_linear": {"w0": d0["w"], "b0": d0["b"],
                                "w2": d2["w"], "b2": d2["b"]},
    }


def audio_proj(params: dict, latents: jnp.ndarray, dtype) -> jnp.ndarray:
    al = params["audio_linear"]
    return latents.astype(dtype) @ al["w"].astype(dtype) + al["b"].astype(dtype)


def distribution_head(params: dict, hidden: jnp.ndarray, dtype) -> jnp.ndarray:
    dl = params["distribution_linear"]
    x = hidden @ dl["w0"].astype(dtype) + dl["b0"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    return x @ dl["w2"].astype(dtype) + dl["b2"].astype(dtype)


def sample_fix(key: jax.Array, mean: jnp.ndarray, std: float) -> jnp.ndarray:
    """sigma-VAE 'fix' sampling: mean + std * N(0,1)
    (ref: model_sigmaVAE.py:164-166)."""
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def sample_gaussian(key: jax.Array, mean: jnp.ndarray, std: float) -> jnp.ndarray:
    """sigma-VAE 'gaussian' sampling: per-batch random std scaled by
    std/0.8 (ref: model_sigmaVAE.py:167-176)."""
    k1, k2 = jax.random.split(key)
    b = mean.shape[0]
    per_batch = jax.random.normal(k1, (b,), mean.dtype) * (std / 0.8)
    per_batch = per_batch.reshape((b,) + (1,) * (mean.ndim - 1))
    return mean + per_batch * jax.random.normal(k2, mean.shape, mean.dtype)


# ---------------------------------------------------------------------------
# Forward (training)
# ---------------------------------------------------------------------------

def forward(
    params: dict,
    cfg: LlasaConfig,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    latent_noise: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> Dict[str, jnp.ndarray]:
    """Training forward. batch keys (collate layout, ref
    twj_dataset_offline.py:327-386):
      input_ids (b,t) int32; audio_latents (b,t,d); distribute_labels
      (b,t,d or 2d); ids_mask, audio_mask, target_mask, end_mask (b,t).
    Returns dict(audio_loss, end_loss, pre_mean, ...).
    """
    input_embed, attention_mask, latents = embed_inputs(
        params, cfg, batch, rng=rng, latent_noise=latent_noise)
    hidden = llama.forward(params["llama"], cfg.llama, input_embed,
                           attention_mask, use_flash=use_flash)
    return _head_losses(params, cfg, hidden, batch, latents)


def embed_inputs(
    params: dict,
    cfg: LlasaConfig,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    latent_noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packed-row input embeddings: token embeds and projected audio
    latents merged by elementwise masks (ref: model_sigmaVAE.py:64-74).
    Returns (input_embed (b,t,h), attention_mask (b,t) int32, latents —
    post-noise for the sigma variant)."""
    dt = jnp.dtype(cfg.llama.dtype)
    input_ids = batch["input_ids"]
    latents = batch["audio_latents"]
    ids_mask = batch["ids_mask"].astype(dt)
    audio_mask = batch["audio_mask"].astype(dt)

    text_embed = llama.embed_tokens(params["llama"], input_ids, cfg.llama)

    if cfg.head_variant == "sigma":
        # input latents are noised before embedding (ref model_sigmaVAE.py:68).
        # latent_noise injects a fixed N(0,1) draw (deterministic replay /
        # golden tests); otherwise rng drives sample_fix.
        if latent_noise is not None:
            latents = latents.astype(dt) + cfg.sigma * latent_noise.astype(dt)
        elif rng is not None:
            latents = sample_fix(rng, latents.astype(dt), cfg.sigma)
        else:
            raise ValueError("sigma variant requires rng or latent_noise")

    audio_embed = audio_proj(params, latents, dt)
    input_embed = (audio_embed * audio_mask[..., None]
                   + text_embed * ids_mask[..., None])
    attention_mask = (batch["ids_mask"].astype(jnp.int32)
                      + batch["audio_mask"].astype(jnp.int32))
    return input_embed, attention_mask, latents


def head_kl(params: dict, cfg: LlasaConfig, hidden: jnp.ndarray,
            labels: jnp.ndarray):
    """Distribution head + per-element KL for the configured variant.
    `hidden` is the post-final-norm backbone output. Returns
    (kl_elem (b,t,d), pre_mean, pre_log_scale)."""
    dt = jnp.dtype(cfg.llama.dtype)
    head_out = distribution_head(params, hidden, dt)
    if cfg.head_variant == "sigma":
        mean2 = head_out
        # KL(pred || label), identical stds (ref model_sigmaVAE.py:88-92)
        kl_elem = gaussian_kl_same_std(mean2, cfg.sigma, labels)
        pre_log_scale = jnp.full_like(mean2, jnp.log(cfg.sigma))
    elif cfg.head_variant == "stableaudio":
        mean2, logs2 = split_mean_scale_btd(head_out)
        std2 = jnp.exp(logs2)
        mean1, std1 = split_mean_scale_btd(labels)
        std1 = std1 * cfg.label_std_scale  # ref model.py:87
        kl_elem = gaussian_kl(mean1, std1, mean2, std2)  # KL(label || pred)
        pre_log_scale = logs2
    elif cfg.head_variant == "melvae":
        mean2, logs2 = split_mean_scale_btd(head_out)
        std2 = jnp.exp(logs2)
        mean1, logs1 = split_mean_scale_btd(labels)
        std1 = jnp.exp(logs1)
        kl_elem = gaussian_kl(mean1, std1, mean2, std2)
        pre_log_scale = logs2
    else:
        raise ValueError(f"unknown head_variant {cfg.head_variant}")
    return kl_elem, mean2, pre_log_scale


def _head_losses(params: dict, cfg: LlasaConfig, hidden: jnp.ndarray,
                 batch: Dict[str, jnp.ndarray], latents: jnp.ndarray):
    kl_elem, mean2, pre_log_scale = head_kl(
        params, cfg, hidden, batch["distribute_labels"])
    audio_loss, end_loss = masked_frame_loss(
        kl_elem, cfg.latent_dim, batch["target_mask"], batch["end_mask"]
    )
    extras = ({"ground_truth_audio_latents": latents}
              if cfg.head_variant == "sigma" else {})
    return {
        "audio_loss": audio_loss,
        "end_loss": end_loss,
        "pre_mean": mean2,
        "pre_log_scale": pre_log_scale,
        **extras,
    }


def end_kl(cfg: LlasaConfig, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Per-frame KL(pred || N(end_mean, end_std)) / d — the end-of-speech
    test statistic (ref: model.py:138-141, model_sigmaVAE.py:135-139)."""
    kl = gaussian_kl(mean, std, jnp.full_like(mean, cfg.end_mean),
                     jnp.full_like(mean, cfg.end_std))
    return kl.sum(axis=-1) / jnp.float32(cfg.latent_dim)
