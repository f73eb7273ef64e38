"""Llasa capability variants: speaker conditioning, speaker dropout,
text/audio stream interleave, global speaker VAE.

References (all use a single-Linear 2d head, unlike the primary MLP head):
  * Llasa + speaker frame: ECAPA embedding prepended as frame 0, hidden[1:]
    used for the head (backup/model copy.py:47-107)
  * Llasa_random_drop_spkcond: speaker_cond_keep -> torch.where(cond, emb,
    ones) dropout (backup/model copy.py:338-434; drop prob from
    dataset.spk_drop_prob, twj_dataset.py:346-349)
  * Llasa_text_stream: per-step embed = text[i] + audio[i] (summed streams),
    loss = kl.mean() (backup/model copy.py:207-293)
  * Llasa_text_stream_spkvae: streaming with BOS substitution on the audio
    stream and a global speaker VAE (ECAPA -> (mean, logs) -> sample,
    KL to N(0,1)) (infer_backup/infer_stream.py:60-145)
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...core.config import LlasaConfig
from ..conditioning import ecapa
from . import llama
from .losses import gaussian_kl, masked_frame_loss, split_mean_scale_btd


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_variant_params(cfg: LlasaConfig, key: jax.Array,
                        ecapa_cfg: Optional[ecapa.EcapaConfig] = None,
                        speaker_vae: bool = False) -> dict:
    """Variant param tree: llama + audio_linear + LINEAR distribution head
    (2d out) + ECAPA speaker encoder (+ optional speaker-VAE head)."""
    import math

    k_ll, k_al, k_dl, k_se, k_sv = jax.random.split(key, 5)
    d, h = cfg.latent_dim, cfg.audio_proj_dim

    def lin(k, cin, cout):
        kw, kb = jax.random.split(k)
        bound = cin ** -0.5
        return {"w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
                "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}

    ecapa_cfg = ecapa_cfg or ecapa.EcapaConfig(embd_dim=h)
    params = {
        "llama": llama.init_params(cfg.llama, k_ll),
        "audio_linear": lin(k_al, d, h),
        "distribution_linear": lin(k_dl, h, 2 * d),
        "speaker_encoder": ecapa.init_params(ecapa_cfg, k_se),
    }
    if speaker_vae:
        params["speaker_cond_disp_linear"] = lin(k_sv, h, 2 * h)
    return params


def _audio_proj(params, x, dt):
    p = params["audio_linear"]
    return x.astype(dt) @ p["w"].astype(dt) + p["b"].astype(dt)


def _head(params, h, dt):
    p = params["distribution_linear"]
    return h @ p["w"].astype(dt) + p["b"].astype(dt)


def speaker_embedding(params, ecapa_cfg, mels_bdt: jnp.ndarray) -> jnp.ndarray:
    """mels (B, n_mels, T) -> (B, h). The reference calls the encoder with
    mels.transpose(1,2) (model copy.py:67) i.e. (B, T, n_mels)."""
    return ecapa.forward(params["speaker_encoder"], ecapa_cfg,
                         jnp.transpose(mels_bdt, (0, 2, 1)))


# ---------------------------------------------------------------------------
# forwards
# ---------------------------------------------------------------------------

def speaker_forward(
    params: dict,
    cfg: LlasaConfig,
    batch: Dict[str, jnp.ndarray],
    ecapa_cfg: ecapa.EcapaConfig,
    speaker_dropout: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Speaker-conditioned forward: speaker frame prepended at position 0
    (model copy.py:70-80); loss KL(pred || label), both stds = exp(logs).
    With speaker_dropout, rows with speaker_cond_keep=False replace the
    speaker embedding by ONES (model copy.py:397)."""
    dt = jnp.dtype(cfg.llama.dtype)
    ids_mask = batch["ids_mask"].astype(dt)
    audio_mask = batch["audio_mask"].astype(dt)

    text_embed = llama.embed_tokens(params["llama"], batch["input_ids"], cfg.llama)
    audio_embed = _audio_proj(params, batch["audio_latents"], dt)

    spk = speaker_embedding(params, ecapa_cfg, batch["mels"].astype(jnp.float32))
    if speaker_dropout:
        keep = batch["speaker_cond_keep"].astype(bool)[:, None]
        spk = jnp.where(keep, spk, jnp.ones_like(spk))

    input_embed = (audio_embed * audio_mask[..., None]
                   + text_embed * ids_mask[..., None])
    input_embed = jnp.concatenate([spk.astype(dt)[:, None, :], input_embed], axis=1)
    attn = jnp.concatenate(
        [jnp.ones((input_embed.shape[0], 1), jnp.int32),
         batch["ids_mask"].astype(jnp.int32) + batch["audio_mask"].astype(jnp.int32)],
        axis=1)

    hidden = llama.forward(params["llama"], cfg.llama, input_embed, attn)
    hidden = hidden[:, 1:, :]  # drop speaker frame (model copy.py:81)
    out = _head(params, hidden, dt)

    mean2, logs2 = split_mean_scale_btd(out)
    mean1, logs1 = split_mean_scale_btd(batch["distribute_labels"])
    kl_elem = gaussian_kl(mean2, jnp.exp(logs2), mean1, jnp.exp(logs1))  # KL(p||l)
    audio_loss, end_loss = masked_frame_loss(
        kl_elem, cfg.latent_dim, batch["target_mask"], batch["end_mask"])
    return {"audio_loss": audio_loss, "end_loss": end_loss,
            "pre_mean": mean2, "pre_log_scale": logs2}


def text_stream_forward(
    params: dict,
    cfg: LlasaConfig,
    batch: Dict[str, jnp.ndarray],
    ecapa_cfg: ecapa.EcapaConfig,
) -> Dict[str, jnp.ndarray]:
    """Streaming-interleave training: embed = text + audio SUMMED per step,
    speaker frame prepended, loss = mean KL over ALL positions
    (model copy.py:243-293)."""
    dt = jnp.dtype(cfg.llama.dtype)
    text_embed = llama.embed_tokens(params["llama"], batch["input_ids"], cfg.llama)
    audio_embed = _audio_proj(params, batch["audio_latents"], dt)
    spk = speaker_embedding(params, ecapa_cfg, batch["mels"].astype(jnp.float32))

    input_embed = text_embed + audio_embed
    input_embed = jnp.concatenate([spk.astype(dt)[:, None, :], input_embed], axis=1)
    attn = jnp.ones(input_embed.shape[:2], jnp.int32)

    hidden = llama.forward(params["llama"], cfg.llama, input_embed, attn)[:, 1:, :]
    out = _head(params, hidden, dt)
    mean2, logs2 = split_mean_scale_btd(out)
    mean1, logs1 = split_mean_scale_btd(batch["distribute_labels"])
    kl_elem = gaussian_kl(mean2, jnp.exp(logs2), mean1, jnp.exp(logs1))
    audio_loss = (kl_elem.sum(2) / cfg.latent_dim).mean()
    return {"audio_loss": audio_loss, "end_loss": None,
            "pre_mean": mean2, "pre_log_scale": logs2}


def stream_spkvae_forward(
    params: dict,
    cfg: LlasaConfig,
    batch: Dict[str, jnp.ndarray],
    ecapa_cfg: ecapa.EcapaConfig,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Streaming + global speaker VAE (infer_stream.py:76-145):
    audio embeds replaced by BOS embedding where bos_mask; ECAPA -> VAE
    (mean, logs) -> sampled speaker frame; KL(spk || N(0,1))/h regularizer."""
    dt = jnp.dtype(cfg.llama.dtype)
    h = cfg.audio_proj_dim
    text_embed = llama.embed_tokens(params["llama"], batch["input_ids"], cfg.llama)
    audio_embed = _audio_proj(params, batch["audio_latents"], dt)
    bos_embed = llama.embed_tokens(params["llama"], batch["bos_token"], cfg.llama)
    audio_embed = jnp.where(batch["bos_mask"][..., None], bos_embed, audio_embed)

    spk = speaker_embedding(params, ecapa_cfg, batch["mels"].astype(jnp.float32))
    pd = params["speaker_cond_disp_linear"]
    disp = spk @ pd["w"] + pd["b"]
    spk_mean, spk_logs = disp[..., :h], disp[..., h:]
    k1, _ = jax.random.split(rng)
    spk_sample = spk_mean + jax.random.normal(k1, spk_mean.shape) * jnp.exp(spk_logs)
    spk_kl_elem = gaussian_kl(spk_mean, jnp.exp(spk_logs),
                              jnp.zeros_like(spk_mean), jnp.ones_like(spk_logs))
    speaker_cond_kl = (spk_kl_elem.sum(1) / h).mean()

    input_embed = text_embed + audio_embed
    input_embed = jnp.concatenate([spk_sample.astype(dt)[:, None, :], input_embed],
                                  axis=1)
    attn = jnp.concatenate(
        [jnp.ones((input_embed.shape[0], 1), jnp.int32),
         batch["attention_mask"].astype(jnp.int32)], axis=1)

    hidden = llama.forward(params["llama"], cfg.llama, input_embed, attn)[:, 1:, :]
    out = _head(params, hidden, dt)
    mean2, logs2 = split_mean_scale_btd(out)
    mean1, logs1 = split_mean_scale_btd(batch["distribute_labels"])
    kl_elem = gaussian_kl(mean2, jnp.exp(logs2), mean1, jnp.exp(logs1))
    audio_loss, end_loss = masked_frame_loss(
        kl_elem, cfg.latent_dim, batch["target_mask"], batch["end_mask"])
    return {"speaker_cond_kl": speaker_cond_kl, "audio_loss": audio_loss,
            "end_loss": end_loss, "pre_mean": mean2, "pre_log_scale": logs2}


def framewise_speaker_forward(
    params: dict,
    cfg: LlasaConfig,
    batch: Dict[str, jnp.ndarray],
    ecapa_cfg: ecapa.EcapaConfig,
) -> Dict[str, jnp.ndarray]:
    """Per-frame speaker conditioning: the ECAPA embedding is ADDED to every
    input embedding instead of prepended as a frame
    (ref infer_backup/infer_framewise_cond.py:84-90)."""
    dt = jnp.dtype(cfg.llama.dtype)
    ids_mask = batch["ids_mask"].astype(dt)
    audio_mask = batch["audio_mask"].astype(dt)

    text_embed = llama.embed_tokens(params["llama"], batch["input_ids"], cfg.llama)
    audio_embed = _audio_proj(params, batch["audio_latents"], dt)
    spk = speaker_embedding(params, ecapa_cfg, batch["mels"].astype(jnp.float32))

    input_embed = (audio_embed * audio_mask[..., None]
                   + text_embed * ids_mask[..., None])
    input_embed = input_embed + spk.astype(dt)[:, None, :]
    attn = (batch["ids_mask"].astype(jnp.int32)
            + batch["audio_mask"].astype(jnp.int32))

    hidden = llama.forward(params["llama"], cfg.llama, input_embed, attn)
    out = _head(params, hidden, dt)
    mean2, logs2 = split_mean_scale_btd(out)
    mean1, logs1 = split_mean_scale_btd(batch["distribute_labels"])
    kl_elem = gaussian_kl(mean2, jnp.exp(logs2), mean1, jnp.exp(logs1))
    audio_loss, end_loss = masked_frame_loss(
        kl_elem, cfg.latent_dim, batch["target_mask"], batch["end_mask"])
    return {"audio_loss": audio_loss, "end_loss": end_loss,
            "pre_mean": mean2, "pre_log_scale": logs2}


# ---------------------------------------------------------------------------
# sampling utilities (reconstructions of the missing norm_sample module)
# ---------------------------------------------------------------------------

def sample_within_confidence_interval(
    rng: jax.Array, mean: jnp.ndarray, std: jnp.ndarray,
    confidence: float = 0.95, n_samples: int = 1,
) -> jnp.ndarray:
    """Truncated-normal sampling within the two-sided confidence interval.
    Reconstruction of norm_sample.sample_within_confidence_interval (broken
    symlink; call sites backup/model copy.py:170,
    infer_backup/infer_with_sampleing.py). Returns (n_samples,) + mean.shape."""
    from jax.scipy.stats import norm as jnorm

    z = jax.scipy.stats.norm.ppf(0.5 + confidence / 2.0)
    lo, hi = -z, z
    u = jax.random.truncated_normal(rng, lo, hi,
                                    (n_samples,) + tuple(mean.shape))
    return mean[None] + u * std[None]


def batch_weighted_difference_sampling(
    rng: jax.Array, mean: jnp.ndarray, std: jnp.ndarray,
    cfg_mean: jnp.ndarray, cfg_std: jnp.ndarray, K: float = 0.1,
) -> jnp.ndarray:
    """Classifier-free-guidance-style sampling: push the conditional mean
    away from the unconditional one by the weighted difference, then sample.
    Reconstruction of the missing norm_sample.batch_weighted_difference_sampling
    (call site backup/model copy.py:174, K=0.1)."""
    guided = mean + K * (mean - cfg_mean)
    return guided + std * jax.random.normal(rng, mean.shape, mean.dtype)


def cfg_attention_masks(text_len: int, audio_len: int, variant: str,
                        rng: Optional[jax.Array] = None,
                        cfg_prob: float = 0.5):
    """CFG mask builders (model copy.py:128-149):
    v1: text masked OUT (zeros), audio kept; appended frames kept (ones).
    v2: text kept, audio randomly dropped w.p. cfg_prob; appended frames
    masked (zeros)."""
    if variant == "v1":
        text = jnp.zeros((1, text_len), bool)
        audio = jnp.ones((1, audio_len), bool) if audio_len else None
        append = True
    elif variant == "v2":
        text = jnp.ones((1, text_len), bool)
        if audio_len:
            drop = jax.random.uniform(rng, (1, audio_len)) < cfg_prob
            audio = ~drop
        else:
            audio = None
        append = False
    else:
        raise ValueError(variant)
    mask = text if audio is None else jnp.concatenate([text, audio], axis=1)
    return mask, append
