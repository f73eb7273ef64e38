"""Distribution heads' losses: closed-form diagonal-Gaussian KL.

The reference computes KL via torch.distributions (ref: model.py:93-100,
model_sigmaVAE.py:88-96) with reduction `kl.sum(dim=2) / latent_dim`,
then masked means over target/end masks. Same semantics here in jnp.
"""
from __future__ import annotations

import jax.numpy as jnp


def gaussian_kl(mean1, std1, mean2, std2):
    """KL( N(mean1, std1) || N(mean2, std2) ), elementwise, f32."""
    m1 = mean1.astype(jnp.float32)
    m2 = mean2.astype(jnp.float32)
    s1 = std1.astype(jnp.float32)
    s2 = std2.astype(jnp.float32)
    return (
        jnp.log(s2 / s1)
        + (s1 * s1 + (m1 - m2) ** 2) / (2.0 * s2 * s2)
        - 0.5
    )


def gaussian_kl_same_std(mean1, std, mean2):
    """KL with identical stds reduces to (m1-m2)^2 / (2 std^2)
    (the sigma-VAE case, std fixed at 0.5: ref model_sigmaVAE.py:88-92)."""
    d = mean1.astype(jnp.float32) - mean2.astype(jnp.float32)
    return d * d / (2.0 * jnp.float32(std) ** 2)


def masked_frame_loss(kl_elem: jnp.ndarray, latent_dim: int,
                      target_mask: jnp.ndarray, end_mask: jnp.ndarray):
    """kl_elem: (b, t, d) -> per-frame kl.sum(-1)/latent_dim, then masked
    means (ref: model_sigmaVAE.py:94-96)."""
    kl = kl_elem.sum(axis=2) / jnp.float32(latent_dim)  # (b, t)
    tm = target_mask.astype(jnp.float32)
    em = end_mask.astype(jnp.float32)
    audio_loss = (kl * tm).sum() / jnp.maximum(tm.sum(), 1.0)
    end_loss = (kl * em).sum() / jnp.maximum(em.sum(), 1.0)
    return audio_loss, end_loss


def split_mean_scale_btd(x: jnp.ndarray):
    """Split a (b, t, 2d) stacked mean||scale tensor along the last dim.

    Reconstruction of the missing `get_mean_stdev_from_stableaudio2_latents`
    (broken symlink twj_utils.py; call site ref model.py:84-87 transposes
    (b,t,2d)->(b,2d,t), chunks on channel dim, transposes back — identical
    to chunking the last dim directly). The scale channels are used as the
    stdev directly, matching the vae_sample quirk at
    stable_audio_tools/models/bottleneck.py:56 (no softplus)."""
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]
