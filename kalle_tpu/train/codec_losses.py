"""Codec training losses: multi-resolution STFT, L1, KL, adversarial.

Reference: the vendored auraloss MultiResolutionSTFTLoss
(stable_audio_tools/training/losses/auraloss.py:443: spectral convergence +
log-magnitude L1 over several (fft, hop, win) resolutions) used by
AutoencoderTrainingWrapper (training/autoencoders.py:19). Needed to train
the Oobleck / mel-VAE codecs on TPU rather than merely importing them
(SURVEY.md §2.3 build note).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..ops.mel import stft_mag

# auraloss defaults (fft_sizes, hop_sizes, win_lengths)
DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def stft_loss(x: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop: int,
              win: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(spectral_convergence, log_magnitude_L1) for (..., T) signals."""
    sx = stft_mag(x, n_fft, hop, win, power=1.0)
    sy = stft_mag(y, n_fft, hop, win, power=1.0)
    sc = jnp.linalg.norm(sy - sx) / jnp.maximum(jnp.linalg.norm(sy), 1e-8)
    mag = jnp.mean(jnp.abs(jnp.log(sx + 1e-7) - jnp.log(sy + 1e-7)))
    return sc, mag


def multi_resolution_stft_loss(
    x: jnp.ndarray, y: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
    w_sc: float = 1.0, w_mag: float = 1.0,
) -> jnp.ndarray:
    """x = reconstruction, y = target; signals (..., T)."""
    total = 0.0
    for n_fft, hop, win in resolutions:
        if y.shape[-1] < n_fft:
            continue
        sc, mag = stft_loss(x, y, n_fft, hop, win)
        total = total + w_sc * sc + w_mag * mag
    return total / len(resolutions)


def l1_time_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def vae_kl_loss(mean: jnp.ndarray, logs: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mean, exp(logs)) || N(0,1)) per element, meaned."""
    var = jnp.exp(2.0 * logs)
    return jnp.mean(0.5 * (mean * mean + var - 2.0 * logs - 1.0))


# ---- adversarial (least-squares GAN, Encodec/BigVGAN convention) ----

def generator_adv_loss(fake_logits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return sum(jnp.mean((1.0 - f) ** 2) for f in fake_logits) / len(fake_logits)


def discriminator_adv_loss(real_logits: Sequence[jnp.ndarray],
                           fake_logits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + jnp.mean((1.0 - r) ** 2) + jnp.mean(f ** 2)
    return loss / len(real_logits)


def feature_matching_loss(real_feats, fake_feats) -> jnp.ndarray:
    """L1 over all intermediate discriminator features."""
    total = 0.0
    n = 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            total = total + jnp.mean(jnp.abs(r - f))
            n += 1
    return total / max(n, 1)
