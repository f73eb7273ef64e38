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

import jax
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


def sum_and_difference_stft_loss(
    x: jnp.ndarray, y: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
    w_sd: float = 2.0, w_lr: float = 0.5,
) -> jnp.ndarray:
    """Stereo mid/side MRSTFT (Steinmetz 2020), the reference's stereo codec
    recon loss. x = reconstruction, y = target, both (B, 2, T).

    Reference composition (stable_audio_tools/training/autoencoders.py:162-177
    + losses/auraloss.py:534-606): sdstft = (MRSTFT(L+R) + MRSTFT(L-R)) / 2,
    plus per-channel MRSTFT(L), MRSTFT(R) each at mrstft_weight/2. NOTE the
    reference appends the sdstft loss module TWICE (autoencoders.py:163 and
    :175 both add it unconditionally), so its effective weight is 2x the
    configured mrstft weight — ``w_sd=2.0`` reproduces that quirk; pass 1.0
    for the single-count reading."""
    sum_x, diff_x = x[:, 0] + x[:, 1], x[:, 0] - x[:, 1]
    sum_y, diff_y = y[:, 0] + y[:, 1], y[:, 0] - y[:, 1]
    sd = (multi_resolution_stft_loss(sum_x, sum_y, resolutions)
          + multi_resolution_stft_loss(diff_x, diff_y, resolutions)) / 2.0
    lr = (multi_resolution_stft_loss(x[:, 0], y[:, 0], resolutions)
          + multi_resolution_stft_loss(x[:, 1], y[:, 1], resolutions))
    return w_sd * sd + w_lr * lr


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


def generator_hinge_loss(fake_logits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Encodec-family hinge generator loss, summed over scales (NOT meaned —
    ref stable_audio_tools/models/discriminators.py:11-14,46-55 accumulates
    per-scale hinge terms without dividing)."""
    return sum(-jnp.mean(f) for f in fake_logits)


def discriminator_hinge_loss(real_logits: Sequence[jnp.ndarray],
                             fake_logits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(jax.nn.relu(1.0 + f))
    return loss


def feature_matching_loss(real_feats, fake_feats) -> jnp.ndarray:
    """L1 over all intermediate discriminator features."""
    total = 0.0
    n = 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            total = total + jnp.mean(jnp.abs(r - f))
            n += 1
    return total / max(n, 1)
