"""Flow-space KL auxiliary loss for LM training.

Reference: infer_backup/train copy.py:160-190 (train_online_flow variant):
sample latents from the predicted and label distributions, push both
through the frozen mel-VAE residual-coupling flow (no grad through the
flow), then KL between the flow-space distributions, masked-meaned and
added to the total loss with kl_loss_weight.

NOTE the reference uses torch.rand_like (uniform!) for the reparam noise
here — almost certainly a bug for torch.randn_like; we default to normal
noise and expose `uniform_noise=True` for bit-faithful behavior.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.codecs import melvae
from ..models.lm.losses import gaussian_kl, split_mean_scale_btd


def flow_space_kl(
    flow_params: dict,
    flow_cfg: melvae.MelVAEConfig,
    outputs: Dict[str, jnp.ndarray],   # pre_mean, pre_log_scale (b, t, d)
    labels: jnp.ndarray,               # distribute_labels (b, t, 2d)
    target_mask: jnp.ndarray,          # (b, t)
    rng: jax.Array,
    uniform_noise: bool = False,
) -> jnp.ndarray:
    mean, logs = outputs["pre_mean"], outputs["pre_log_scale"]
    mean_l, logs_l = split_mean_scale_btd(labels)
    k1, k2 = jax.random.split(rng)
    noise = (jax.random.uniform if uniform_noise else jax.random.normal)
    lat_p = mean + jnp.exp(logs) * noise(k1, mean.shape, mean.dtype)
    lat_l = mean_l + jnp.exp(logs_l) * noise(k2, mean_l.shape, mean_l.dtype)

    # frozen flow (no grad through the codec)
    z_p = jax.lax.stop_gradient(melvae.flow(
        flow_params, flow_cfg, jnp.transpose(lat_p, (0, 2, 1))))
    z_l = jax.lax.stop_gradient(melvae.flow(
        flow_params, flow_cfg, jnp.transpose(lat_l, (0, 2, 1))))
    z_p = jnp.transpose(z_p, (0, 2, 1))
    z_l = jnp.transpose(z_l, (0, 2, 1))

    kl = gaussian_kl(z_p, jnp.exp(logs), z_l, jnp.exp(logs_l))
    kl = kl.sum(2) / mean.shape[-1]
    tm = target_mask.astype(jnp.float32)
    return (kl * tm).sum() / jnp.maximum(tm.sum(), 1.0)
