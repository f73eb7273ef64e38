"""Test-time prompt-fit optimization.

Reference: infer_0828_sigma.py:351-399 (`infer_tools.optim`) and
infer_backup/infer_opt_0801_50.py — before generating, fine-tune the model
on the prompt's latent KL (resampling the prompt latents each step) with
Adam + scheduler, stopping at a loss threshold.

TPU-first: the whole optimization loop is one jitted lax.while_loop; the
reference runs eager torch steps.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import LlasaConfig
from ..models.lm import llama, llasa
from ..models.lm.losses import gaussian_kl, split_mean_scale_btd


def prompt_kl_loss(params, cfg: LlasaConfig, input_ids, mean, logs, rng):
    """KL(pred || prompt latent dist) averaged over prompt frames
    (ref :371-388). mean/logs: (1, T_a, d)."""
    dt = jnp.dtype(cfg.llama.dtype)
    latents = mean + jnp.exp(logs) * jax.random.normal(rng, mean.shape)
    text_embed = llama.embed_tokens(params["llama"], input_ids, cfg.llama)
    audio_embed = llasa.audio_proj(params, latents, dt)
    embeds = jnp.concatenate([text_embed, audio_embed], axis=1)
    mask = jnp.ones(embeds.shape[:2], jnp.int32)
    hidden = llama.forward(params["llama"], cfg.llama, embeds, mask)
    out = llasa.distribution_head(params, hidden, dt)
    t_a = mean.shape[1]
    dis_p = out[:, -1 - t_a:-1, :]
    if cfg.head_variant == "sigma":
        kl = gaussian_kl(dis_p, jnp.full_like(dis_p, cfg.sigma),
                         mean, jnp.full_like(mean, cfg.sigma))
    else:
        mean2, logs2 = split_mean_scale_btd(dis_p)
        kl = gaussian_kl(mean2, jnp.exp(logs2), mean, jnp.exp(logs))
    return (kl.sum(2) / mean.shape[-1]).sum() / t_a


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps", "warmup",
                                             "train_steps", "lr",
                                             "weight_decay"))
def prompt_fit(
    params: dict,
    cfg: LlasaConfig,
    input_ids: jnp.ndarray,          # (1, t_text)
    prompt_mean: jnp.ndarray,        # (1, T_a, d)
    prompt_logs: jnp.ndarray,        # (1, T_a, d)
    rng: jax.Array,
    lr: float = 1e-6,
    weight_decay: float = 1e-2,
    max_steps: int = 200,
    warmup: int = 60,
    train_steps: int = 120,
    loss_threshold: Optional[float] = None,
) -> Tuple[dict, jnp.ndarray]:
    """Returns (adapted params, final loss)."""
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, max(warmup, 1),
                                               max(train_steps, 2), 0.0)
    tx = optax.adamw(sched, weight_decay=weight_decay)
    opt = tx.init(params)
    thres = -jnp.inf if loss_threshold is None else loss_threshold

    def cond(s):
        i, _, _, loss, _ = s
        return jnp.logical_and(i < max_steps, loss >= thres)

    def body(s):
        i, p, opt, _, rng = s
        rng, k = jax.random.split(rng)
        loss, grads = jax.value_and_grad(prompt_kl_loss)(
            p, cfg, input_ids, prompt_mean, prompt_logs, k)
        updates, opt = tx.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return (i + 1, p, opt, loss, rng)

    init = (jnp.zeros((), jnp.int32), params, opt, jnp.asarray(jnp.inf), rng)
    _, params, _, loss, _ = jax.lax.while_loop(cond, body, init)
    return params, loss
