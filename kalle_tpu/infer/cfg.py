"""Classifier-free-guidance decoding.

Reference: backup/model copy.py:128-205 — a second forward with a CFG
attention mask (v1: text masked out; v2: audio randomly dropped), the
guided latent sampled from the weighted difference of the conditional and
CFG distributions (batch_weighted_difference_sampling, K=0.1, :174), and
per-step mask growth (v1 appends ones, v2 appends zeros, :199-202).

TPU-first: ONE shared KV cache per branch (conditional + cfg), both jitted
inside the same while_loop — the reference re-runs both full prefixes
every step.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import LlasaConfig
from ..models.lm import llama, llasa
from ..models.lm.losses import split_mean_scale_btd
from ..models.lm.variants import batch_weighted_difference_sampling


class CFGResult(NamedTuple):
    means: jnp.ndarray
    log_scales: jnp.ndarray
    samples: jnp.ndarray
    n_frames: jnp.ndarray


def _lin(params, name, x, dt):
    p = params[name]
    if name == "distribution_linear" and "w0" in p:
        return llasa.distribution_head(params, x.astype(dt), dt)  # MLP head
    return x.astype(dt) @ p["w"].astype(dt) + p["b"].astype(dt)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "max_frames", "cfg_variant"))
def cfg_generate(
    params: dict,
    cfg: LlasaConfig,
    input_ids: jnp.ndarray,   # (1, t_text)
    rng: jax.Array,
    max_frames: int,
    cfg_variant: str = "v1",
    guidance_k: float = 0.1,
    cfg_prob: float = 0.5,
    end_kl_threshold: Optional[float] = None,
) -> CFGResult:
    lcfg = cfg.llama
    dt = jnp.dtype(lcfg.dtype)
    b, t_text = input_ids.shape
    thres = cfg.end_kl_threshold if end_kl_threshold is None else end_kl_threshold

    embeds = llama.embed_tokens(params["llama"], input_ids, lcfg)
    # 128-aligned so the Pallas decode-attention kernel can engage
    cache_len = -(-(t_text + max_frames + 1) // 128) * 128

    rng, kmask = jax.random.split(rng)
    if cfg_variant == "v1":
        cfg_prompt_mask = jnp.zeros((b, t_text), bool)
        append_live = True  # generated frames stay visible in the cfg branch
    else:  # v2
        cfg_prompt_mask = jnp.ones((b, t_text), bool)
        append_live = False

    def prefill(mask_bool):
        cache = llama.KVCache.zeros(lcfg, b, cache_len)  # dtype from cfg (int8 opt)
        valid = jnp.zeros((b, cache_len), bool).at[:, :t_text].set(mask_bool)
        # attention over the prompt uses the branch mask; ROWS all valid
        h, cache = llama.forward_with_cache(
            params["llama"], lcfg, embeds, cache, attention_mask=valid)
        return h[:, -1:, :], cache, valid

    hid_c, cache_c, valid_c = prefill(jnp.ones((b, t_text), bool))
    hid_u, cache_u, valid_u = prefill(cfg_prompt_mask)

    d = cfg.latent_dim
    state = dict(
        i=jnp.zeros((), jnp.int32), rng=rng,
        cache_c=cache_c, cache_u=cache_u,
        valid_c=valid_c, valid_u=valid_u,
        hid_c=hid_c, hid_u=hid_u,
        done=jnp.zeros((b,), bool), steps=jnp.zeros((b,), jnp.int32),
        means=jnp.zeros((b, max_frames, d), dt),
        logs=jnp.zeros((b, max_frames, d), dt),
        samples=jnp.zeros((b, max_frames, d), dt),
    )

    def cond(s):
        return jnp.logical_and(s["i"] < max_frames, ~jnp.all(s["done"]))

    def body(s):
        i = s["i"]
        rng, krng = jax.random.split(s["rng"])
        out_c = _lin(params, "distribution_linear", s["hid_c"], dt)
        out_u = _lin(params, "distribution_linear", s["hid_u"], dt)
        mean, logs = split_mean_scale_btd(out_c)
        mean_u, logs_u = split_mean_scale_btd(out_u)
        sample = batch_weighted_difference_sampling(
            krng, mean, jnp.exp(logs), mean_u, jnp.exp(logs_u), K=guidance_k)

        live = ~s["done"]
        s["means"] = jax.lax.dynamic_update_slice(
            s["means"], jnp.where(live[:, None, None], mean, 0), (0, i, 0))
        s["logs"] = jax.lax.dynamic_update_slice(
            s["logs"], jnp.where(live[:, None, None], logs, 0), (0, i, 0))
        s["samples"] = jax.lax.dynamic_update_slice(
            s["samples"], jnp.where(live[:, None, None], sample, 0), (0, i, 0))
        s["steps"] = s["steps"] + live.astype(jnp.int32)

        kl = llasa.end_kl(cfg, mean, jnp.exp(logs.astype(jnp.float32)))[:, 0]
        s["done"] = jnp.logical_or(
            s["done"], jnp.logical_and(kl < thres, i >= cfg.min_frames))

        a_embed = _lin(params, "audio_linear", sample, dt)
        slot = s["cache_c"].length
        s["valid_c"] = jax.lax.dynamic_update_slice(
            s["valid_c"], live[:, None], (0, slot))
        s["valid_u"] = jax.lax.dynamic_update_slice(
            s["valid_u"],
            (live if append_live else jnp.zeros_like(live))[:, None], (0, slot))
        s["hid_c"], s["cache_c"] = llama.forward_with_cache(
            params["llama"], lcfg, a_embed, s["cache_c"],
            attention_mask=s["valid_c"])
        s["hid_u"], s["cache_u"] = llama.forward_with_cache(
            params["llama"], lcfg, a_embed, s["cache_u"],
            attention_mask=s["valid_u"])
        s["rng"] = rng
        s["i"] = i + 1
        return s

    state = jax.lax.while_loop(cond, body, state)
    return CFGResult(means=state["means"], log_scales=state["logs"],
                     samples=state["samples"],
                     n_frames=jnp.maximum(state["steps"] - 1, 0))
