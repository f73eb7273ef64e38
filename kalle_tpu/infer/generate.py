"""KV-cached autoregressive latent generation.

The reference re-runs the ENTIRE prefix through Llama for every generated
frame with no KV cache (ref: model_sigmaVAE.py:106-148, model.py:109-150,
infer_vibevoice.py:171-213) — O(T^2) per utterance. Here: jitted prefill +
`lax.while_loop` decode over a static-size cache, batched with left-padded
prompts and per-row done flags. This is the headline RTF win.

Reference semantics preserved:
  * end-of-speech: KL(pred_frame_dist || N(1, e^1))/d < thres after step > 3
    (ref model.py:138-144). NOTE: with the sigma head (fixed std 0.5) the
    statistic has an analytic floor ln(e/0.5)+0.5^2/(2e^2)-0.5 ~= 1.21 > 0.5,
    so early stop never fires — matching the reference's own math; sigma
    decodes run to max_frames.
  * the LAST generated frame is discarded (ref model_sigmaVAE.py:147 stacks
    [:-1]): n_valid = steps_taken - 1.
  * sigma head stores the SAMPLED latent (model_sigmaVAE.py:133); the
    stableaudio/melvae heads store the distribution params
    (model.py:136 appends last_disp).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import LlasaConfig
from ..models.lm import llama, llasa


class GenResult(NamedTuple):
    means: jnp.ndarray        # (b, max_frames, d)
    log_scales: jnp.ndarray   # (b, max_frames, d) (log sigma for sigma head)
    samples: jnp.ndarray      # (b, max_frames, d) sampled latents
    n_frames: jnp.ndarray     # (b,) valid frame count (last frame discarded)
    end_kl: jnp.ndarray       # (b, max_frames) end-detector trace


def _head_step(cfg: LlasaConfig, params, hidden, rng, greedy: bool = False):
    """hidden (b,1,h) -> (mean, log_scale, sample) each (b,1,d).
    greedy=True emits the mean (deterministic decode / golden tests)."""
    dt = hidden.dtype
    out = llasa.distribution_head(params, hidden, dt)
    if cfg.head_variant == "sigma":
        mean = out
        logs = jnp.full_like(mean, jnp.log(cfg.sigma))
        std = cfg.sigma
    else:
        d = out.shape[-1] // 2
        mean, logs = out[..., :d], out[..., d:]
        std = jnp.exp(logs)
    if greedy:
        return mean, logs, mean
    sample = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean, logs, sample


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_frames", "cache_len", "greedy"),
)
def generate(
    params: dict,
    cfg: LlasaConfig,
    input_ids: jnp.ndarray,      # (b, tp) LEFT-padded prompt ids
    prompt_mask: jnp.ndarray,    # (b, tp) 1 = real token
    rng: jax.Array,
    max_frames: int = 200,
    cache_len: int = 0,
    end_kl_threshold: Optional[float] = None,
    prompt_latents: Optional[jnp.ndarray] = None,  # (b, tl, d) audio prompt
    prompt_latents_mask: Optional[jnp.ndarray] = None,  # (b, tl)
    embed_bias: Optional[jnp.ndarray] = None,  # (b, h) per-frame speaker cond
    greedy: bool = False,  # emit means (deterministic decode)
) -> GenResult:
    """Batched TTS/audio generation: prompt -> latent frames.

    Equivalent public behavior to `Llasa.infer` (ref model_sigmaVAE.py:106)
    plus batching. Prompts are left-padded so every row appends generated
    frames at the same cache slot; RoPE positions are per-row local.
    """
    lcfg = cfg.llama
    dt = jnp.dtype(lcfg.dtype)
    b, tp = input_ids.shape
    thres = cfg.end_kl_threshold if end_kl_threshold is None else end_kl_threshold

    tl = 0 if prompt_latents is None else prompt_latents.shape[1]
    cache_len = cache_len or (tp + tl + max_frames)
    # round up so the Pallas decode-attention kernel can block the cache
    # (extra slots are masked off; ops/pallas/decode_attention.py)
    cache_len = -(-cache_len // 128) * 128

    # ---- prefill ----
    text_embed = llama.embed_tokens(params["llama"], input_ids, lcfg)
    text_embed = text_embed * prompt_mask[..., None].astype(dt)
    if prompt_latents is not None:
        a_embed = llasa.audio_proj(params, prompt_latents.astype(dt), dt)
        if prompt_latents_mask is not None:
            a_embed = a_embed * prompt_latents_mask[..., None].astype(dt)
        embeds = jnp.concatenate([text_embed, a_embed], axis=1)
        pmask = jnp.concatenate(
            [prompt_mask.astype(bool),
             jnp.ones((b, tl), bool) if prompt_latents_mask is None
             else prompt_latents_mask.astype(bool)], axis=1)
    else:
        embeds = text_embed
        pmask = prompt_mask.astype(bool)

    if embed_bias is not None:
        # framewise speaker conditioning: added to EVERY position, incl.
        # generated frames (ref infer_framewise_cond.py:143,168)
        embeds = embeds + embed_bias.astype(dt)[:, None, :]

    t_pre = embeds.shape[1]
    # left-padded: local position = slot - n_pads
    n_pads = (t_pre - pmask.sum(axis=1)).astype(jnp.int32)  # (b,)
    positions = jnp.arange(t_pre)[None, :] - n_pads[:, None]
    positions = jnp.maximum(positions, 0)

    cache = llama.KVCache.zeros(lcfg, b, cache_len)  # dtype from cfg (int8 opt)
    valid = jnp.zeros((b, cache_len), bool).at[:, :t_pre].set(pmask)
    hidden, cache = llama.forward_with_cache(
        params["llama"], lcfg, embeds, cache,
        attention_mask=valid, positions=positions)
    last_hidden = hidden[:, -1:, :]

    d = cfg.latent_dim
    buf = dict(
        means=jnp.zeros((b, max_frames, d), dt),
        logs=jnp.zeros((b, max_frames, d), dt),
        samples=jnp.zeros((b, max_frames, d), dt),
        endkl=jnp.zeros((b, max_frames), jnp.float32),
    )
    state = dict(
        i=jnp.zeros((), jnp.int32),
        cache=cache,
        valid=valid,
        hidden=last_hidden,
        positions=positions[:, -1] + 1,  # next local position per row
        done=jnp.zeros((b,), bool),
        steps=jnp.zeros((b,), jnp.int32),  # frames emitted per row
        rng=rng,
        **buf,
    )

    def cond(s):
        return jnp.logical_and(s["i"] < max_frames, ~jnp.all(s["done"]))

    def body(s):
        i = s["i"]
        rng, krng = jax.random.split(s["rng"])
        mean, logs, sample = _head_step(cfg, params, s["hidden"], krng, greedy)

        kl = llasa.end_kl(cfg, mean, jnp.exp(logs.astype(jnp.float32)))[:, 0]
        live = ~s["done"]
        s["means"] = jax.lax.dynamic_update_slice(
            s["means"], jnp.where(live[:, None, None], mean, 0).astype(dt), (0, i, 0))
        s["logs"] = jax.lax.dynamic_update_slice(
            s["logs"], jnp.where(live[:, None, None], logs, 0).astype(dt), (0, i, 0))
        s["samples"] = jax.lax.dynamic_update_slice(
            s["samples"], jnp.where(live[:, None, None], sample, 0).astype(dt), (0, i, 0))
        s["endkl"] = jax.lax.dynamic_update_slice(
            s["endkl"], jnp.where(live, kl, 0.0)[:, None], (0, i))
        s["steps"] = s["steps"] + live.astype(jnp.int32)

        # stop test AFTER emitting (ref: frame appended before break,
        # model_sigmaVAE.py:133-142); gate fires once >= min_frames frames
        # are out (reference's `i > 3` with its min of 4, model.py:142)
        newly_done = jnp.logical_and(kl < thres, i >= cfg.min_frames)
        s["done"] = jnp.logical_or(s["done"], newly_done)

        # next input embed from the sampled latent (ref :144-145)
        a_embed = llasa.audio_proj(params, sample, dt)
        if embed_bias is not None:
            a_embed = a_embed + embed_bias.astype(dt)[:, None, :]
        slot = s["cache"].length
        s["valid"] = jax.lax.dynamic_update_slice(
            s["valid"], live[:, None], (0, slot))
        hidden, s["cache"] = llama.forward_with_cache(
            params["llama"], lcfg, a_embed, s["cache"],
            attention_mask=s["valid"], positions=s["positions"][:, None])
        s["hidden"] = hidden
        s["positions"] = s["positions"] + live.astype(jnp.int32)
        s["rng"] = rng
        s["i"] = i + 1
        return s

    state = jax.lax.while_loop(cond, body, state)

    # discard-last-frame semantics (ref model_sigmaVAE.py:147)
    n_frames = jnp.maximum(state["steps"] - 1, 0)
    return GenResult(
        means=state["means"],
        log_scales=state["logs"],
        samples=state["samples"],
        n_frames=n_frames,
        end_kl=state["endkl"],
    )
