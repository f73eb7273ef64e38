"""Streaming (text/audio interleave) inference with KV cache.

Reference: infer_backup/infer_stream.py — the audio stream runs
`delay_frames` behind the text stream; each step's input embedding is
text_embed[i] + audio_embed[i]; a sampled global-speaker-VAE frame is
prepended; generation starts after the warmup prefix and stops on the
end-KL test (:146-207). Warmup latents come from zero/prompt audio pushed
through the codec encoder (:362-409); prompts are padded to a fixed length
with the pad token (:447).

TPU-first: jitted prefill + lax.while_loop with a KV cache (the reference
re-forwards the full prefix per step).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import LlasaConfig
from ..models.lm import llama, llasa
from ..models.lm.losses import split_mean_scale_btd


class StreamResult(NamedTuple):
    means: jnp.ndarray       # (b, max_steps, d)
    log_scales: jnp.ndarray
    samples: jnp.ndarray
    n_frames: jnp.ndarray    # (b,)


def _lin(params, name, x, dt):
    p = params[name]
    return x.astype(dt) @ p["w"].astype(dt) + p["b"].astype(dt)


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def stream_generate(
    params: dict,
    cfg: LlasaConfig,
    input_ids: jnp.ndarray,       # (b, T_text) pad-token padded
    prompt_latents: jnp.ndarray,  # (b, T_warm, d) delay-warmup latents
    speaker_cond: jnp.ndarray,    # (b, h) sampled speaker frame
    rng: jax.Array,
    max_steps: int,
    end_kl_threshold: Optional[float] = None,
) -> StreamResult:
    """Variant-head (Linear 2d) streaming decode. Step i consumes
    text_embed[i] + audio_embed(sample_{i-1}) (infer_stream.py:178-200)."""
    lcfg = cfg.llama
    dt = jnp.dtype(lcfg.dtype)
    b, t_text = input_ids.shape
    t_warm = prompt_latents.shape[1]
    thres = cfg.end_kl_threshold if end_kl_threshold is None else end_kl_threshold

    text_embed = llama.embed_tokens(params["llama"], input_ids, lcfg)
    warm_audio = _lin(params, "audio_linear", prompt_latents, dt)
    prefix = text_embed[:, :t_warm] + warm_audio
    prefix = jnp.concatenate([speaker_cond.astype(dt)[:, None, :], prefix], axis=1)

    # 128-aligned so the Pallas decode-attention kernel can engage
    cache_len = -(-(1 + t_text + max_steps + 1) // 128) * 128
    cache = llama.KVCache.zeros(lcfg, b, cache_len)  # dtype from cfg (int8 opt)
    hidden, cache = llama.forward_with_cache(params["llama"], lcfg, prefix, cache)
    last = hidden[:, -1:, :]

    d = cfg.latent_dim
    state = dict(
        i=jnp.zeros((), jnp.int32),
        cache=cache,
        hidden=last,
        done=jnp.zeros((b,), bool),
        steps=jnp.zeros((b,), jnp.int32),
        rng=rng,
        means=jnp.zeros((b, max_steps, d), dt),
        logs=jnp.zeros((b, max_steps, d), dt),
        samples=jnp.zeros((b, max_steps, d), dt),
    )

    def cond(s):
        return jnp.logical_and(s["i"] < max_steps, ~jnp.all(s["done"]))

    def body(s):
        i = s["i"]
        rng, krng = jax.random.split(s["rng"])
        out = _lin(params, "distribution_linear", s["hidden"], dt)
        mean, logs = split_mean_scale_btd(out)
        sample = mean + jnp.exp(logs) * jax.random.normal(krng, mean.shape, dt)

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

        # next embed = text[t_warm + 1 + i] + audio_embed(sample)
        txt_idx = jnp.minimum(t_warm + 1 + i, t_text - 1)
        txt = jax.lax.dynamic_slice(text_embed, (0, txt_idx, 0),
                                    (b, 1, text_embed.shape[-1]))
        nxt = txt + _lin(params, "audio_linear", sample, dt)
        hidden, s["cache"] = llama.forward_with_cache(
            params["llama"], lcfg, nxt, s["cache"])
        s["hidden"] = hidden
        s["rng"] = rng
        s["i"] = i + 1
        return s

    state = jax.lax.while_loop(cond, body, state)
    return StreamResult(
        means=state["means"], log_scales=state["logs"],
        samples=state["samples"],
        n_frames=jnp.maximum(state["steps"] - 1, 0))


def warmup_latents_from_silence(codec_encode_fn, delay_frames: int,
                                sample_rate: int, frame_hz: float,
                                batch: int = 1):
    """Zero-audio delay warmup (infer_stream.py:362-380): encode
    delay_frames * (sr / frame_hz) silent samples and sample latents."""
    import numpy as np

    n = int(round(delay_frames * sample_rate / frame_hz))
    wav = jnp.zeros((batch, 1, n), jnp.float32)
    return codec_encode_fn(wav)


def sample_speaker_cond(params: dict, rng: jax.Array, h: int,
                        spk_embedding: Optional[jnp.ndarray] = None):
    """Speaker VAE sampling for inference (infer_stream.py:161-169):
    with a prompt -> randn * exp(logs) (NOTE: the reference omits adding the
    mean at inference, :168 — preserved); without -> N(0,1)."""
    if spk_embedding is None:
        return jax.random.normal(rng, (1, h))
    pd = params["speaker_cond_disp_linear"]
    disp = spk_embedding @ pd["w"] + pd["b"]
    mean, logs = disp[..., :h], disp[..., h:]
    return jax.random.normal(rng, mean.shape) * jnp.exp(logs)
