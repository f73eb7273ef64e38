"""Oobleck VAE (stable-audio-open autoencoder) in JAX — codec A.

Reference: stable_audio_tools/models/autoencoders.py:39-191 (ResidualUnit /
EncoderBlock / DecoderBlock / OobleckEncoder / OobleckDecoder), wrapped as
AudioAutoencoder behind AutoencoderPretransform (pretransforms.py:28-91).

kalle-audio's local patch makes VAEBottleneck a passthrough
(bottleneck.py:85-107): `encode` returns the raw (B, 2d, T) mean||scale
stack; sampling happens in the caller via `vae_sample` (bottleneck.py:51-62,
scale used directly as stdev — see data/datasets.py). We reproduce exactly
that contract:
    encode(audio (B, 2, T))  -> (B, 2*latent, T/ratio) mean||scale
    decode(latents (B, latent, T')) -> (B, 2, T'*ratio), tanh-clipped

External tensors keep the reference's channel-first (B, C, T) layout;
compute is channels-last NWC inside (TPU lanes). Weight-norm is folded at
import. Inference is jitted per input-length bucket.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.conv import (
    conv1d,
    conv_transpose1d,
    fold_weight_norm,
    snake_beta,
    torch_conv_transpose_weight,
    torch_conv_weight,
)


@dataclasses.dataclass(frozen=True)
class OobleckConfig:
    """stable-audio-open-1.0 operating point by default
    (ref configs/twj.yaml:39-41 points at its model_config.json)."""

    io_channels: int = 2
    channels: int = 128
    latent_dim: int = 64           # decoder input dim
    encoder_out_dim: int = 128     # 2 * latent (mean||scale)
    c_mults: Tuple[int, ...] = (1, 2, 4, 8, 16)
    strides: Tuple[int, ...] = (2, 4, 4, 8, 8)
    use_snake: bool = True
    final_tanh: bool = True
    sample_rate: int = 44100
    scale: float = 1.0  # AutoencoderPretransform scale (pretransforms.py:33)

    @property
    def downsampling_ratio(self) -> int:
        return int(np.prod(self.strides))

    @staticmethod
    def from_model_config(cfg: Dict[str, Any]) -> "OobleckConfig":
        """Parse a stable_audio_tools model_config.json: either a top-level
        autoencoder or the `pretransform` of a diffusion model (the SAO-1.0
        layout kalle uses, ref twj_dataset.py:184-199)."""
        scale = 1.0
        if cfg.get("model_type") == "autoencoder":
            ae = cfg["model"]
        elif "pretransform" in cfg.get("model", {}):
            pre = cfg["model"]["pretransform"]
            scale = pre.get("scale", 1.0)
            ae = pre["config"]
        else:
            raise ValueError("no autoencoder config found")
        enc = ae["encoder"]["config"]
        dec = ae["decoder"]["config"]
        return OobleckConfig(
            io_channels=ae.get("io_channels", 2),
            channels=enc.get("channels", 128),
            latent_dim=dec.get("latent_dim", ae.get("latent_dim", 64)),
            encoder_out_dim=enc.get("latent_dim", 128),
            c_mults=tuple(enc.get("c_mults", (1, 2, 4, 8, 16))),
            strides=tuple(enc.get("strides", (2, 4, 4, 8, 8))),
            use_snake=enc.get("use_snake", True),
            final_tanh=dec.get("final_tanh", True),
            sample_rate=cfg.get("sample_rate", 44100),
            scale=scale,
        )


# ---------------------------------------------------------------------------
# Param construction
# ---------------------------------------------------------------------------

def _conv_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k)
    return {
        "w": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _act_init(ch, use_snake):
    if use_snake:
        return {"alpha": jnp.zeros((ch,)), "beta": jnp.zeros((ch,))}
    return {}


def _res_unit_init(key, cin, cout, use_snake):
    k1, k2 = jax.random.split(key)
    return {
        "act1": _act_init(cout, use_snake),
        "conv1": _conv_init(k1, 7, cin, cout),
        "act2": _act_init(cout, use_snake),
        "conv2": _conv_init(k2, 1, cout, cout),
    }


def init_encoder_params(cfg: OobleckConfig, key) -> dict:
    c_mults = (1,) + tuple(cfg.c_mults)
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    params: Dict[str, Any] = {
        "in_conv": _conv_init(keys[next(ki)], 7, cfg.io_channels,
                              c_mults[0] * cfg.channels),
        "blocks": [],
        "out_act": _act_init(c_mults[-1] * cfg.channels, cfg.use_snake),
        "out_conv": _conv_init(keys[next(ki)], 3, c_mults[-1] * cfg.channels,
                               cfg.encoder_out_dim),
    }
    for i in range(len(c_mults) - 1):
        cin, cout = c_mults[i] * cfg.channels, c_mults[i + 1] * cfg.channels
        s = cfg.strides[i]
        params["blocks"].append({
            "res": [_res_unit_init(keys[next(ki)], cin, cin, cfg.use_snake)
                    for _ in range(3)],
            "act": _act_init(cin, cfg.use_snake),
            "down": _conv_init(keys[next(ki)], 2 * s, cin, cout),
        })
    return params


def init_decoder_params(cfg: OobleckConfig, key) -> dict:
    c_mults = (1,) + tuple(cfg.c_mults)
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    params: Dict[str, Any] = {
        "in_conv": _conv_init(keys[next(ki)], 7, cfg.latent_dim,
                              c_mults[-1] * cfg.channels),
        "blocks": [],
        "out_act": _act_init(c_mults[0] * cfg.channels, cfg.use_snake),
        "out_conv": _conv_init(keys[next(ki)], 7, c_mults[0] * cfg.channels,
                               cfg.io_channels),
    }
    params["out_conv"].pop("b")  # final conv has bias=False (ref :188)
    for i in range(len(c_mults) - 1, 0, -1):
        cin, cout = c_mults[i] * cfg.channels, c_mults[i - 1] * cfg.channels
        s = cfg.strides[i - 1]
        k = 2 * s + s % 2
        params["blocks"].append({
            "act": _act_init(cin, cfg.use_snake),
            "up": _conv_init(keys[next(ki)], k, cin, cout),
            "res": [_res_unit_init(keys[next(ki)], cout, cout, cfg.use_snake)
                    for _ in range(3)],
        })
    return params


def init_params(cfg: OobleckConfig, key) -> dict:
    ke, kd = jax.random.split(key)
    return {"encoder": init_encoder_params(cfg, ke),
            "decoder": init_decoder_params(cfg, kd)}


# ---------------------------------------------------------------------------
# Forward (NWC internal)
# ---------------------------------------------------------------------------

def _act(x, p, use_snake):
    if use_snake:
        return snake_beta(x, p["alpha"], p["beta"])
    return jax.nn.elu(x)


def _res_unit(x, p, dilation, use_snake):
    res = x
    pad = (dilation * 6) // 2
    x = _act(x, p["act1"], use_snake)
    x = conv1d(x, p["conv1"]["w"], p["conv1"]["b"], padding=pad,
               dilation=dilation)
    x = _act(x, p["act2"], use_snake)
    x = conv1d(x, p["conv2"]["w"], p["conv2"]["b"])
    return x + res


def encode_nwc(params: dict, cfg: OobleckConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, io_ch) -> (B, T/ratio, 2*latent) mean||scale."""
    p = params["encoder"]
    x = conv1d(x, p["in_conv"]["w"], p["in_conv"]["b"], padding=3)
    for i, blk in enumerate(p["blocks"]):
        for j, d in enumerate((1, 3, 9)):
            x = _res_unit(x, blk["res"][j], d, cfg.use_snake)
        s = cfg.strides[i]
        x = _act(x, blk["act"], cfg.use_snake)
        x = conv1d(x, blk["down"]["w"], blk["down"]["b"], stride=s,
                   padding=math.ceil(s / 2))
    x = _act(x, p["out_act"], cfg.use_snake)
    x = conv1d(x, p["out_conv"]["w"], p["out_conv"]["b"], padding=1)
    return x


def decode_nwc(params: dict, cfg: OobleckConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: (B, T', latent) -> (B, T'*ratio, io_ch)."""
    p = params["decoder"]
    x = conv1d(z, p["in_conv"]["w"], p["in_conv"]["b"], padding=3)
    rev_strides = list(cfg.strides)[::-1]
    for i, blk in enumerate(p["blocks"]):
        s = rev_strides[i]
        x = _act(x, blk["act"], cfg.use_snake)
        x = conv_transpose1d(x, blk["up"]["w"], blk["up"]["b"], stride=s,
                             padding=math.ceil(s / 2))
        for j, d in enumerate((1, 3, 9)):
            x = _res_unit(x, blk["res"][j], d, cfg.use_snake)
    x = _act(x, p["out_act"], cfg.use_snake)
    x = conv1d(x, p["out_conv"]["w"], None, padding=3)
    if cfg.final_tanh:
        x = jnp.tanh(x)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: dict, cfg: OobleckConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """pretransform.encode equivalent: audio (B, io_ch, T) ->
    (B, 2*latent, T/ratio) / scale (ref pretransforms.py:50-60)."""
    x = jnp.transpose(audio, (0, 2, 1))
    z = encode_nwc(params, cfg, x)
    return jnp.transpose(z, (0, 2, 1)) / cfg.scale


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode(params: dict, cfg: OobleckConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """pretransform.decode equivalent: (B, latent, T') * scale ->
    audio (B, io_ch, T'*ratio) (ref pretransforms.py:62-74)."""
    z = jnp.transpose(latents, (0, 2, 1)) * cfg.scale
    y = decode_nwc(params, cfg, z)
    return jnp.transpose(y, (0, 2, 1))


# ---------------------------------------------------------------------------
# Torch checkpoint import
# ---------------------------------------------------------------------------

def _import_conv(sd, prefix) -> dict:
    if prefix + ".weight_v" in sd:
        w = fold_weight_norm(np.asarray(sd[prefix + ".weight_v"], np.float32),
                             np.asarray(sd[prefix + ".weight_g"], np.float32))
    elif prefix + ".parametrizations.weight.original1" in sd:
        w = fold_weight_norm(
            np.asarray(sd[prefix + ".parametrizations.weight.original1"], np.float32),
            np.asarray(sd[prefix + ".parametrizations.weight.original0"], np.float32))
    else:
        w = np.asarray(sd[prefix + ".weight"], np.float32)
    out = {"w": torch_conv_weight(w)}
    if prefix + ".bias" in sd:
        out["b"] = np.asarray(sd[prefix + ".bias"], np.float32)
    return out


def _import_conv_t(sd, prefix) -> dict:
    # torch weight_norm defaults to dim=0 for ConvTranspose1d too
    # (keeps the INPUT-channel axis of its (I, O, K) weight)
    if prefix + ".weight_v" in sd:
        w = fold_weight_norm(np.asarray(sd[prefix + ".weight_v"], np.float32),
                             np.asarray(sd[prefix + ".weight_g"], np.float32))
    elif prefix + ".parametrizations.weight.original1" in sd:
        w = fold_weight_norm(
            np.asarray(sd[prefix + ".parametrizations.weight.original1"], np.float32),
            np.asarray(sd[prefix + ".parametrizations.weight.original0"], np.float32))
    else:
        w = np.asarray(sd[prefix + ".weight"], np.float32)
    out = {"w": torch_conv_transpose_weight(w)}
    if prefix + ".bias" in sd:
        out["b"] = np.asarray(sd[prefix + ".bias"], np.float32)
    return out


def _import_act(sd, prefix, use_snake) -> dict:
    if not use_snake:
        return {}
    return {"alpha": np.asarray(sd[prefix + ".alpha"], np.float32),
            "beta": np.asarray(sd[prefix + ".beta"], np.float32)}


def _import_res_unit(sd, prefix, use_snake) -> dict:
    return {
        "act1": _import_act(sd, f"{prefix}.layers.0", use_snake),
        "conv1": _import_conv(sd, f"{prefix}.layers.1"),
        "act2": _import_act(sd, f"{prefix}.layers.2", use_snake),
        "conv2": _import_conv(sd, f"{prefix}.layers.3"),
    }


def params_from_state_dict(sd: Dict[str, Any], cfg: OobleckConfig,
                           prefix: str = "") -> dict:
    """Import an AudioAutoencoder state_dict (keys encoder.layers.* /
    decoder.layers.*). `prefix` handles nesting, e.g.
    'pretransform.model.' inside the SAO-1.0 diffusion checkpoint."""
    g = lambda s: prefix + s
    n_blocks = len(cfg.c_mults)
    use_snake = cfg.use_snake

    enc: Dict[str, Any] = {
        "in_conv": _import_conv(sd, g("encoder.layers.0")),
        "blocks": [],
        "out_act": _import_act(sd, g(f"encoder.layers.{n_blocks + 1}"), use_snake),
        "out_conv": _import_conv(sd, g(f"encoder.layers.{n_blocks + 2}")),
    }
    for i in range(n_blocks):
        base = g(f"encoder.layers.{i + 1}.layers")
        enc["blocks"].append({
            "res": [_import_res_unit(sd, f"{base}.{j}", use_snake)
                    for j in range(3)],
            "act": _import_act(sd, f"{base}.3", use_snake),
            "down": _import_conv(sd, f"{base}.4"),
        })

    dec: Dict[str, Any] = {
        "in_conv": _import_conv(sd, g("decoder.layers.0")),
        "blocks": [],
        "out_act": _import_act(sd, g(f"decoder.layers.{n_blocks + 1}"), use_snake),
        "out_conv": _import_conv(sd, g(f"decoder.layers.{n_blocks + 2}")),
    }
    dec["out_conv"].pop("b", None)
    for i in range(n_blocks):
        base = g(f"decoder.layers.{i + 1}.layers")
        dec["blocks"].append({
            "act": _import_act(sd, f"{base}.0", use_snake),
            "up": _import_conv_t(sd, f"{base}.1"),
            "res": [_import_res_unit(sd, f"{base}.{j + 2}", use_snake)
                    for j in range(3)],
        })
    return {"encoder": enc, "decoder": dec}


def load_pretrained(config_path: str, ckpt_path: str):
    """End-to-end loader matching the reference init
    (ref twj_dataset.py:175-199): model_config.json + safetensors/pt."""
    from ...models.lm.convert import load_torch_checkpoint

    with open(config_path) as f:
        cfg = OobleckConfig.from_model_config(json.load(f))
    sd = load_torch_checkpoint(ckpt_path)
    prefix = ""
    if any(k.startswith("pretransform.model.") for k in sd):
        prefix = "pretransform.model."
    params = params_from_state_dict(sd, cfg, prefix=prefix)
    return cfg, jax.tree.map(jnp.asarray, params)
