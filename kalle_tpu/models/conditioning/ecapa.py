"""ECAPA-TDNN speaker encoder in JAX.

Reference: backup/ecapa_tdnn.py — SE-Res2Net TDNN over 80-mel frames ->
attentive stats pooling -> utterance embedding (used as the speaker
conditioning frame, ref backup/model copy.py:66-81, and by the global
speaker VAE, infer_backup/infer_stream.py:93-104).

Notes:
  * BatchNorm1d runs in INFERENCE form (running stats folded into
    scale/shift). Training speaker encoders is out of scope for parity —
    the reference always loads a pretrained frozen encoder.
  * Layout: input (B, T, n_mels) like the reference's call sites
    (ecapa_tdnn.py:169 transposes to channel-first internally; we stay NWC).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.conv import conv1d


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    in_channels: int = 80
    channels: int = 512
    embd_dim: int = 2048
    scale: int = 8
    attn_bottleneck: int = 128
    pooled_channels: int = 1536

    @staticmethod
    def tiny() -> "EcapaConfig":
        return EcapaConfig(in_channels=8, channels=16, embd_dim=12, scale=4,
                           attn_bottleneck=8, pooled_channels=24)


def _conv_init(key, k, cin, cout, bias=True):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k)
    p = {"w": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def _bn_init(ch):
    return {"scale": jnp.ones((ch,)), "shift": jnp.zeros((ch,)),
            "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["shift"]


def _lin_init(key, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    return {"w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def init_params(cfg: EcapaConfig, key) -> dict:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    ch, sc = cfg.channels, cfg.scale
    width = ch // sc

    def se_res2(k, d, pad):
        return {
            "conv1": _conv_init(nk(), 1, ch, ch, bias=False),
            "bn1": _bn_init(ch),
            "res2_convs": [_conv_init(nk(), k, width, width, bias=False)
                           for _ in range(sc - 1)],
            "res2_bns": [_bn_init(width) for _ in range(sc - 1)],
            "conv2": _conv_init(nk(), 1, ch, ch, bias=False),
            "bn2": _bn_init(ch),
            "se1": _lin_init(nk(), ch, ch // 2),
            "se2": _lin_init(nk(), ch // 2, ch),
        }

    return {
        "layer1": {"conv": _conv_init(nk(), 5, cfg.in_channels, ch, bias=False),
                   "bn": _bn_init(ch)},
        "layer2": se_res2(3, 2, 2),
        "layer3": se_res2(3, 3, 3),
        "layer4": se_res2(3, 4, 4),
        "conv": _conv_init(nk(), 1, 3 * ch, cfg.pooled_channels),
        "attn1": _conv_init(nk(), 1, cfg.pooled_channels, cfg.attn_bottleneck),
        "attn2": _conv_init(nk(), 1, cfg.attn_bottleneck, cfg.pooled_channels),
        "bn1": _bn_init(2 * cfg.pooled_channels),
        "linear": _lin_init(nk(), 2 * cfg.pooled_channels, cfg.embd_dim),
        "bn2": _bn_init(cfg.embd_dim),
    }


def _se_res2_block(x, p, cfg, k, dilation, padding):
    """Conv1dReluBn -> Res2Conv1dReluBn -> Conv1dReluBn -> SE_Connect
    (ecapa_tdnn.py:116-122). Order inside: conv -> relu -> bn (:71-73)."""
    sc = cfg.scale
    width = cfg.channels // sc

    h = conv1d(x, p["conv1"]["w"], None)
    h = _bn(jax.nn.relu(h), p["bn1"])

    spx = jnp.split(h, sc, axis=-1)
    outs = []
    sp = None
    for i in range(sc - 1):
        sp = spx[i] if i == 0 else sp + spx[i]
        sp = conv1d(sp, p["res2_convs"][i]["w"], None, padding=padding,
                    dilation=dilation)
        sp = _bn(jax.nn.relu(sp), p["res2_bns"][i])
        outs.append(sp)
    outs.append(spx[sc - 1])
    h = jnp.concatenate(outs, axis=-1)

    h = conv1d(h, p["conv2"]["w"], None)
    h = _bn(jax.nn.relu(h), p["bn2"])

    # SE
    s = h.mean(axis=1)  # (B, C)
    s = jax.nn.relu(s @ p["se1"]["w"] + p["se1"]["b"])
    s = jax.nn.sigmoid(s @ p["se2"]["w"] + p["se2"]["b"])
    return h * s[:, None, :]


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params, cfg: EcapaConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, n_mels) -> embedding (B, embd_dim)."""
    p = params
    x = conv1d(mel, p["layer1"]["conv"]["w"], None, padding=2)
    out1 = _bn(jax.nn.relu(x), p["layer1"]["bn"])
    out2 = _se_res2_block(out1, p["layer2"], cfg, 3, 2, 2) + out1
    out3 = _se_res2_block(out1 + out2, p["layer3"], cfg, 3, 3, 3) + out1 + out2
    out4 = (_se_res2_block(out1 + out2 + out3, p["layer4"], cfg, 3, 4, 4)
            + out1 + out2 + out3)

    h = jnp.concatenate([out2, out3, out4], axis=-1)
    h = jax.nn.relu(conv1d(h, p["conv"]["w"], p["conv"]["b"]))

    # attentive stats pooling (ecapa_tdnn.py:128-142)
    a = jnp.tanh(conv1d(h, p["attn1"]["w"], p["attn1"]["b"]))
    a = jax.nn.softmax(conv1d(a, p["attn2"]["w"], p["attn2"]["b"]), axis=1)
    mean = jnp.sum(a * h, axis=1)
    var = jnp.sum(a * h * h, axis=1) - mean * mean
    std = jnp.sqrt(jnp.clip(var, 1e-9, None))
    pooled = jnp.concatenate([mean, std], axis=-1)

    h = _bn(pooled, p["bn1"])
    h = h @ p["linear"]["w"] + p["linear"]["b"]
    return _bn(h, p["bn2"])


def params_from_state_dict(sd: Dict[str, Any], cfg: EcapaConfig) -> dict:
    """Import a torch ECAPA_TDNN state_dict (backup/ecapa_tdnn.py naming),
    folding BatchNorm running stats."""
    def conv(prefix, bias=True):
        out = {"w": np.transpose(np.asarray(sd[prefix + ".weight"], np.float32),
                                 (2, 1, 0))}
        if bias and prefix + ".bias" in sd:
            out["b"] = np.asarray(sd[prefix + ".bias"], np.float32)
        return out

    def bn(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
                "shift": np.asarray(sd[prefix + ".bias"], np.float32),
                "mean": np.asarray(sd[prefix + ".running_mean"], np.float32),
                "var": np.asarray(sd[prefix + ".running_var"], np.float32)}

    def lin(prefix):
        return {"w": np.asarray(sd[prefix + ".weight"], np.float32).T,
                "b": np.asarray(sd[prefix + ".bias"], np.float32)}

    def se_res2(base):
        n = cfg.scale - 1
        return {
            "conv1": conv(f"{base}.0.conv", bias=False),
            "bn1": bn(f"{base}.0.bn"),
            "res2_convs": [conv(f"{base}.1.convs.{i}", bias=False)
                           for i in range(n)],
            "res2_bns": [bn(f"{base}.1.bns.{i}") for i in range(n)],
            "conv2": conv(f"{base}.2.conv", bias=False),
            "bn2": bn(f"{base}.2.bn"),
            "se1": lin(f"{base}.3.linear1"),
            "se2": lin(f"{base}.3.linear2"),
        }

    return {
        "layer1": {"conv": conv("layer1.conv", bias=False), "bn": bn("layer1.bn")},
        "layer2": se_res2("layer2"),
        "layer3": se_res2("layer3"),
        "layer4": se_res2("layer4"),
        "conv": conv("conv"),
        "attn1": conv("pooling.linear1"),
        "attn2": conv("pooling.linear2"),
        "bn1": bn("bn1"),
        "linear": lin("linear"),
        "bn2": bn("bn2"),
    }
