"""MRTE — multi-reference timbre encoder, in JAX.

Reference: backup/mrte.py — residual conv stacks over mel (ConvNetDouble
with a strided middle layer), cross-attention of phone embeddings over the
mel context, returning (global mel conditioning, per-token conditioning)
(mrte.py:291-302).

Inference-form (dropout off). Layout: mel (B, n_mels, T) channel-first at
the boundary like the reference; phone_x (B, T_p, hidden).
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
class MRTEConfig:
    mel_bins: int = 80
    hidden_size: int = 2048
    kernel_size: int = 3
    mel_stride: int = 16
    n_layers: int = 5
    n_stacks: int = 5
    n_blocks: int = 2
    n_heads: int = 1
    activation: str = "relu"

    @staticmethod
    def tiny() -> "MRTEConfig":
        return MRTEConfig(mel_bins=8, hidden_size=16, mel_stride=4,
                          n_layers=2, n_stacks=2, n_blocks=1)


def _conv_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k)
    return {"w": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def _lin_init(key, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    return {"w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def _ln_init(ch):
    return {"scale": jnp.ones((ch,)), "shift": jnp.zeros((ch,))}


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["shift"]


def init_params(cfg: MRTEConfig, key) -> dict:
    keys = iter(jax.random.split(key, 2048))
    nk = lambda: next(keys)
    h = cfg.hidden_size

    def conv_block():
        return {"conv": _conv_init(nk(), cfg.kernel_size, h, h),
                "norm": _ln_init(h)}

    def res_stack():
        return [[conv_block() for _ in range(cfg.n_blocks)]
                for _ in range(cfg.n_stacks)]

    layers = []
    for _ in range(cfg.n_layers):
        layers.append({"stack1": res_stack(), "stack2": res_stack()})

    return {
        "first": _conv_init(nk(), cfg.kernel_size, cfg.mel_bins, h),
        "middle": _conv_init(nk(), cfg.mel_stride + 1, h, h),
        "layers": layers,
        "last": _conv_init(nk(), cfg.kernel_size, h, h),
        "wq": _lin_init(nk(), h, h),
        "wk": _lin_init(nk(), h, h),
        "wv": _lin_init(nk(), h, h),
        "out_proj": _lin_init(nk(), h, h),
        "norm": _ln_init(h),
        "adapter_cond_emb": _lin_init(nk(), h, 2048),
    }


def _act(x, cfg):
    return jax.nn.relu(x) if cfg.activation == "relu" else jax.nn.gelu(x)


def _conv_block(x, p, cfg):
    """activation -> conv -> layernorm (mrte.py:25-33), NWC."""
    h = _act(x, cfg)
    h = conv1d(h, p["conv"]["w"], p["conv"]["b"],
               padding=(cfg.kernel_size - 1) // 2)
    return _ln(h, p["norm"])


def _res_stack(x, stack, cfg):
    for blocks in stack:
        h = x
        for b in blocks:
            h = _conv_block(h, b, cfg)
        x = x + h
    return x


def _mel_encoder(p, cfg, mel_nwc):
    x = conv1d(mel_nwc, p["first"]["w"], p["first"]["b"],
               padding=(cfg.kernel_size - 1) // 2)
    outs = None
    for layer in p["layers"]:
        h = _res_stack(x, layer["stack1"], cfg)
        h = conv1d(h, p["middle"]["w"], p["middle"]["b"],
                   stride=cfg.mel_stride, padding=cfg.mel_stride // 2)
        h = _res_stack(h, layer["stack2"], cfg)
        outs = h if outs is None else outs + h
    return conv1d(outs, p["last"]["w"], p["last"]["b"],
                  padding=(cfg.kernel_size - 1) // 2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params, cfg: MRTEConfig, mel: jnp.ndarray, phone_x: jnp.ndarray):
    """mel (B, mel_bins, T), phone_x (B, T_p, hidden) ->
    (mel_context (B, 2048), tc_latent (B, T_p, hidden))."""
    p = params
    mel_ctx = _mel_encoder(p, cfg, jnp.transpose(mel, (0, 2, 1)))  # (B,T',h)

    q = phone_x @ p["wq"]["w"] + p["wq"]["b"]
    k = mel_ctx @ p["wk"]["w"] + p["wk"]["b"]
    v = mel_ctx @ p["wv"]["w"] + p["wv"]["b"]
    b, tq, h = q.shape
    nh = cfg.n_heads
    hd = h // nh
    q = q.reshape(b, tq, nh, hd)
    k = k.reshape(b, -1, nh, hd)
    v = v.reshape(b, -1, nh, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    att = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", att.astype(v.dtype), v).reshape(b, tq, h)
    tc = o @ p["out_proj"]["w"] + p["out_proj"]["b"]
    tc = jax.nn.relu(_ln(tc, p["norm"]))

    mean_ctx = mel_ctx.mean(axis=1)
    mel_cond = mean_ctx @ p["adapter_cond_emb"]["w"] + p["adapter_cond_emb"]["b"]
    return mel_cond, tc


def params_from_state_dict(sd: Dict[str, Any], cfg: MRTEConfig) -> dict:
    """Import the torch MRTE state_dict (backup/mrte.py naming)."""
    def conv(prefix):
        return {"w": np.transpose(np.asarray(sd[prefix + ".weight"], np.float32),
                                  (2, 1, 0)),
                "b": np.asarray(sd[prefix + ".bias"], np.float32)}

    def lin(prefix):
        return {"w": np.asarray(sd[prefix + ".weight"], np.float32).T,
                "b": np.asarray(sd[prefix + ".bias"], np.float32)}

    def ln(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
                "shift": np.asarray(sd[prefix + ".bias"], np.float32)}

    layers = []
    for i in range(cfg.n_layers):
        base = f"mel_encoder.layers.{i}"

        def stack(which):
            out = []
            for s in range(cfg.n_stacks):
                blocks = []
                for b in range(cfg.n_blocks):
                    bb = f"{base}.{which}.conv_stacks.{s}.blocks.{b}"
                    blocks.append({"conv": conv(bb + ".conv"),
                                   "norm": ln(bb + ".norm")})
                out.append(blocks)
            return out

        layers.append({"stack1": stack("conv_stack1"),
                       "stack2": stack("conv_stack2")})

    return {
        "first": conv("mel_encoder.first_layer"),
        "middle": conv("mel_encoder_middle_layer"),
        "layers": layers,
        "last": conv("mel_encoder.last_layer"),
        "wq": lin("mha.w_q"),
        "wk": lin("mha.w_k"),
        "wv": lin("mha.w_v"),
        "out_proj": lin("mha.out_proj.0"),
        "norm": ln("norm"),
        "adapter_cond_emb": lin("adapter_cond_emb"),
    }
