"""SigmaVAE acoustic codec — codec C (VibeVoice-compatible operating point).

The reference imports the external VibeVoice-1.5B acoustic tokenizer via a
sys.path hack (ref train_offline.py:32-37,184-190; infer_vibevoice.py:268-288)
— the package is NOT in the snapshot, so this is an original TPU-native
design at the same operating point:

  * 24 kHz mono, 64-dim continuous latents at 7.5 Hz (3200x downsampling:
    strides 4*4*5*5*8; latent shape (1, 76, 64) for ~10 s clips, ref
    twj_dataset_offline.py:266,284)
  * sigma-VAE: the encoder emits MEANS only; the variance is fixed
    globally (sigma = 0.5, ref model_sigmaVAE.py:150-151) and noising
    happens in the consumer (`sample`), not the codec.
  * decode() accepts (B, T, 64) or (B, 64, T) — the reference's own call
    sites pass both (infer_vibevoice.py:342 vs :363) and the comment
    `latents.shape[1] == self.config.vae_dim` shows the original
    auto-detects orientation. Output (B, 1, T*3200), matching
    `generator.decode` (SURVEY.md §2.2).

Architecture (TPU-first, not a translation): stages of strided causal
convs with ConvNeXt-style residual blocks — depthwise causal conv (k=7)
feeding pointwise GEGLU MLPs, so the FLOPs live in MXU matmuls; RMS-norm
for stability; mirror decoder with causal transposed convs. By default the
depthwise conv is folded into the up projection as one dense causal conv
(`gemm_blocks`, exact reparameterization — see SigmaVAEConfig).

Weight import/export for a VibeVoice-shaped torch state dict is at the
bottom of this file (params_from_torch_state_dict / state_dict_from_params,
schema documented there); tools/train_codec_demo.py demonstrates trained
copysyn quality without external weights.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.conv import conv1d, conv_transpose1d_causal


@dataclasses.dataclass(frozen=True)
class SigmaVAEConfig:
    latent_dim: int = 64
    sample_rate: int = 24000
    strides: Tuple[int, ...] = (4, 4, 5, 5, 8)   # product = 3200 -> 7.5 Hz
    channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    blocks_per_stage: int = 2
    mlp_ratio: int = 2
    kernel: int = 7
    sigma: float = 0.5
    # route residual blocks through the fused Pallas kernel (TPU + bf16
    # only; keeps norm->dwconv->GEGLU->residual in VMEM). Measured on v5e
    # batch-32 decode: bf16 62.0 ms vs 65.6 ms XLA (+6%), f32 206 ms vs
    # 132 ms (slower) -> the call site gates on dtype.
    fused_blocks: bool = True
    # GEMM block formulation: fold the depthwise conv INTO the GEGLU up
    # projection as one dense k-tap conv (W_eff[j] = diag(dw[j]) @ W_up,
    # b_eff = b_up + b_dw @ W_up) — exactly equivalent math, giving the MXU
    # one GEMM with contraction k*C instead of a depthwise pass + narrow-K
    # matmul. MEASURED SLOWER on v5e (batch-32 decode bf16: 98 ms vs 66 ms
    # per 320 s audio): XLA's native depthwise+pointwise lowering already
    # wins, so this stays opt-in; kept for architectures where it flips.
    gemm_blocks: bool = False

    @property
    def hop(self) -> int:
        return int(np.prod(self.strides))

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop

    @staticmethod
    def tiny() -> "SigmaVAEConfig":
        return SigmaVAEConfig(latent_dim=8, strides=(2, 4),
                              channels=(4, 8), blocks_per_stage=1)


def _rms_norm(x, scale, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def _conv_init(key, k, cin, cout, groups=1):
    kw, kb = jax.random.split(key)
    fan_in = (cin // groups) * k
    bound = 1.0 / math.sqrt(fan_in)
    return {"w": jax.random.uniform(kw, (k, cin // groups, cout), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def _block_init(key, ch, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    hid = cfg.mlp_ratio * ch
    return {
        "norm": jnp.ones((ch,)),
        "dw": _conv_init(k1, cfg.kernel, ch, ch, groups=ch),
        "up": _conv_init(k2, 1, ch, 2 * hid),   # GEGLU: value + gate
        "down": _conv_init(k3, 1, hid, ch),
    }


def init_params(cfg: SigmaVAEConfig, key) -> dict:
    keys = iter(jax.random.split(key, 1024))
    nk = lambda: next(keys)
    chs = cfg.channels

    enc: Dict[str, Any] = {"pre": _conv_init(nk(), cfg.kernel, 1, chs[0]),
                           "stages": [],
                           "head": _conv_init(nk(), 1, chs[-1], cfg.latent_dim)}
    for i, s in enumerate(cfg.strides):
        cin = chs[i]
        cout = chs[min(i + 1, len(chs) - 1)] if i + 1 < len(chs) else chs[-1]
        cout = chs[i + 1] if i + 1 < len(chs) else chs[-1]
        enc["stages"].append({
            "down": _conv_init(nk(), 2 * s, cin, cout),
            "blocks": [_block_init(nk(), cout, cfg)
                       for _ in range(cfg.blocks_per_stage)],
        })

    dec: Dict[str, Any] = {"pre": _conv_init(nk(), 1, cfg.latent_dim, chs[-1]),
                           "stages": [],
                           "post_norm": jnp.ones((chs[0],)),
                           "post": _conv_init(nk(), cfg.kernel, chs[0], 1)}
    rev = list(range(len(cfg.strides)))[::-1]
    for i in rev:
        cin = chs[i + 1] if i + 1 < len(chs) else chs[-1]
        cout = chs[i]
        s = cfg.strides[i]
        dec["stages"].append({
            "blocks": [_block_init(nk(), cin, cfg)
                       for _ in range(cfg.blocks_per_stage)],
            "up": _conv_init(nk(), 2 * s, cin, cout),
        })
    return {"encoder": enc, "decoder": dec}


def _causal_dw(x, p, k):
    # causal left padding via the conv's own padding arg — a jnp.pad copy
    # costs a full tensor round-trip at the full-rate stages
    return conv1d(x, p["w"], p["b"], groups=x.shape[-1], padding=(k - 1, 0))


def _block(x, p, cfg):
    if (cfg.fused_blocks and cfg.kernel == 7
            and x.dtype == jnp.bfloat16  # f32 measured slower (see config)
            and jax.default_backend() != "cpu"):
        from ...ops.pallas.convnext_block import fused_convnext_block

        T = x.shape[1]
        blk = min(512, T)
        pad = (-T) % blk
        if pad:  # causal: trailing zero-pad never leaks backward
            x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        else:
            x_p = x
        y = fused_convnext_block(x_p, p["norm"], p["dw"]["w"], p["dw"]["b"],
                                 p["up"]["w"], p["up"]["b"],
                                 p["down"]["w"], p["down"]["b"], block_t=blk)
        return y[:, :T, :]
    h = _rms_norm(x, p["norm"])
    if cfg.gemm_blocks:
        # dw (k, 1, C) folded into up (1, C, 2hid): one dense causal conv
        # with kernel (k, C, 2hid) — same math, MXU-shaped contraction
        k = cfg.kernel
        w_eff = p["dw"]["w"].reshape(k, -1, 1) * p["up"]["w"][0][None]
        b_eff = p["up"]["b"] + p["dw"]["b"] @ p["up"]["w"][0]
        h = conv1d(h, w_eff, b_eff, padding=(k - 1, 0))  # causal
    else:
        h = _causal_dw(h, p["dw"], cfg.kernel)
        h = conv1d(h, p["up"]["w"], p["up"]["b"])
    v, g = jnp.split(h, 2, axis=-1)
    h = v * jax.nn.gelu(g, approximate=True)
    h = conv1d(h, p["down"]["w"], p["down"]["b"])
    return x + h


def _encode_nwc(params, cfg, x):
    p = params["encoder"]
    x = conv1d(x, p["pre"]["w"], p["pre"]["b"],
               padding=(cfg.kernel - 1, 0))
    for i, (st, s) in enumerate(zip(p["stages"], cfg.strides)):
        # causal strided downsample: left-pad so frame t sees only the past
        x = conv1d(x, st["down"]["w"], st["down"]["b"], stride=s,
                   padding=(2 * s - s, 0))
        for b in st["blocks"]:
            x = _block(x, b, cfg)
    return conv1d(x, p["head"]["w"], p["head"]["b"])


def _decode_nwc(params, cfg, z):
    p = params["decoder"]
    x = conv1d(z, p["pre"]["w"], p["pre"]["b"])
    rev_strides = list(cfg.strides)[::-1]
    for st, s in zip(p["stages"], rev_strides):
        for b in st["blocks"]:
            x = _block(x, b, cfg)
        # causal transposed conv, tail trimmed inside the conv's padding
        # (a slice would copy the full upsampled tensor)
        x = conv_transpose1d_causal(x, st["up"]["w"], st["up"]["b"],
                                    stride=s)
    x = _rms_norm(x, p["post_norm"])
    x = conv1d(x, p["post"]["w"], p["post"]["b"],
               padding=(cfg.kernel - 1, 0))
    return jnp.tanh(x)


def _orient_btd(latents: jnp.ndarray, d: int) -> jnp.ndarray:
    """Accept (B, T, d) or (B, d, T); return (B, T, d). Mirrors the original
    tokenizer's `latents.shape[1] == vae_dim` check. Ambiguous squares
    (T == d) are treated as (B, d, T), matching the copysyn call site."""
    if latents.shape[1] == d:
        return jnp.transpose(latents, (0, 2, 1))
    return latents


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params, cfg: SigmaVAEConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """wav (B, 1, T) [or (B, T)] -> latent means (B, T/hop, d)."""
    if wav.ndim == 2:
        wav = wav[:, None, :]
    x = jnp.transpose(wav, (0, 2, 1))
    return _encode_nwc(params, cfg, x)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode(params, cfg: SigmaVAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents (B, T, d) or (B, d, T) -> wav (B, 1, T*hop)."""
    z = _orient_btd(latents, cfg.latent_dim)
    y = _decode_nwc(params, cfg, z)
    return jnp.transpose(y, (0, 2, 1))


# ---------------------------------------------------------------------------
# torch state-dict import/export
# ---------------------------------------------------------------------------
#
# The real VibeVoice package is absent from the snapshot (the reference
# imports it from an external workspace path, train_offline.py:32-37), so
# the importer documents and assumes a torch naming schema isomorphic to
# this architecture:
#
#   encoder.pre.{weight,bias}                    Conv1d (cout, cin, k)
#   encoder.stages.{i}.down.{weight,bias}        strided Conv1d
#   encoder.stages.{i}.blocks.{j}.norm.weight    RMS-norm scale (ch,)
#   encoder.stages.{i}.blocks.{j}.dw.{weight,bias}    depthwise Conv1d
#   encoder.stages.{i}.blocks.{j}.up.{weight,bias}    1x1 Conv1d (GEGLU)
#   encoder.stages.{i}.blocks.{j}.down.{weight,bias}  1x1 Conv1d
#   encoder.head.{weight,bias}                   1x1 Conv1d -> latent_dim
#   decoder.pre / decoder.stages.{i}.{blocks,up} / decoder.post_norm.weight
#   / decoder.post.{weight,bias}                 mirror; `up` is a
#                                                ConvTranspose1d (cin, cout, k)
#
# Any `acoustic_tokenizer.`/`module.` prefix is stripped. torch Conv1d
# weights (cout, cin/groups, k) map to this framework's NWC kernels
# (k, cin/groups, cout) by transpose(2, 1, 0); ConvTranspose1d weights
# (cin, cout, k) map to (k, cout, cin) -> our conv_transpose layout below.

_PREFIXES = ("acoustic_tokenizer.", "module.", "model.")


def _strip_prefix(name: str) -> str:
    for p in _PREFIXES:
        if name.startswith(p):
            return name[len(p):]
    return name


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (cout, cin/groups, k) -> NWC (k, cin/groups, cout)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _t_convT(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d (cin, cout, k) -> (k, cin, cout): this
    framework's conv_transpose1d takes the same (k, cin, cout) layout as
    conv1d (ops/conv.py)."""
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1)))


def params_from_torch_state_dict(sd: Dict[str, Any],
                                 cfg: SigmaVAEConfig) -> dict:
    """Import a VibeVoice-shaped torch state dict (see schema above).
    Values may be torch tensors or numpy arrays."""
    npd = {_strip_prefix(k): np.asarray(getattr(v, "numpy", lambda: v)())
           for k, v in sd.items()}

    def conv(name, transposed=False):
        w = npd[f"{name}.weight"]
        return {"w": jnp.asarray(_t_convT(w) if transposed else _t_conv(w)),
                "b": jnp.asarray(npd[f"{name}.bias"])}

    def block(name):
        return {"norm": jnp.asarray(npd[f"{name}.norm.weight"]),
                "dw": conv(f"{name}.dw"),
                "up": conv(f"{name}.up"),
                "down": conv(f"{name}.down")}

    n_stages = len(cfg.strides)
    enc = {"pre": conv("encoder.pre"),
           "stages": [
               {"down": conv(f"encoder.stages.{i}.down"),
                "blocks": [block(f"encoder.stages.{i}.blocks.{j}")
                           for j in range(cfg.blocks_per_stage)]}
               for i in range(n_stages)],
           "head": conv("encoder.head")}
    dec = {"pre": conv("decoder.pre"),
           "stages": [
               {"blocks": [block(f"decoder.stages.{i}.blocks.{j}")
                           for j in range(cfg.blocks_per_stage)],
                "up": conv(f"decoder.stages.{i}.up", transposed=True)}
               for i in range(n_stages)],
           "post_norm": jnp.asarray(npd["decoder.post_norm.weight"]),
           "post": conv("decoder.post")}
    return {"encoder": enc, "decoder": dec}


def state_dict_from_params(params: dict, cfg: SigmaVAEConfig) -> Dict[str, np.ndarray]:
    """Inverse of params_from_torch_state_dict (torch-layout numpy arrays).
    Useful for exporting to the reference toolchain and as the roundtrip
    oracle for the importer test."""
    out: Dict[str, np.ndarray] = {}

    def put_conv(name, p, transposed=False):
        w = np.asarray(p["w"])
        out[f"{name}.weight"] = np.ascontiguousarray(
            np.transpose(w, (1, 2, 0)) if transposed
            else np.transpose(w, (2, 1, 0)))
        out[f"{name}.bias"] = np.asarray(p["b"])

    def put_block(name, p):
        out[f"{name}.norm.weight"] = np.asarray(p["norm"])
        put_conv(f"{name}.dw", p["dw"])
        put_conv(f"{name}.up", p["up"])
        put_conv(f"{name}.down", p["down"])

    enc, dec = params["encoder"], params["decoder"]
    put_conv("encoder.pre", enc["pre"])
    for i, st in enumerate(enc["stages"]):
        put_conv(f"encoder.stages.{i}.down", st["down"])
        for j, b in enumerate(st["blocks"]):
            put_block(f"encoder.stages.{i}.blocks.{j}", b)
    put_conv("encoder.head", enc["head"])
    put_conv("decoder.pre", dec["pre"])
    for i, st in enumerate(dec["stages"]):
        for j, b in enumerate(st["blocks"]):
            put_block(f"decoder.stages.{i}.blocks.{j}", b)
        put_conv(f"decoder.stages.{i}.up", st["up"], transposed=True)
    out["decoder.post_norm.weight"] = np.asarray(dec["post_norm"])
    put_conv("decoder.post", dec["post"])
    return out


def sample(rng: jax.Array, mean: jnp.ndarray, sigma: float = 0.5,
           dist_type: str = "fix") -> jnp.ndarray:
    """Module-level sample() parity (ref model_sigmaVAE.py:187-213)."""
    if dist_type == "fix":
        return mean + sigma * jax.random.normal(rng, mean.shape, mean.dtype)
    if dist_type == "gaussian":
        k1, k2 = jax.random.split(rng)
        b = mean.shape[0]
        std = jax.random.normal(k1, (b,), mean.dtype) * (sigma / 0.8)
        std = std.reshape((b,) + (1,) * (mean.ndim - 1))
        return mean + std * jax.random.normal(k2, mean.shape, mean.dtype)
    return mean
