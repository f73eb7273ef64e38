"""mel-VAE / BigVGANFlowVAE — codec B, in JAX.

Reference: backup/flows.py — strided-conv Encoder (:194-241), residual
coupling flow over z (:759-790), BigVGAN decoder with ConvTranspose
upsamplers + AMPBlock1/2 anti-aliased Snake/SnakeBeta stacks (:243-455),
causal Conv1d (:548-609), WN WaveNet block (:623-695).

Public surface (parity with the reference):
    forward(params, cfg, wav, rng)        -> (wav_hat, (z_p, logs_q))
    extract_latents(params, cfg, wav)     -> (B, 2*latent, T') mean||logs
                                             (flows.py:495-497)
    inference_from_latents(params, cfg, x, rng, do_sample)
                                          -> wav (flows.py:499-529)
    inference_from_mean_std(params, cfg, mean, logs_q, rng, do_sample)
                                          -> wav (reconstruction of the
        missing models_flow_vae.py superset; call-site contract
        training_version/melvae/train_melvae.py:318: z = mean +
        randn*exp(logs_q) when do_sample, then the BigVGAN tail)
    flow(params, cfg, z, reverse)         -> z' (ResidualCouplingBlock)

Default operating point reconstructs the 12.5 Hz / 16 kHz configuration
(configs/vae_12_5_dim1024-sft.yaml:1,13,37: latent 512, mean||logs = 1024):
strides 2*2*2*4*4*5 = 1280 => 12.5 Hz. The exact config JSON
(config_dim1024_12_5hz.json) is not in the snapshot; field names follow
the h AttrDict consumed by flows.py.

Layout: external (B, C, T) like the reference; internal NWC.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.alias_free import alias_free_act
from ...ops.conv import conv1d, conv_transpose1d, snake, snake_beta


@dataclasses.dataclass(frozen=True)
class MelVAEConfig:
    latent_dim: int = 512
    use_vae: bool = True
    in_channels: int = 1
    base_channels: int = 12
    downsample_channels: Tuple[int, ...] = (12, 24, 48, 96, 192, 384, 768)
    downsample_rates: Tuple[int, ...] = (2, 2, 2, 4, 4, 5)
    stacks: int = 6
    stack_kernel_size: int = 3
    stack_dilation_base: int = 2
    proj_kernel_size: int = 3
    flow_hidden_channels: int = 192
    n_flows: int = 4
    flow_kernel_size: int = 5
    flow_n_layers: int = 4
    upsample_initial_channel: int = 1024
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (10, 8, 8, 4, 4, 4)
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    causal: bool = True
    sample_rate: int = 16000

    @property
    def hop(self) -> int:
        return int(np.prod(self.downsample_rates))

    @staticmethod
    def from_h(h: Dict[str, Any]) -> "MelVAEConfig":
        """Build from a reference h-config JSON (AttrDict fields)."""
        def g(k, d):
            return h.get(k, d)
        return MelVAEConfig(
            latent_dim=g("latent_dim", 512),
            use_vae=g("use_vae", True),
            downsample_channels=tuple(g("downsample_channels",
                                        (12, 24, 48, 96, 192, 384, 768))),
            downsample_rates=tuple(g("downsample_rates", (2, 2, 2, 4, 4, 5))),
            flow_hidden_channels=g("flow_hidden_channels", 192),
            upsample_initial_channel=g("upsample_initial_channel", 1024),
            upsample_rates=tuple(g("upsample_rates", (5, 4, 4, 2, 2, 2))),
            upsample_kernel_sizes=tuple(g("upsample_kernel_sizes",
                                          (10, 8, 8, 4, 4, 4))),
            resblock=str(g("resblock", "1")),
            resblock_kernel_sizes=tuple(g("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilation_sizes=tuple(map(tuple, g("resblock_dilation_sizes",
                                                       ((1, 3, 5),) * 3))),
            activation=g("activation", "snakebeta"),
            snake_logscale=g("snake_logscale", True),
            causal=g("causal", True),
            sample_rate=g("sampling_rate", 16000),
        )

    @staticmethod
    def tiny() -> "MelVAEConfig":
        return MelVAEConfig(
            latent_dim=8, downsample_channels=(4, 8, 16),
            downsample_rates=(2, 4), stacks=2, flow_hidden_channels=8,
            n_flows=2, flow_n_layers=2, upsample_initial_channel=16,
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        )


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _same_pad(k: int, d: int = 1) -> int:
    return (k * d - d) // 2


def causal_conv(x, p, k, stride=1, dilation=1, causal=True):
    """flows.py custom Conv1d (:548-609): causal -> left pad d*(k-1),
    else centered."""
    if causal:
        x = jnp.pad(x, ((0, 0), (dilation * (k - 1), 0), (0, 0)))
        return conv1d(x, p["w"], p.get("b"), stride=stride, padding=0,
                      dilation=dilation)
    return conv1d(x, p["w"], p.get("b"), stride=stride,
                  padding=_same_pad(k, dilation), dilation=dilation)


def causal_conv_t(x, p, k, stride, causal=True):
    """flows.py custom ConvTranspose1d (:339-394): causal -> padding 0 then
    trim `stride` from the right; else padding (k - stride)//2."""
    if causal:
        y = conv_transpose1d(x, p["w"], p.get("b"), stride=stride, padding=0)
        return y[:, :-stride, :]
    return conv_transpose1d(x, p["w"], p.get("b"), stride=stride,
                            padding=(k - stride) // 2)


def _act(x, p, cfg: MelVAEConfig):
    if cfg.activation == "snakebeta":
        f = lambda y: snake_beta(y, p["alpha"], p["beta"], cfg.snake_logscale)
    else:
        f = lambda y: snake(y, p["alpha"], cfg.snake_logscale)
    return alias_free_act(x, f)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, k, cin, cout, std=None):
    kw, kb = jax.random.split(key)
    if std is not None:
        w = jax.random.normal(kw, (k, cin, cout), jnp.float32) * std
    else:
        bound = 1.0 / math.sqrt(cin * k)
        w = jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound)
    bound = 1.0 / math.sqrt(cin * k)
    return {"w": w,
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def _snake_init(ch, cfg):
    if cfg.activation == "snakebeta":
        init = jnp.zeros if cfg.snake_logscale else jnp.ones
        return {"alpha": init((ch,)), "beta": init((ch,))}
    init = jnp.zeros if cfg.snake_logscale else jnp.ones
    return {"alpha": init((ch,))}


def init_params(cfg: MelVAEConfig, key) -> dict:
    keys = iter(jax.random.split(key, 4096))
    nk = lambda: next(keys)

    # --- Encoder (flows.py:194-241) ---
    chs = cfg.downsample_channels
    enc: Dict[str, Any] = {
        "pre": _conv_init(nk(), cfg.proj_kernel_size, cfg.in_channels, chs[0]),
        "downs": [],
        "post": _conv_init(nk(), cfg.proj_kernel_size, chs[-1],
                           cfg.latent_dim * (2 if cfg.use_vae else 1)),
    }
    for (cin, cout), f in zip(zip(chs[:-1], chs[1:]), cfg.downsample_rates):
        stack = []
        for i in range(cfg.stacks):
            stack.append({
                "c1": _conv_init(nk(), cfg.stack_kernel_size, cout, cout),
                "c2": _conv_init(nk(), cfg.stack_kernel_size, cout, cout),
            })
        enc["downs"].append({
            "down": _conv_init(nk(), 2 * f, cin, cout),
            "stack": stack,
        })

    # --- Flow (flows.py:759-790), mean_only coupling ---
    half = cfg.latent_dim // 2
    hid = cfg.flow_hidden_channels
    flows = []
    for _ in range(cfg.n_flows):
        wn_in, wn_skip = [], []
        for i in range(cfg.flow_n_layers):
            wn_in.append(_conv_init(nk(), cfg.flow_kernel_size, hid, 2 * hid))
            out_ch = 2 * hid if i < cfg.flow_n_layers - 1 else hid
            wn_skip.append(_conv_init(nk(), 1, hid, out_ch))
        post = _conv_init(nk(), 1, hid, half)
        post["w"] = jnp.zeros_like(post["w"])  # zero-init (flows.py:739-740)
        post["b"] = jnp.zeros_like(post["b"])
        flows.append({
            "pre": _conv_init(nk(), 1, half, hid),
            "wn_in": wn_in,
            "wn_skip": wn_skip,
            "post": post,
        })

    # --- BigVGAN decoder (flows.py:396-455) ---
    up0 = cfg.upsample_initial_channel
    dec: Dict[str, Any] = {
        "conv_pre": _conv_init(nk(), 7, cfg.latent_dim, up0),
        "ups": [],
        "resblocks": [],
        "post_act": None,
        "conv_post": None,
    }
    ch = up0
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = up0 // (2 ** i)
        ch = up0 // (2 ** (i + 1))
        dec["ups"].append(_conv_init(nk(), k, cin, ch, std=0.01))
        blocks = []
        for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            n_convs = len(dd) if cfg.resblock == "1" else len(dd)
            blk = {"convs1": [], "convs2": [], "acts": []}
            for d in dd:
                blk["convs1"].append(_conv_init(nk(), kk, ch, ch, std=0.01))
                if cfg.resblock == "1":
                    blk["convs2"].append(_conv_init(nk(), kk, ch, ch, std=0.01))
            n_act = (2 * len(dd)) if cfg.resblock == "1" else len(dd)
            blk["acts"] = [_snake_init(ch, cfg) for _ in range(n_act)]
            blocks.append(blk)
        dec["resblocks"].append(blocks)
    dec["post_act"] = _snake_init(ch, cfg)
    dec["conv_post"] = _conv_init(nk(), 7, ch, 1, std=0.01)

    return {"encoder": enc, "flows": flows, "decoder": dec}


# ---------------------------------------------------------------------------
# forward pieces (NWC internal)
# ---------------------------------------------------------------------------

def _encoder_nwc(p, cfg: MelVAEConfig, x):
    # Conv1d_S is always 'same'-padded (never causal, flows.py:155)
    x = causal_conv(x, p["pre"], cfg.proj_kernel_size, causal=False)
    x = jax.nn.leaky_relu(x, 0.2)
    for blk, f in zip(p["downs"], cfg.downsample_rates):
        x = conv1d(x, blk["down"]["w"], blk["down"]["b"], stride=f,
                   padding=_same_pad(2 * f))
        # ResStack (flows.py:171-191): LeakyReLU default slope 0.01
        for i, st in enumerate(blk["stack"]):
            d = cfg.stack_dilation_base ** i
            h = jax.nn.leaky_relu(x, 0.01)
            h = conv1d(h, st["c1"]["w"], st["c1"]["b"], padding=d, dilation=d)
            h = jax.nn.leaky_relu(h, 0.01)
            h = conv1d(h, st["c2"]["w"], st["c2"]["b"], padding=1)
            x = x + h
        x = jax.nn.leaky_relu(x, 0.2)
    x = causal_conv(x, p["post"], cfg.proj_kernel_size, causal=False)
    return x


def _wn(flow_p, cfg: MelVAEConfig, x):
    """WaveNet block, mean_only coupling enc (flows.py:623-695)."""
    hid = cfg.flow_hidden_channels
    output = jnp.zeros_like(x)
    for i in range(cfg.flow_n_layers):
        d = 1  # dilation_rate=1 in the reference build (flows.py:761)
        x_in = causal_conv(x, flow_p["wn_in"][i], cfg.flow_kernel_size,
                           dilation=d, causal=cfg.causal)
        t = jnp.tanh(x_in[..., :hid])
        s = jax.nn.sigmoid(x_in[..., hid:])
        acts = t * s
        rs = causal_conv(acts, flow_p["wn_skip"][i], 1, causal=cfg.causal)
        if i < cfg.flow_n_layers - 1:
            x = x + rs[..., :hid]
            output = output + rs[..., hid:]
        else:
            output = output + rs
    return output


def _flow_nwc(params, cfg: MelVAEConfig, z, reverse=False):
    """ResidualCouplingBlock with Flip between couplings (flows.py:759-790);
    mask is all-ones in every call site."""
    half = cfg.latent_dim // 2
    flows = params["flows"]
    order = range(len(flows)) if not reverse else range(len(flows) - 1, -1, -1)
    for fi in order:
        fp = flows[fi]
        if reverse:
            z = z[..., ::-1]  # undo Flip first when reversed
        x0, x1 = z[..., :half], z[..., half:]
        h = causal_conv(x0, fp["pre"], 1, causal=cfg.causal)
        h = _wn(fp, cfg, h)
        m = causal_conv(h, fp["post"], 1, causal=cfg.causal)
        if not reverse:
            x1 = m + x1  # mean_only: exp(logs)=1
            z = jnp.concatenate([x0, x1], axis=-1)
            z = z[..., ::-1]  # Flip
        else:
            x1 = x1 - m
            z = jnp.concatenate([x0, x1], axis=-1)
    return z


def _decoder_nwc(p, cfg: MelVAEConfig, z):
    dec = p["decoder"]
    x = causal_conv(z, dec["conv_pre"], 7, causal=False)  # conv_pre causal=False (flows.py:414)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = causal_conv_t(x, dec["ups"][i], k, u, causal=cfg.causal)
        xs = None
        for blk in dec["resblocks"][i]:
            h = _amp_block(blk, cfg, x, i)
            xs = h if xs is None else xs + h
        x = xs / len(dec["resblocks"][i])
    x = _act(x, dec["post_act"], cfg)
    x = causal_conv(x, dec["conv_post"], 7, causal=cfg.causal)
    return jnp.tanh(x)


def _amp_block(blk, cfg: MelVAEConfig, x, up_idx):
    ks = cfg.resblock_kernel_sizes
    # kernel size for this block is implied by conv shapes
    k = blk["convs1"][0]["w"].shape[0]
    dil = None
    for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
        if kk == k:
            dil = dd
            break
    if cfg.resblock == "1":
        a1s, a2s = blk["acts"][::2], blk["acts"][1::2]
        for c1, c2, d, a1, a2 in zip(blk["convs1"], blk["convs2"], dil, a1s, a2s):
            xt = _act(x, a1, cfg)
            xt = causal_conv(xt, c1, k, dilation=d, causal=cfg.causal)
            xt = _act(xt, a2, cfg)
            xt = causal_conv(xt, c2, k, dilation=1, causal=cfg.causal)
            x = xt + x
    else:
        for c, d, a in zip(blk["convs1"], dil, blk["acts"]):
            xt = _act(x, a, cfg)
            xt = causal_conv(xt, c, k, dilation=d, causal=cfg.causal)
            x = xt + x
    return x


# ---------------------------------------------------------------------------
# public API (channel-first external, matching the reference)
# ---------------------------------------------------------------------------

def params_from_state_dict(sd: Dict[str, Any], cfg: MelVAEConfig,
                           prefix: str = "") -> dict:
    """Import a BigVGANFlowVAE torch state_dict (e.g. the `generator` entry
    of g_* checkpoints, ref train_melvae.py:98-106). Folds weight norm."""
    from .oobleck import _import_conv, _import_conv_t

    g = lambda s: prefix + s
    nd = len(cfg.downsample_rates)

    # Encoder Sequential indices: 0=pre, then (2+3i)=down, (3+3i)=ResStack
    enc: Dict[str, Any] = {
        "pre": _import_conv(sd, g("audio_encoder.generator.0.layer")),
        "downs": [],
        "post": _import_conv(sd, g(f"audio_encoder.generator.{2 + 3 * nd}.layer")),
    }
    for i in range(nd):
        base = g(f"audio_encoder.generator.{2 + 3 * i}")
        stack_base = g(f"audio_encoder.generator.{3 + 3 * i}")
        stack = []
        for j in range(cfg.stacks):
            stack.append({
                "c1": _import_conv(sd, f"{stack_base}.layers.{j}.1"),
                "c2": _import_conv(sd, f"{stack_base}.layers.{j}.3"),
            })
        enc["downs"].append({
            "down": _import_conv(sd, f"{base}.layer"),
            "stack": stack,
        })

    flows = []
    for i in range(cfg.n_flows):
        base = g(f"flow.flows.{2 * i}")
        wn_in = [_import_conv(sd, f"{base}.enc.in_layers.{j}")
                 for j in range(cfg.flow_n_layers)]
        wn_skip = [_import_conv(sd, f"{base}.enc.res_skip_layers.{j}")
                   for j in range(cfg.flow_n_layers)]
        flows.append({
            "pre": _import_conv(sd, f"{base}.pre"),
            "wn_in": wn_in,
            "wn_skip": wn_skip,
            "post": _import_conv(sd, f"{base}.post"),
        })

    dec: Dict[str, Any] = {
        "conv_pre": _import_conv(sd, g("conv_pre")),
        "ups": [_import_conv_t(sd, g(f"ups.{i}.0"))
                for i in range(len(cfg.upsample_rates))],
        "resblocks": [],
        "post_act": {"alpha": np.asarray(sd[g("activation_post.act.alpha")],
                                         np.float32)},
        "conv_post": _import_conv(sd, g("conv_post")),
    }
    if cfg.activation == "snakebeta":
        dec["post_act"]["beta"] = np.asarray(sd[g("activation_post.act.beta")],
                                             np.float32)
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        blocks = []
        for j in range(nk):
            base = g(f"resblocks.{i * nk + j}")
            dd = cfg.resblock_dilation_sizes[j]
            blk: Dict[str, Any] = {"convs1": [], "convs2": [], "acts": []}
            for c in range(len(dd)):
                blk["convs1"].append(_import_conv(sd, f"{base}.convs1.{c}"
                                                  if cfg.resblock == "1"
                                                  else f"{base}.convs.{c}"))
                if cfg.resblock == "1":
                    blk["convs2"].append(_import_conv(sd, f"{base}.convs2.{c}"))
            n_act = 2 * len(dd) if cfg.resblock == "1" else len(dd)
            for a in range(n_act):
                act = {"alpha": np.asarray(sd[f"{base}.activations.{a}.act.alpha"],
                                           np.float32)}
                if cfg.activation == "snakebeta":
                    act["beta"] = np.asarray(sd[f"{base}.activations.{a}.act.beta"],
                                             np.float32)
                blk["acts"].append(act)
            blocks.append(blk)
        dec["resblocks"].append(blocks)

    return {"encoder": enc, "flows": flows, "decoder": dec}


def load_pretrained(config_path: str, ckpt_path: str):
    """h-config JSON + g_* checkpoint -> (cfg, params)
    (ref train_melvae.py:84-108)."""
    import json as _json

    from ...models.lm.convert import load_torch_checkpoint

    with open(config_path) as f:
        cfg = MelVAEConfig.from_h(_json.load(f))
    sd = load_torch_checkpoint(ckpt_path)
    return cfg, jax.tree.map(jnp.asarray, params_from_state_dict(sd, cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_latents(params, cfg: MelVAEConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """wav (B, 1, T) -> (B, 2*latent, T/hop) mean||logs (flows.py:495-497)."""
    x = jnp.transpose(wav, (0, 2, 1))
    z = _encoder_nwc(params["encoder"], cfg, x)
    return jnp.transpose(z, (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("cfg", "do_sample"))
def inference_from_latents(params, cfg: MelVAEConfig, x: jnp.ndarray,
                           rng: jax.Array, do_sample: bool = True) -> jnp.ndarray:
    """(B, 2*latent, T') mean||logs (or (B, latent, T') when not sampling)
    -> wav (B, 1, T'*hop) (flows.py:499-529)."""
    z = jnp.transpose(x, (0, 2, 1))
    if cfg.use_vae and do_sample:
        m, logs = z[..., :cfg.latent_dim], z[..., cfg.latent_dim:]
        z = m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs)
    y = _decoder_nwc(params, cfg, z)
    return jnp.transpose(y, (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("cfg", "do_sample"))
def inference_from_mean_std(params, cfg: MelVAEConfig, mean: jnp.ndarray,
                            logs_q: jnp.ndarray, rng: jax.Array,
                            do_sample: bool = True) -> jnp.ndarray:
    """Reconstruction of the missing models_flow_vae.inference_from_mean_std
    (call site training_version/melvae/train_melvae.py:318):
    mean/logs (B, latent, T') -> sample -> decode."""
    m = jnp.transpose(mean, (0, 2, 1))
    if do_sample:
        logs = jnp.transpose(logs_q, (0, 2, 1))
        z = m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs)
    else:
        z = m
    y = _decoder_nwc(params, cfg, z)
    return jnp.transpose(y, (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("cfg", "reverse"))
def flow(params, cfg: MelVAEConfig, z: jnp.ndarray,
         reverse: bool = False) -> jnp.ndarray:
    """(B, latent, T') -> (B, latent, T') residual-coupling flow."""
    x = jnp.transpose(z, (0, 2, 1))
    y = _flow_nwc(params, cfg, x, reverse=reverse)
    return jnp.transpose(y, (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params, cfg: MelVAEConfig, wav: jnp.ndarray, rng: jax.Array,
            freeze_encoder: bool = False, latent_mask_ratio: float = 0.0):
    """Training forward (flows.py:457-493): encode -> sample -> flow(z) ->
    decode. Returns (wav_hat, (z_p, m_q, logs_q)) — the posterior mean is
    returned directly so the KL term never re-runs the encoder.

    freeze_encoder: stop gradients at the encoder output (the reference's
    encoder_freeze_on_warmup — post-warmup only the decoder adapts to the
    adversarial phase, ref autoencoders.py:243-247). latent_mask_ratio:
    randomly zero that fraction of latents before DECODE only (noise
    resistance, ref autoencoders.py:260-263; the KL/flow see unmasked z)."""
    x = jnp.transpose(wav, (0, 2, 1))
    enc = _encoder_nwc(params["encoder"], cfg, x)
    if freeze_encoder:
        enc = jax.lax.stop_gradient(enc)
    m_q, logs_q = enc[..., :cfg.latent_dim], enc[..., cfg.latent_dim:]
    z = m_q + jax.random.normal(rng, m_q.shape, m_q.dtype) * jnp.exp(logs_q)
    z_p = _flow_nwc(params, cfg, z, reverse=False)
    z_dec = z
    if latent_mask_ratio > 0.0:
        keep = jax.random.uniform(jax.random.fold_in(rng, 1),
                                  z.shape) >= latent_mask_ratio
        z_dec = jnp.where(keep, z, jnp.zeros_like(z))
    y = _decoder_nwc(params, cfg, z_dec)
    return (jnp.transpose(y, (0, 2, 1)),
            (jnp.transpose(z_p, (0, 2, 1)),
             jnp.transpose(m_q, (0, 2, 1)),
             jnp.transpose(logs_q, (0, 2, 1))))
