"""Waveform discriminators for codec GAN training.

Reference surface: stable_audio_tools/models/discriminators.py ships
Encodec multi-scale-STFT, multi-period (MPD) and multi-resolution (MRD)
discriminators used by the autoencoder training wrapper. TPU-native
re-design: the MPD reshapes run as strided views + NWC convs; the MRD
operates on the GEMM-STFT magnitudes from ops.mel.

Both return (logits, features) lists for LSGAN + feature matching.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.mel import stft_mag


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    mrd_resolutions: Tuple[Tuple[int, int, int], ...] = (
        (1024, 256, 1024), (2048, 512, 2048), (512, 128, 512))
    channels: int = 32
    n_layers: int = 4
    # audio channels (2 = stereo, the reference Encodec discriminator's
    # in_channels for the Oobleck arm, ref training/autoencoders.py:135)
    in_channels: int = 1

    @staticmethod
    def tiny(in_channels: int = 1) -> "DiscriminatorConfig":
        return DiscriminatorConfig(periods=(2, 3), mrd_resolutions=((256, 64, 256),),
                                   channels=8, n_layers=2,
                                   in_channels=in_channels)

    @staticmethod
    def encodec_stereo() -> "DiscriminatorConfig":
        """Operating point of the reference's default Encodec discriminator
        for the stereo Oobleck arm (training/autoencoders.py:76-94: scales
        2048..32 at 0.75 overlap, filters=32). Our MRD runs on GEMM-STFT
        magnitudes per channel; scales < 128 are dropped (sub-lane STFTs are
        MXU-hostile and contribute negligible receptive field)."""
        scales = (2048, 1024, 512, 256, 128)
        return DiscriminatorConfig(
            periods=(2, 3, 5, 7, 11),
            mrd_resolutions=tuple((s, s // 4, s) for s in scales),
            channels=32, n_layers=4, in_channels=2)


def _conv_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k)
    return {"w": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def init_params(cfg: DiscriminatorConfig, key) -> dict:
    keys = iter(jax.random.split(key, 1024))
    nk = lambda: next(keys)
    ch = cfg.channels

    def stack(cin0):
        layers = []
        cin = cin0
        cout = ch
        for _ in range(cfg.n_layers):
            layers.append(_conv_init(nk(), 5, cin, cout))
            cin, cout = cout, min(cout * 2, 512)
        layers.append(_conv_init(nk(), 3, cin, 1))
        return layers

    return {
        # period phases become input CHANNELS (dense NWC convs on the MXU,
        # instead of the reference's (T/p, p) 2-D conv layout); audio
        # channels multiply in (stereo -> 2x input channels)
        "mpd": [stack(p * cfg.in_channels) for p in cfg.periods],
        "mrd": [stack((n_fft // 2 + 1) * cfg.in_channels)
                for (n_fft, _, _) in cfg.mrd_resolutions],
    }


def _run_stack(layers, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    feats = []
    for p in layers[:-1]:
        x = conv1d(x, p["w"], p["b"], stride=2, padding=2)
        x = jax.nn.leaky_relu(x, 0.1)
        feats.append(x)
    p = layers[-1]
    logits = conv1d(x, p["w"], p["b"], padding=1)
    return logits, feats


def forward(params: dict, cfg: DiscriminatorConfig,
            wav: jnp.ndarray) -> Tuple[List[jnp.ndarray], List[List[jnp.ndarray]]]:
    """wav (B, C, T), C == cfg.in_channels -> (logits list, feature lists)."""
    x = jnp.transpose(wav, (0, 2, 1))  # (B, T, C)
    logits, feats = [], []

    # multi-period: the p phases (x C audio channels) become channels
    # -> (B, T/p, p*C)
    for p_idx, period in enumerate(cfg.periods):
        T = x.shape[1]
        pad = (-T) % period
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        xp = xp.reshape(x.shape[0], -1, period * x.shape[-1])
        l, f = _run_stack(params["mpd"][p_idx], xp)
        logits.append(l)
        feats.append(f)

    # multi-resolution STFT magnitudes; stereo stacks per-channel mags along
    # the channel axis (the reference Encodec disc convolves complex STFTs of
    # each channel with 2-D kernels; per-channel magnitude stacks keep the
    # same information reachable by dense NWC convs on the MXU)
    for r_idx, (n_fft, hop, win) in enumerate(cfg.mrd_resolutions):
        if wav.shape[-1] < n_fft:
            continue
        mags = [stft_mag(wav[:, c, :], n_fft, hop, win, power=1.0)
                for c in range(wav.shape[1])]  # each (B, F, T')
        mag = jnp.concatenate(mags, axis=1)
        l, f = _run_stack(params["mrd"][r_idx], jnp.transpose(mag, (0, 2, 1)))
        logits.append(l)
        feats.append(f)
    return logits, feats
