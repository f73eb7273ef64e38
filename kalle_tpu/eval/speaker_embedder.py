"""Trainable speaker embedder: the discriminative speaker-sim back-end.

The reference scores voice cloning with a TRAINED WavLM-ECAPA
(ref tools/sim_test.py:26-49); no such checkpoint exists in this image, so
this module trains the framework's own ECAPA-TDNN
(models/conditioning/ecapa.py) on synthetic speaker classification over the
tone-coded language's speaker profiles (data/synth_speech.py: per-speaker
f0 + formant scale + spectral tilt + vibrato — identity genuinely present
in the waveform). The trained embedding separates same-speaker from
cross-speaker pairs BY CONSTRUCTION (margin-tested), which a random-init
ECAPA cannot (all sims saturate ~0.99) — making the cosine protocol in
eval/harness.speaker_similarity and the voice-clone gate discriminative.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import synth_speech as sl
from ..models.conditioning import ecapa as ecapa_mod
from ..ops.mel import mel_spectrogram


@dataclasses.dataclass(frozen=True)
class SpeakerTrainConfig:
    sample_rate: int = 16000
    n_mels: int = 80
    n_speakers: int = 8
    utt_per_speaker: int = 12
    utt_seconds: float = 0.9
    steps: int = 500
    batch: int = 16
    lr: float = 2e-3
    seed: int = 0

    @staticmethod
    def tiny() -> "SpeakerTrainConfig":
        return SpeakerTrainConfig(sample_rate=8000, n_mels=40, n_speakers=6,
                                  utt_per_speaker=8, steps=350)


def _mel(cfg: SpeakerTrainConfig, wav: np.ndarray) -> np.ndarray:
    """wav (T,) -> (frames, n_mels) log mel."""
    m = mel_spectrogram(jnp.asarray(wav)[None],
                        sample_rate=cfg.sample_rate, n_mels=cfg.n_mels,
                        f_max=cfg.sample_rate / 2.0)
    return np.asarray(jnp.log(jnp.maximum(m[0], 1e-5)).T)


def _render_bank(cfg: SpeakerTrainConfig, seed_off: int = 0,
                 channel: Optional[Callable] = None):
    """(mels (N, T, F), labels (N,)) — random sentences per speaker so the
    classifier can only win through speaker acoustics, never text."""
    rng = np.random.default_rng(cfg.seed + seed_off)
    T = int(cfg.utt_seconds * cfg.sample_rate)
    mels, labels = [], []
    for spk in range(cfg.n_speakers):
        for _ in range(cfg.utt_per_speaker):
            text = sl.random_sentence(rng)
            while len(sl.render(text, cfg.sample_rate, speaker=spk,
                                seed=seed_off)) < T:
                text += " " + sl.random_sentence(rng)
            wav = sl.render(text, cfg.sample_rate, speaker=spk,
                            seed=int(rng.integers(0, 2**31)))[:T]
            if channel is not None:
                wav = np.asarray(channel(wav), np.float32)[:T]
            mels.append(_mel(cfg, wav))
            labels.append(spk)
    t = min(m.shape[0] for m in mels)
    mel = np.stack([m[:t] for m in mels]).astype(np.float32)
    return mel, np.asarray(labels, np.int32)


def _ecapa_cfg(cfg: SpeakerTrainConfig) -> ecapa_mod.EcapaConfig:
    return ecapa_mod.EcapaConfig(in_channels=cfg.n_mels, channels=32,
                                 embd_dim=32, scale=4, attn_bottleneck=16,
                                 pooled_channels=96)


@functools.partial(jax.jit, static_argnames=("ecfg", "tx"))
def _step(params, head, opt, ecfg, tx, mel, labels):
    def loss_fn(ph):
        p, h = ph
        emb = ecapa_mod.forward(p, ecfg, mel)
        logits = emb @ h["w"] + h["b"]
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))

    loss, grads = jax.value_and_grad(loss_fn)((params, head))
    updates, opt = tx.update(grads, opt, (params, head))
    params, head = optax.apply_updates((params, head), updates)
    return params, head, opt, loss


def train_speaker_embedder(cfg: SpeakerTrainConfig = SpeakerTrainConfig(),
                           channel: Optional[Callable] = None
                           ) -> Tuple[dict, ecapa_mod.EcapaConfig,
                                      List[float]]:
    """Train ECAPA + a linear classification head on speaker-ID; the head is
    discarded, the embedding is the product (standard x-vector recipe).
    Returns (ecapa_params, ecapa_cfg, loss_curve)."""
    ecfg = _ecapa_cfg(cfg)
    mel, labels = _render_bank(cfg, channel=channel)
    key = jax.random.key(cfg.seed)
    params = ecapa_mod.init_params(ecfg, key)
    kw, kb = jax.random.split(jax.random.fold_in(key, 1))
    head = {"w": 0.05 * jax.random.normal(kw, (ecfg.embd_dim,
                                                cfg.n_speakers)),
            "b": jnp.zeros((cfg.n_speakers,))}
    tx = optax.adam(optax.cosine_decay_schedule(cfg.lr, cfg.steps, 0.05))
    opt = tx.init((params, head))
    rng = np.random.default_rng(cfg.seed + 7)
    mel_j, lab_j = jnp.asarray(mel), jnp.asarray(labels)
    curve = []
    for i in range(cfg.steps):
        idx = jnp.asarray(rng.choice(mel.shape[0], cfg.batch,
                                     replace=cfg.batch > mel.shape[0]))
        params, head, opt, loss = _step(params, head, opt, ecfg, tx,
                                        mel_j[idx], lab_j[idx])
        if i % 50 == 0:
            curve.append(float(loss))
    curve.append(float(loss))
    return jax.device_get(params), ecfg, curve


def embed_waveform(params, ecfg, cfg: SpeakerTrainConfig,
                   wav: np.ndarray, sr: int) -> np.ndarray:
    from ..utils.audio import resample_linear

    wav = np.asarray(wav, np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=0)
    if sr != cfg.sample_rate:
        wav = resample_linear(wav[None], sr, cfg.sample_rate)[0]
    m = _mel(cfg, wav)
    return np.asarray(ecapa_mod.forward(params, ecfg,
                                        jnp.asarray(m[None])))[0]


def make_trained_embedder(params, ecfg, cfg: SpeakerTrainConfig
                          ) -> Callable[[str], np.ndarray]:
    """wav path -> embedding; drop-in for eval/harness.speaker_similarity
    and run_experiment's clone gate (the reference's WavLM-ECAPA role,
    ref tools/sim_test.py:51-99)."""
    from ..utils.audio import read_wav

    def embed(wav_path: str) -> np.ndarray:
        audio, sr = read_wav(wav_path)
        return embed_waveform(params, ecfg, cfg, audio, sr)

    return embed


def margin(params, ecfg, cfg: SpeakerTrainConfig, n_pairs: int = 24,
           seed_off: int = 9000, channel: Optional[Callable] = None
           ) -> Tuple[float, float]:
    """Held-out discrimination check: mean cosine of same-speaker pairs vs
    cross-speaker pairs on renders the training never saw (fresh seeds,
    fresh sentences). Returns (pos_mean, neg_mean); a discriminative
    embedder must show pos - neg >> 0."""
    eval_cfg = dataclasses.replace(cfg, utt_per_speaker=2)
    mel, labels = _render_bank(eval_cfg, seed_off=seed_off, channel=channel)
    embs = np.asarray(ecapa_mod.forward(params, ecfg, jnp.asarray(mel)))
    embs = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-9)
    sims = embs @ embs.T
    n = len(labels)
    pos = [sims[i, j] for i in range(n) for j in range(i + 1, n)
           if labels[i] == labels[j]]
    neg = [sims[i, j] for i in range(n) for j in range(i + 1, n)
           if labels[i] != labels[j]]
    return float(np.mean(pos)), float(np.mean(neg))
