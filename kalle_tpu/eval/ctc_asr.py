"""In-framework CTC ASR: the runnable WER back-end.

The reference scores synthesis quality as WER through real ASR
(ref tools/asr_test.py:28-45 Whisper/Paraformer -> tools/compute-wer.sh:24-27
-> compute-wer.py). Those checkpoints don't exist in this image, so this
module trains a small acoustic model IN THIS FRAMEWORK on the tone-coded
synthetic language (data/synth_speech.py) and exposes it as a transcriber
for eval/harness.wer_pipeline — making the BASELINE "WER within 1%" axis
mechanically measurable end to end: synthesize -> transcribe -> eval/wer.py.

Architecture (TPU-native, all MXU-friendly dense NWC convs):
    log-mel (B, T, 80) -> conv s2 -> gelu -> residual dilated conv blocks
    -> dense -> per-frame logits over blank+27 chars, trained with
    optax.ctc_loss, greedy (best-path) decoding.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import synth_speech as sl
from ..ops.conv import conv1d
from ..ops.mel import mel_spectrogram


@dataclasses.dataclass(frozen=True)
class CTCConfig:
    sample_rate: int = 24000
    n_mels: int = 80
    n_fft: int = 1024
    hop: int = 256
    channels: int = 128
    n_blocks: int = 2
    kernel: int = 5
    vocab: int = len(sl.VOCAB)  # labels 1..vocab; 0 = blank

    @staticmethod
    def tiny() -> "CTCConfig":
        return CTCConfig(sample_rate=16000, n_mels=40, n_fft=512, hop=128,
                         channels=64, n_blocks=2)

    @staticmethod
    def for_sample_rate(sr: int, tiny: bool = False) -> "CTCConfig":
        """8 ms hop / 64 ms window at any rate (the synthetic language's
        ~80 ms chars then span ~5 post-stride frames)."""
        hop = max(sr // 125, 8)
        if tiny:
            return CTCConfig(sample_rate=sr, n_mels=32, n_fft=8 * hop,
                             hop=hop, channels=64, n_blocks=2)
        return CTCConfig(sample_rate=sr, n_mels=80, n_fft=8 * hop, hop=hop)


def _conv_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k)
    return {"w": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}


def init_params(cfg: CTCConfig, key) -> dict:
    keys = iter(jax.random.split(key, 64))
    ch = cfg.channels
    return {
        "stem": _conv_init(next(keys), cfg.kernel, cfg.n_mels, ch),
        "blocks": [
            {"c1": _conv_init(next(keys), cfg.kernel, ch, ch),
             "c2": _conv_init(next(keys), 1, ch, ch)}
            for _ in range(cfg.n_blocks)
        ],
        "head": _conv_init(next(keys), 1, ch, cfg.vocab + 1),
    }


def forward(params: dict, cfg: CTCConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, n_mels) log-compressed -> logits (B, ceil(T/2), vocab+1)."""
    pad = cfg.kernel // 2
    x = conv1d(mel, params["stem"]["w"], params["stem"]["b"], stride=2,
               padding=pad)
    x = jax.nn.gelu(x)
    for i, blk in enumerate(params["blocks"]):
        d = 2 ** i
        r = conv1d(x, blk["c1"]["w"], blk["c1"]["b"], padding=pad * d,
                   dilation=d)
        r = jax.nn.gelu(r)
        r = conv1d(r, blk["c2"]["w"], blk["c2"]["b"])
        x = x + r
    return conv1d(x, params["head"]["w"], params["head"]["b"])


def log_mel(cfg: CTCConfig, wav: np.ndarray) -> np.ndarray:
    """wav (T,) -> (frames, n_mels) log mel. Peak-normalized first: scored
    wavs come off disk peak-normalized (utils.audio.write_wav), training
    renders/channel outputs are raw floats — log-mel would otherwise differ
    by a global offset between the two."""
    wav = np.asarray(wav, np.float32)
    wav = wav / (np.abs(wav).max() + 1e-9)
    m = mel_spectrogram(jnp.asarray(wav)[None], sample_rate=cfg.sample_rate,
                        n_fft=cfg.n_fft, hop_length=cfg.hop,
                        win_length=cfg.n_fft, n_mels=cfg.n_mels,
                        f_max=cfg.sample_rate / 2.0)
    return np.asarray(jnp.log(jnp.maximum(m[0], 1e-5)).T)


def greedy_decode(logits: np.ndarray, n_valid: Optional[int] = None) -> str:
    """Best-path CTC decode: per-frame argmax, collapse repeats, drop blanks."""
    ids = np.argmax(np.asarray(logits), axis=-1)
    if n_valid is not None:
        ids = ids[:n_valid]
    out: List[int] = []
    prev = -1
    for i in ids:
        if i != prev and i != 0:
            out.append(int(i))
        prev = int(i)
    return sl.decode_labels(out)


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def _train_step(params, opt, cfg: CTCConfig, tx, mel, mel_pad, labels,
                label_pad):
    def loss_fn(p):
        logits = forward(p, cfg, mel)
        lp = mel_pad[:, ::2][:, : logits.shape[1]]
        return jnp.mean(optax.ctc_loss(logits, lp, labels, label_pad))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss


def make_training_bank(cfg: CTCConfig, texts: Sequence[str], n_speakers: int,
                       n_render: int, seed: int = 0,
                       channel: Optional[Callable] = None,
                       channel_prob: float = 1.0,
                       extra_pairs: Sequence[Tuple[str, np.ndarray]] = ()):
    """Render each text by several speakers/seeds -> padded static buffers.
    ``channel`` optionally distorts each render (e.g. a codec round-trip) so
    the ASR learns to read through the deployment channel it will score;
    ``channel_prob`` < 1 mixes in clean renders (clean copies teach the
    crisp code, channeled copies its deployment distortion). ``extra_pairs``
    appends pre-rendered (text, wav) pairs — e.g. an experiment's exact
    corpus renders, both clean and channeled — the corpus-calibration role
    a production ASR's training set plays for real speech.
    Returns (mel (N,T,F), mel_pad, labels (N,L), label_pad, texts_out)."""
    rng = np.random.default_rng(seed)
    mels, labs, outs = [], [], []
    for r in range(n_render):
        for text in texts:
            spk = int(rng.integers(0, n_speakers))
            wav = sl.render(text, cfg.sample_rate, speaker=spk,
                            seed=int(rng.integers(0, 2**31)))
            if channel is not None and rng.random() < channel_prob:
                wav = np.asarray(channel(wav), np.float32)
            mels.append(log_mel(cfg, wav))
            labs.append(sl.encode_text(text))
            outs.append(text)
    for text, wav in extra_pairs:
        mels.append(log_mel(cfg, np.asarray(wav, np.float32)))
        labs.append(sl.encode_text(text))
        outs.append(text)
    T = max(m.shape[0] for m in mels)
    T = T + (-T) % 2
    L = max(len(l) for l in labs)
    mel = np.zeros((len(mels), T, cfg.n_mels), np.float32)
    mel_pad = np.ones((len(mels), T), np.float32)
    labels = np.zeros((len(labs), L), np.int32)
    label_pad = np.ones((len(labs), L), np.float32)
    for i, (m, l) in enumerate(zip(mels, labs)):
        mel[i, : m.shape[0]] = m
        mel_pad[i, : m.shape[0]] = 0.0
        labels[i, : len(l)] = l
        label_pad[i, : len(l)] = 0.0
    return mel, mel_pad, labels, label_pad, outs


def train_ctc(cfg: CTCConfig, texts: Sequence[str], n_speakers: int = 4,
              n_render: int = 4, steps: int = 600, batch: int = 16,
              lr: float = 3e-4, seed: int = 0, log_every: int = 0,
              channel: Optional[Callable] = None,
              channel_prob: float = 1.0,
              extra_pairs: Sequence[Tuple[str, np.ndarray]] = ()
              ) -> Tuple[dict, List[float]]:
    """Train the CTC ASR on rendered texts. Returns (params, loss curve)."""
    mel, mel_pad, labels, label_pad, _ = make_training_bank(
        cfg, texts, n_speakers, n_render, seed, channel=channel,
        channel_prob=channel_prob, extra_pairs=extra_pairs)
    params = init_params(cfg, jax.random.key(seed))
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, 0.05))
    opt = tx.init(params)
    rng = np.random.default_rng(seed + 1)
    curve = []
    mel_j = jnp.asarray(mel)
    pad_j = jnp.asarray(mel_pad)
    lab_j = jnp.asarray(labels)
    lpad_j = jnp.asarray(label_pad)
    for i in range(steps):
        idx = jnp.asarray(rng.choice(mel.shape[0], batch,
                                     replace=batch > mel.shape[0]))
        params, opt, loss = _train_step(params, opt, cfg, tx, mel_j[idx],
                                        pad_j[idx], lab_j[idx], lpad_j[idx])
        if log_every and i % log_every == 0:
            curve.append(float(loss))
    curve.append(float(loss))
    return params, curve


def transcribe_array(params: dict, cfg: CTCConfig, wav: np.ndarray,
                     sr: int) -> str:
    from ..utils.audio import resample_linear

    wav = np.asarray(wav, np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=0)
    if sr != cfg.sample_rate:
        wav = resample_linear(wav[None], sr, cfg.sample_rate)[0]
    m = log_mel(cfg, wav)
    T = m.shape[0] + (-m.shape[0]) % 2
    mel = np.zeros((1, T, cfg.n_mels), np.float32)
    mel[0, : m.shape[0]] = m
    logits = forward(params, cfg, jnp.asarray(mel))
    return greedy_decode(np.asarray(logits[0]), n_valid=(m.shape[0] + 1) // 2)


def make_ctc_transcriber(params: dict, cfg: CTCConfig) -> Callable[[str], str]:
    """wav path -> text, pluggable into eval/harness.run_asr / wer_pipeline
    exactly where the reference plugs Whisper (ref tools/asr_test.py:47-99)."""
    from ..utils.audio import read_wav

    def transcribe(wav_path: str) -> str:
        audio, sr = read_wav(wav_path)
        return transcribe_array(params, cfg, audio, sr)

    return transcribe
