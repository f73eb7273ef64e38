"""Online-encoding dataset: raw audio -> codec latents at load time.

Reference: TTSDataset_online_parquet (twj_dataset.py:131-341) reads
HF-parquet rows (`audio.bytes`, `text_normalized`, `id`), librosa-decodes
to 44.1 kHz mono, normalizes x0.95, duplicates to fake stereo, and encodes
through the frozen Oobleck VAE INSIDE __getitem__ — on the CPU, in
dataloader workers (twj_dataset.py:219-288).

TPU-first redesign (SURVEY.md §7 hard parts): the host side only decodes/
normalizes audio; codec encoding runs ON DEVICE in batched jitted calls
(`OnlineEncoder.encode_batch`) between host prefetch and the train step —
preserving the latent distribution while moving the conv stack to the MXU.
"""
from __future__ import annotations

import io
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..utils.audio import read_wav, resample_linear
from .collate import Item
from .tokens import build_prompt_ids


def read_parquet(paths) -> "object":
    """Reconstruction of the missing twj_utils.read_parquet (broken symlink;
    call site twj_dataset.py:171): concatenated pandas frame over parquet
    shards."""
    import pandas as pd

    if isinstance(paths, str):
        paths = [paths]
    frames = [pd.read_parquet(p) for p in paths]
    return pd.concat(frames, ignore_index=True)


def _decode_via_ffmpeg(data: bytes, target_sr: int) -> np.ndarray:
    """bytes (any container ffmpeg knows: mp3/flac/ogg/m4a/...) ->
    (1, T) float32 mono at target_sr via an ffmpeg subprocess. Replaces the
    reference's librosa.load catch-all (ref twj_dataset.py:234-237) without
    the librosa/soundfile dependency."""
    import shutil
    import subprocess

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            "non-WAV audio and neither soundfile nor ffmpeg available")
    proc = subprocess.run(
        [ffmpeg, "-v", "error", "-i", "pipe:0", "-f", "f32le", "-ac", "1",
         "-ar", str(target_sr), "pipe:1"],
        input=data, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        check=False)
    if proc.returncode != 0 or not proc.stdout:
        raise RuntimeError(
            f"ffmpeg decode failed: {proc.stderr.decode(errors='replace')[:500]}")
    wav = np.frombuffer(proc.stdout, np.float32).copy()
    return wav[None, :]


def decode_audio_bytes(data: bytes, target_sr: int) -> np.ndarray:
    """bytes -> (1, T) float32 mono at target_sr. WAV via stdlib/soundfile;
    other formats fall back to an ffmpeg subprocess (the librosa-decode
    equivalent of ref twj_dataset.py:234-237)."""
    try:
        import soundfile as sf

        wav, sr = sf.read(io.BytesIO(data), dtype="float32", always_2d=True)
        wav = wav.T
    except Exception:
        if data[:4] == b"RIFF":
            import tempfile, os

            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(data)
                path = f.name
            try:
                wav, sr = read_wav(path)
            finally:
                os.unlink(path)
        else:
            return _decode_via_ffmpeg(data, target_sr)  # already resampled
    wav = wav.mean(axis=0, keepdims=True)
    return resample_linear(wav, sr, target_sr)


def normalize_peak(wav: np.ndarray, gain: float = 0.95) -> np.ndarray:
    """librosa.util.normalize * 0.95 equivalent (twj_dataset.py:235)."""
    peak = np.abs(wav).max()
    return (wav / peak * gain).astype(np.float32) if peak > 0 else wav


class OnlineEncoder:
    """Batched on-device codec encoding for the online dataset path."""

    def __init__(self, codec, sample_rate: Optional[int] = None,
                 fake_stereo: Optional[bool] = None):
        self.codec = codec  # infer.pipeline.Codec
        self.sample_rate = sample_rate or codec.sample_rate
        # the Oobleck path duplicates mono to fake stereo (twj_dataset.py:275)
        self.fake_stereo = (codec.kind == "stableaudio"
                            if fake_stereo is None else fake_stereo)

    def encode_batch(self, wavs: List[np.ndarray]) -> List[np.ndarray]:
        """wavs: list of (1, T) mono float32 (already at codec sr) ->
        list of channel-first (C, T') stacks, batched on device with right
        zero-padding (trimmed back per item). C = 2*latent (mean||scale)
        for stableaudio/melvae; C = latent (means only) for sigma."""
        import jax.numpy as jnp

        ratio = getattr(self.codec.cfg, "downsampling_ratio",
                        getattr(self.codec.cfg, "hop", 1))
        lens = [w.shape[-1] for w in wavs]
        pad_to = max(-(-max(lens) // ratio) * ratio, ratio)
        batch = np.zeros((len(wavs), 2 if self.fake_stereo else 1, pad_to),
                         np.float32)
        for i, w in enumerate(wavs):
            x = np.repeat(w, 2, axis=0) if self.fake_stereo else w
            batch[i, :, :lens[i]] = x
        z = np.asarray(self.codec.encode_audio(jnp.asarray(batch)))
        if self.codec.kind == "sigma":  # sigma encode returns (B, T', d)
            z = np.transpose(z, (0, 2, 1))
        out = []
        for i, ln in enumerate(lens):
            t = max(ln // ratio, 1)
            out.append(z[i, :, :t])
        return out


class OnlineAudioDataset:
    """Parquet/jsonl rows with raw audio -> Items with freshly encoded
    latents. Mirrors TTSDataset_online_parquet's text packing and
    vae_sample semantics; the encode itself is deferred to OnlineEncoder."""

    def __init__(self, rows, tokenizer, encoder: OnlineEncoder,
                 text_key: str = "text_normalized",
                 audio_key: str = "audio", seed: int = 0,
                 max_length: int = 2048):
        self.rows = rows
        self.tokenizer = tokenizer
        self.encoder = encoder
        self.text_key = text_key
        self.audio_key = audio_key
        self.rng = np.random.default_rng(seed)
        self.max_length = max_length

    def __len__(self):
        return len(self.rows)

    def _row(self, idx):
        if hasattr(self.rows, "iloc"):
            return self.rows.iloc[idx]
        return self.rows[idx]

    def load_audio(self, idx: int) -> np.ndarray:
        row = self._row(idx)
        audio = row[self.audio_key]
        data = audio["bytes"] if isinstance(audio, dict) else audio
        wav = decode_audio_bytes(data, self.encoder.sample_rate)
        return normalize_peak(wav)

    def make_items(self, idxs: Sequence[int]) -> List[Item]:
        """Batched: decode on host, encode on device, pack Items."""
        from .datasets import vae_sample

        wavs = [self.load_audio(i) for i in idxs]
        stacks = self.encoder.encode_batch(wavs)  # (C, T') each
        items = []
        for i, z in zip(idxs, stacks):
            row = self._row(i)
            text = str(row[self.text_key])
            ids = np.asarray(build_prompt_ids(self.tokenizer, text), np.int32)
            if self.encoder.codec.kind == "sigma":
                # sigma: z is means (d, T'); labels == means, noising is
                # the model's job (ref model_sigmaVAE.py:68)
                lat_td = z.T.astype(np.float32)
                dist_td = lat_td.copy()
            else:
                d2 = z.shape[0]
                mean, scale = z[: d2 // 2], z[d2 // 2:]
                lat, _ = vae_sample(mean[None], scale[None], self.rng)
                lat_td = lat[0].T.astype(np.float32)       # (T', d)
                dist_td = z.T.astype(np.float32)           # (T', 2d)
            items.append(Item(
                input_ids=ids,
                audio_latents=lat_td,
                audio_distribution=dist_td,
                raw_text=text,
                speech_path=str(row.get("id", i)) if hasattr(row, "get") else str(i),
            ))
        return items
