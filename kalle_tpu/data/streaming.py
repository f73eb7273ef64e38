"""Streaming-interleave dataset collation (text/audio lockstep with delay).

Reference: Stream_TTSDataset_online_lance (backup/dy_dataset.py:684-871):
  * wav zero-padded at the FRONT by delay_frames worth of samples (:795-807)
  * whole batch encoded through the frozen codec -> mean||logs stack
  * input latents = sampled z shifted [:, :, :-1]; labels = stack [:, :, 1:]
  * text ids padded with pad_token to max_length = T_latent - 1
  * mel (ECAPA input) cropped/tiled to 200 frames; speaker dropout flags

Here the codec encode runs on device through OnlineEncoder and the mel
frontend is the on-device GEMM STFT.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..ops.mel import mel_spectrogram, modify_vector
from .datasets import vae_sample


class StreamingCollator:
    def __init__(self, encoder, tokenizer, delay_frames: int,
                 frame_hz: float, spk_drop_prob: float = 0.0,
                 mel_sample_rate: int = 16000, seed: int = 0):
        self.encoder = encoder  # data.online.OnlineEncoder
        self.tokenizer = tokenizer
        self.delay_frames = delay_frames
        self.frame_hz = frame_hz
        self.spk_drop_prob = spk_drop_prob
        self.mel_sample_rate = mel_sample_rate
        self.rng = np.random.default_rng(seed)

    def __call__(self, batch: List[Dict]) -> Optional[Dict[str, np.ndarray]]:
        """batch items: {"input_ids": (s,) int, "wav": (1, T) float at codec
        sr, "mel_wav": optional (1, T16k) float for the speaker mel}."""
        import jax.numpy as jnp

        b = len(batch)
        sr = self.encoder.sample_rate
        delay_n = int(self.delay_frames * (sr // self.frame_hz))
        max_wav = max(it["wav"].shape[-1] for it in batch)
        final = int(max_wav + delay_n)

        wavs = []
        for it in batch:
            w = np.zeros((1, final), np.float32)
            w[0, delay_n: delay_n + it["wav"].shape[-1]] = it["wav"][0]
            wavs.append(w)
        stacks = self.encoder.encode_batch(wavs)  # list of (2d, T')
        t_lat = min(s.shape[-1] for s in stacks)
        stack = np.stack([s[:, :t_lat] for s in stacks])  # (b, 2d, T')
        d2 = stack.shape[1]
        mean, logs = stack[:, : d2 // 2], stack[:, d2 // 2:]
        z = self.rng.standard_normal(mean.shape).astype(np.float32) * \
            np.exp(logs) + mean

        max_length = t_lat - 1
        if max_length <= max(it["input_ids"].shape[0] for it in batch) - 1:
            # reference asserts latents longer than text (dy_dataset.py:826)
            return None

        input_ids = np.full((b, max_length), self.tokenizer.pad_token_id,
                            np.int32)
        mels = []
        keep = np.ones((b,), bool)
        for i, it in enumerate(batch):
            s = min(it["input_ids"].shape[0], max_length)
            input_ids[i, :s] = it["input_ids"][:s]
            if self.rng.random() < self.spk_drop_prob:
                keep[i] = False
            mw = it.get("mel_wav", it["wav"])
            mel = mel_spectrogram(jnp.asarray(mw),
                                  sample_rate=self.mel_sample_rate)
            mels.append(np.asarray(modify_vector(mel, 200))[0])

        return {
            "input_ids": input_ids,
            "audio_latents": np.transpose(z[:, :, :-1], (0, 2, 1)),
            "distribute_labels": np.transpose(stack[:, :, 1:], (0, 2, 1)),
            "mels": np.stack(mels),
            "speaker_cond_keep": keep,
            "attention_mask": np.ones((b, max_length), np.int32),
            "target_mask": np.ones((b, max_length), bool),
            "end_mask": np.zeros((b, max_length), bool),
        }
