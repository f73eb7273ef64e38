"""Gradio web demo.

Reference: tools/web_nos.py / backup/web.py — a Gradio app wrapping the
single-utterance inference API: text normalize, optional reference audio,
error HTML (ref tools/web_nos.py:57-63), input-audio validity checking via
ffmpeg (ref :112-140), and the streaming wav chunk-header helper
(ref backup/web.py:145 wav_chunk_header). gradio is an optional dep
(not in this image); `build_app` raises a clear error without it, and
every other helper is importable standalone.
"""
from __future__ import annotations

import html
import io
import os
import struct
import subprocess
import tempfile
import wave
from typing import Callable, Optional

import numpy as np


def wav_chunk_header(sample_rate: int = 24000, bits: int = 16,
                     channels: int = 1, data_size: int = 0x7FFFFFFF - 36) -> bytes:
    """Streaming WAV header with an (effectively) unbounded data size —
    lets a browser start playback before synthesis finishes
    (ref backup/web.py:145)."""
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + data_size), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                             byte_rate, block_align, bits),
        b"data", struct.pack("<I", data_size),
    ])


def normalize_text(text: str) -> str:
    """Light text normalization matching the demo's preprocessing."""
    return " ".join(text.strip().split())


def build_html_error_message(error) -> str:
    """Red bold error div, html-escaped (ref tools/web_nos.py:57-63)."""
    return f"""
    <div style="color: red;
    font-weight: bold;">
        {html.escape(str(error))}
    </div>
    """


def check_audio_validity(wav_data: bytes) -> bool:
    """Validate uploaded audio bytes before handing them to the pipeline
    (ref tools/web_nos.py:112-140: temp file -> `ffmpeg -v error -i f
    -f null -` -> bool). When ffmpeg is absent from the image, fall back
    to a stdlib `wave` header+frames parse — same contract (corrupt or
    non-audio bytes -> False), weaker codec coverage (wav only)."""
    with tempfile.NamedTemporaryFile(delete=False, suffix=".wav") as tmp:
        tmp.write(wav_data)
        name = tmp.name
    try:
        try:
            subprocess.run(
                ["ffmpeg", "-v", "error", "-i", name, "-f", "null", "-"],
                check=True, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            return True
        except FileNotFoundError:
            try:
                with wave.open(name, "rb") as w:
                    return w.getnframes() >= 0 and w.getframerate() > 0
            except Exception:
                return False
        except subprocess.CalledProcessError:
            return False
    finally:
        if os.path.exists(name):
            os.remove(name)


def make_safe_synthesize_fn(infer_tools, max_frames: int = 200) -> Callable:
    """The demo-facing wrapper: returns ((sr, wav), "no error") on success
    and (None, "error:<msg>") on failure, never raising into gradio
    (ref tools/web_nos.py:66-109 inference try/except contract)."""
    synthesize = make_synthesize_fn(infer_tools, max_frames)

    def safe(reference_audio, reference_text, text,
             enable_reference_audio=False):
        try:
            if not normalize_text(text):
                raise ValueError("empty text")
            return (synthesize(reference_audio, reference_text, text,
                               enable_reference_audio), "no error")
        except Exception as e:  # noqa: BLE001 — demo boundary
            return None, f"error:{e}"

    return safe


def make_synthesize_fn(infer_tools, max_frames: int = 200) -> Callable:
    """(reference_audio, reference_text, text, enable_reference) -> (sr, wav)
    — the inference closure the gradio app binds
    (ref tools/web_nos.py:66-90)."""

    def synthesize(reference_audio, reference_text, text,
                   enable_reference_audio=False):
        text = normalize_text(text)
        prompt_latents = None
        if enable_reference_audio and reference_audio is not None:
            sr, wav = reference_audio
            wav = np.asarray(wav, np.float32)
            if wav.ndim == 1:
                wav = wav[None]
            if np.abs(wav).max() > 1.5:  # int16 input
                wav = wav / 32768.0
            import jax.numpy as jnp

            from ..utils.audio import resample_linear

            wav = resample_linear(wav, sr, infer_tools.codec.sample_rate)
            z = np.asarray(infer_tools.codec.encode_audio(jnp.asarray(wav[None])))[0]
            if infer_tools.codec.kind == "sigma":
                prompt_latents = z  # sigma encode is already (T, d)
            else:
                # stableaudio/melvae encode is channel-first (2d, T)
                # mean||scale: prompt-condition on the means, time-first
                d = infer_tools.cfg.latent_dim
                prompt_latents = z[:d].T
        audio = infer_tools.synthesize(text, max_frames=max_frames,
                                       prompt_latents=prompt_latents)
        sr = infer_tools.codec.sample_rate
        mono = np.asarray(audio)[0]
        return sr, (np.clip(mono, -1, 1) * 32767).astype(np.int16)

    return synthesize


def build_app(infer_tools, max_frames: int = 200):
    """Gradio Blocks app (requires `gradio`)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this image; "
            "`pip install gradio` to serve the web demo") from e

    synthesize = make_safe_synthesize_fn(infer_tools, max_frames)
    with gr.Blocks(title="kalle_tpu TTS") as app:
        gr.Markdown("# kalle_tpu — continuous-latent speech LM (TPU)")
        with gr.Row():
            with gr.Column():
                ref_audio = gr.Audio(label="Reference audio (optional)")
                ref_text = gr.Textbox(label="Reference text")
                enable_ref = gr.Checkbox(label="Use reference audio")
                text = gr.Textbox(label="Text to synthesize")
                btn = gr.Button("Synthesize")
            with gr.Column():
                out = gr.Audio(label="Generated audio")
                err = gr.Text(label="Error message", visible=True)
        btn.click(synthesize, [ref_audio, ref_text, text, enable_ref],
                  [out, err])
    return app
