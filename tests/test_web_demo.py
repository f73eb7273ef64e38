"""Web-demo wiring smoke (ref tools/web_nos.py): executes build_app with a
stubbed gradio module (gradio isn't in this image), and pins the
ffmpeg/wave validity check + error-message contract (ref :57-63,66-109,
112-140)."""
import io
import struct
import sys
import types
import wave

import numpy as np
import pytest

from kalle_tpu.serve import web


# ------------------------------------------------------------ gradio stub


class _Ctx:
    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Component:
    def __init__(self, *a, **k):
        self.kwargs = k


class _Button(_Component):
    clicks = []

    def click(self, fn, inputs, outputs):
        _Button.clicks.append((fn, inputs, outputs))


def _gradio_stub():
    gr = types.ModuleType("gradio")
    gr.Blocks = _Ctx
    gr.Row = _Ctx
    gr.Column = _Ctx
    gr.Markdown = _Component
    gr.Audio = _Component
    gr.Textbox = _Component
    gr.Checkbox = _Component
    gr.Button = _Button
    gr.Text = _Component
    return gr


class _FakeCodec:
    kind = "sigma"
    sample_rate = 16000

    def encode_audio(self, wav):
        w = np.asarray(wav)[0]  # (1, T) from the (B, 1, T) input
        t = max(w.shape[-1] // 100, 1)
        means = w[0, : t * 100].reshape(t, 100).mean(-1, keepdims=True)
        return (means * np.ones((1, 4)))[None]  # (B, T, d) sigma layout


class _FakeTools:
    codec = _FakeCodec()
    cfg = types.SimpleNamespace(latent_dim=4)

    def __init__(self, fail=False):
        self.fail = fail
        self.calls = []

    def synthesize(self, text, max_frames=200, prompt_latents=None):
        if self.fail:
            raise RuntimeError("decode exploded")
        self.calls.append((text, max_frames,
                           None if prompt_latents is None
                           else np.asarray(prompt_latents).shape))
        return np.zeros((1, 1600), np.float32)


# ----------------------------------------------------------------- tests


def test_build_app_executes_with_stub(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", _gradio_stub())
    _Button.clicks = []
    app = web.build_app(_FakeTools(), max_frames=64)
    assert app is not None
    # the click wiring exists: 4 inputs, (audio, error) outputs
    assert len(_Button.clicks) == 1
    fn, inputs, outputs = _Button.clicks[0]
    assert len(inputs) == 4 and len(outputs) == 2
    # and the bound fn runs end to end through the safe wrapper
    (sr, wav), err = fn(None, "", "hello world", False)
    assert sr == 16000 and wav.dtype == np.int16
    assert err == "no error"


def test_build_app_without_gradio_raises(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", None)
    with pytest.raises(ImportError, match="gradio"):
        web.build_app(_FakeTools())


def test_safe_synthesize_error_contract():
    """(None, 'error:...') instead of an exception into the UI
    (ref tools/web_nos.py:85-87,107-109)."""
    safe = web.make_safe_synthesize_fn(_FakeTools(fail=True))
    out, err = safe(None, "", "hello", False)
    assert out is None
    assert err.startswith("error:") and "decode exploded" in err
    # empty text is rejected up front
    out, err = web.make_safe_synthesize_fn(_FakeTools())(None, "", "   ",
                                                         False)
    assert out is None and err.startswith("error:")


def test_safe_synthesize_with_reference_audio():
    tools = _FakeTools()
    safe = web.make_safe_synthesize_fn(tools, max_frames=32)
    ref = (8000, (np.sin(np.arange(8000) / 20.0) * 32767).astype(np.int16))
    (sr, wav), err = safe(ref, "ref text", "say this", True)
    assert err == "no error"
    text, max_frames, prompt_shape = tools.calls[-1]
    assert text == "say this" and max_frames == 32
    assert prompt_shape is not None  # prompt latents flowed through


def test_html_error_message_escapes():
    msg = web.build_html_error_message("<script>alert(1)</script> & x")
    assert "<script>" not in msg
    assert "&lt;script&gt;" in msg and "&amp;" in msg
    assert "color: red" in msg


def _wav_bytes(sr=16000, n=1600):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.zeros(n, np.int16).tobytes())
    return buf.getvalue()


def test_check_audio_validity_good_and_bad():
    assert web.check_audio_validity(_wav_bytes()) is True
    assert web.check_audio_validity(b"not audio at all") is False
    # truncated header
    assert web.check_audio_validity(_wav_bytes()[:16]) is False


def test_wav_chunk_header_roundtrip():
    hdr = web.wav_chunk_header(sample_rate=24000, bits=16, channels=1)
    assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
    sr = struct.unpack("<I", hdr[24:28])[0]
    assert sr == 24000
