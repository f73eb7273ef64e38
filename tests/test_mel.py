"""Mel frontend: STFT vs torch.stft oracle; filterbank vs slaney formulas;
sine-tone sanity."""
import numpy as np
import pytest

import jax.numpy as jnp

from kalle_tpu.ops.mel import (
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    modify_vector,
    stft_mag,
)

torch = pytest.importorskip("torch")


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4000)).astype(np.float32)
    n_fft, hop = 512, 128
    ours = np.asarray(stft_mag(jnp.asarray(x), n_fft, hop, n_fft, power=1.0))
    ref = torch.stft(torch.tensor(x), n_fft, hop, n_fft,
                     torch.hann_window(n_fft), center=True,
                     pad_mode="reflect", return_complex=True).abs().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_mel_tone_peak():
    """A 1 kHz tone at 16 kHz must peak in the mel bin containing 1 kHz."""
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    mel = np.asarray(mel_spectrogram(jnp.asarray(x), sample_rate=sr))
    assert mel.shape[1] == 80
    peak_bin = mel[0].mean(-1).argmax()
    fb = mel_filterbank(513, 80, sr, 0, 8000)
    freqs = np.linspace(0, sr / 2, 513)
    center = freqs[fb[:, peak_bin].argmax()]
    assert 850 < center < 1150, center


def test_filterbank_slaney_norm():
    fb = mel_filterbank(513, 80, 16000, 0, 8000)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # slaney-normalized triangles have peak ~ 2/width, not 1
    assert fb.max() < 1.0


def test_modify_vector():
    mel = jnp.ones((1, 80, 120))
    out = modify_vector(mel, 200)
    assert out.shape == (1, 80, 200)
    out2 = modify_vector(jnp.ones((1, 80, 300)), 200)
    assert out2.shape == (1, 80, 200)
