"""Round-2 parity-hole sweep: melvae cache dataset, ffmpeg decode fallback,
ZH ASR factory dispatch, flow-reversal decode (VERDICT r1 items)."""
import os
import stat
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# MelVAECacheDataset — cache next to the wav (ref melvae/twj_dataset_offline
# .py:123-138), plus cache-on-first-encode
# ---------------------------------------------------------------------------

def test_melvae_cache_dataset(tmp_path):
    from kalle_tpu.data.datasets import MelVAECacheDataset
    from kalle_tpu.data.tokens import build_tokenizer
    from kalle_tpu.utils.audio import write_wav

    sr, dim, frames = 16000, 4, 10
    wav = np.random.default_rng(0).normal(size=(1, sr)).astype(np.float32) * .3
    speech = str(tmp_path / "utt0.wav")
    write_wav(speech, wav, sr)

    calls = []

    def encode_fn(x):
        calls.append(x.shape)
        rng = np.random.default_rng(1)
        return rng.normal(size=(1, 2 * dim, frames)).astype(np.float32)

    rows = [{"id": "utt0", "caption": "hello", "speech": speech}]
    ds = MelVAECacheDataset(rows, build_tokenizer(), encode_fn,
                            target_sr=sr, seed=0)
    item = ds[0]
    assert item.audio_latents.shape == (frames, dim)
    assert item.audio_distribution.shape == (frames, 2 * dim)
    cache = str(tmp_path / "utt0.melvae.npy")
    assert os.path.exists(cache)
    assert len(calls) == 1 and calls[0] == (1, 1, sr)

    # second access loads the cache — encoder NOT called again
    item2 = ds[0]
    assert len(calls) == 1
    # distribution (mean||logs) identical; sampled latents differ (fresh eps)
    np.testing.assert_array_equal(item2.audio_distribution,
                                  item.audio_distribution)

    # pre-existing cache is honored without any encode
    calls.clear()
    ds2 = MelVAECacheDataset(rows, build_tokenizer(), encode_fn,
                             target_sr=sr, seed=0)
    _ = ds2[0]
    assert calls == []


# ---------------------------------------------------------------------------
# ffmpeg-subprocess decode fallback (ref twj_dataset.py:234-237 librosa)
# ---------------------------------------------------------------------------

def test_decode_audio_bytes_ffmpeg_fallback(tmp_path, monkeypatch):
    from kalle_tpu.data import online

    target_sr = 8000
    expected = (np.arange(16, dtype=np.float32) / 16.0)
    raw = expected.tobytes()
    out_file = tmp_path / "payload.bin"
    out_file.write_bytes(raw)

    fake = tmp_path / "ffmpeg"
    fake.write_text(f"#!/bin/sh\ncat {out_file}\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    wav = online.decode_audio_bytes(b"\xffNOTAWAV-mp3-like-bytes", target_sr)
    assert wav.shape == (1, 16)
    np.testing.assert_allclose(wav[0], expected)


def test_decode_audio_bytes_ffmpeg_missing(monkeypatch, tmp_path):
    from kalle_tpu.data import online

    monkeypatch.setenv("PATH", str(tmp_path))  # no ffmpeg anywhere
    with pytest.raises(RuntimeError, match="ffmpeg"):
        online.decode_audio_bytes(b"\xff\xfbgarbage-mp3", 8000)


# ---------------------------------------------------------------------------
# ZH Paraformer factory + language dispatch (ref tools/asr_test.py:28-50)
# ---------------------------------------------------------------------------

def test_make_transcriber_zh_dispatch(monkeypatch):
    from kalle_tpu.eval import harness

    generated = []

    class FakeModel:
        def __init__(self, **kw):
            self.kw = kw

        def generate(self, input, batch_size_s):
            generated.append(input)
            if input == "boom.wav":
                raise RuntimeError("decode error")
            return [{"text": "繁體字 hello"}]

    fake_funasr = types.ModuleType("funasr")
    fake_funasr.AutoModel = FakeModel
    monkeypatch.setitem(sys.modules, "funasr", fake_funasr)

    tr = harness.make_transcriber("zh")
    out = tr("a.wav")
    assert "hello" in out and generated == ["a.wav"]
    # reference degrades errors to "" (asr_test.py:92-94)
    assert tr("boom.wav") == ""

    with pytest.raises(ValueError, match="unsupported"):
        harness.make_transcriber("fr")


def test_run_asr_uses_lang_for_default_backend(tmp_path, monkeypatch):
    from kalle_tpu.eval import harness

    monkeypatch.setattr(harness, "make_transcriber",
                        lambda lang: (lambda p: f"[{lang}] text"))
    wav_dir = str(tmp_path)
    from kalle_tpu.utils.audio import write_wav

    write_wav(os.path.join(wav_dir, "u1---gen.wav"),
              np.zeros((1, 100), np.float32), 16000)
    meta = [harness.MetaItem("u1", "p", "p.wav", "ground truth")]
    gt, hyp = harness.run_asr("zh", wav_dir, meta, transcriber=None)
    # clean_text strips the brackets; the lang tag itself must survive
    assert "zh text" in open(hyp).read()


# ---------------------------------------------------------------------------
# flow-reversal decode reachable from the Codec facade
# ---------------------------------------------------------------------------

def test_codec_decode_flow_reverse():
    from kalle_tpu.infer.pipeline import Codec
    from kalle_tpu.models.codecs import melvae

    codec = Codec.random_init("melvae", cfg=melvae.MelVAEConfig.tiny())
    # random init keeps the coupling flow at identity (zero-init post conv,
    # flows.py:739-740); perturb it so the reversal is observable
    key = jax.random.key(7)
    codec.params["flows"] = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(key, x.shape, x.dtype),
        codec.params["flows"])
    d = codec.cfg.latent_dim
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, d)),
                      jnp.float32)
    plain = codec.decode_latents(lat, jax.random.key(0))
    reversed_ = codec.decode_latents(lat, jax.random.key(0),
                                     flow_reverse=True)
    assert plain.shape == reversed_.shape
    assert not np.allclose(plain, reversed_)  # the flow actually ran
    # and the flow inversion is exact: flow(flow^-1(z)) == z
    z = jnp.transpose(lat, (0, 2, 1))
    back = melvae.flow(codec.params, codec.cfg,
                       melvae.flow(codec.params, codec.cfg, z, reverse=True))
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-4)


def test_alias_free_filter_cache_no_tracer_leak():
    """The kaiser-sinc filter cache must hold numpy, not jnp: a jnp array
    materialized during a jit trace is a tracer, and caching it poisons
    every later trace (the order-dependent UnexpectedTracerError seen in
    the round-2 full-suite run)."""
    from kalle_tpu.ops import alias_free

    alias_free._up_filter.cache_clear()
    x = jnp.ones((1, 16, 3), jnp.float32)
    jitted = jax.jit(lambda a: alias_free.upsample1d(a, 2))
    jitted(x)  # populates the cache from INSIDE a trace
    out = alias_free.upsample1d(x, 2)  # eager reuse must still work
    assert np.isfinite(np.asarray(out)).all()
    assert isinstance(alias_free._up_filter(2, 12), np.ndarray)
