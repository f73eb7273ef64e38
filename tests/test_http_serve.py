"""Stdlib streaming TTS server (serve/http.py): HTTP surface with a fake
stream_fn, and the real make_stream_fn end-to-end on the tiny model —
the dependency-free replacement for the reference's gradio web layer
(ref tools/web_nos.py, backup/web.py:145 chunk header)."""
import dataclasses
import threading
import urllib.error
import urllib.request

import numpy as np
import jax

from kalle_tpu.core.config import LlamaConfig, LlasaConfig
from kalle_tpu.serve.http import make_stream_fn, serve_http
from kalle_tpu.serve.web import wav_chunk_header


def _start(stream_fn, sr=24000):
    srv = serve_http(stream_fn, sample_rate=sr, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_http_surface_with_fake_stream():
    chunks = [np.full(100, 1000, "<i2").tobytes(),
              np.full(50, -2000, "<i2").tobytes()]
    srv, base = _start(lambda text: iter(chunks))
    try:
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"<html" in page and b"/tts" in page

        health = urllib.request.urlopen(base + "/healthz", timeout=10).read()
        assert b"true" in health

        body = urllib.request.urlopen(base + "/tts?text=hi", timeout=10).read()
        hdr = wav_chunk_header(24000)
        assert body[: len(hdr)] == hdr
        assert body[len(hdr):] == b"".join(chunks)

        # missing text -> 400
        try:
            urllib.request.urlopen(base + "/tts", timeout=10)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown path -> 404
        try:
            urllib.request.urlopen(base + "/nope", timeout=10)
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def _tiny_stream(maxf=6, batch_size=2):
    from kalle_tpu.data.tokens import build_tokenizer
    from kalle_tpu.infer.pipeline import Codec
    from kalle_tpu.models.codecs.sigmavae import SigmaVAEConfig
    from kalle_tpu.models.lm import llasa

    codec = Codec.random_init("sigma", cfg=SigmaVAEConfig.tiny())
    cfg = LlasaConfig(llama=LlamaConfig.tiny(),
                      latent_dim=codec.cfg.latent_dim, audio_proj_dim=64,
                      head_variant="sigma")
    cfg = dataclasses.replace(cfg, end_kl_threshold=-1.0)
    tok = build_tokenizer(None)
    params = llasa.init_params(cfg, jax.random.key(0))
    stream = make_stream_fn(params, cfg, tok, codec, chunk_frames=2,
                            max_frames=maxf, greedy=True,
                            batch_size=batch_size)
    return stream, codec


def test_make_stream_fn_end_to_end():
    """Real tiny model through the shared BatcherService: the streamed PCM
    must cover every emitted frame exactly once (chunk boundaries decoded
    with left context, new samples only)."""
    maxf = 6
    stream, codec = _tiny_stream(maxf)
    try:
        chunks = list(stream("hello world"))
        assert len(chunks) >= 2  # incremental, not one blob
        pcm = np.frombuffer(b"".join(chunks), "<i2")
        # maxf-1 emitted frames (final frame discarded), spf samples each
        assert len(pcm) == (maxf - 1) * codec.samples_per_frame
        assert np.isfinite(pcm.astype(np.float32)).all()

        # second request reuses the SAME service/batcher
        pcm2 = np.frombuffer(b"".join(stream("another")), "<i2")
        assert len(pcm2) == (maxf - 1) * codec.samples_per_frame
    finally:
        stream.service.close()


def test_concurrent_http_clients_share_batcher():
    """Two simultaneous /tts requests must BOTH stream complete audio and
    must share the service's single batcher (total decode steps ~ one
    generation, not two in sequence — the round-4 composition fix)."""
    maxf = 6
    stream, codec = _tiny_stream(maxf, batch_size=2)
    srv, base = _start(stream)
    try:
        results, errs = {}, []

        def client(i):
            try:
                body = urllib.request.urlopen(
                    base + f"/tts?text=req{i}", timeout=300).read()
                results[i] = body
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=client, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert not errs, errs
        hdr = wav_chunk_header(24000)
        for i in range(2):
            assert results[i][: len(hdr)] == hdr
            pcm = np.frombuffer(results[i][len(hdr):], "<i2")
            assert len(pcm) == (maxf - 1) * codec.samples_per_frame
        # shared batch: serial would be ~2*maxf steps
        assert stream.service.cb.step_count <= maxf + 4, \
            stream.service.cb.step_count
    finally:
        srv.shutdown()
        stream.service.close()
