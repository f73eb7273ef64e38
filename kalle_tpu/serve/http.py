"""Dependency-free streaming TTS HTTP server.

The reference's web layer is a gradio app (ref tools/web_nos.py,
backup/web.py) — unusable in images without gradio, and single-request
(one GPU decode at a time). This module serves the same synthesize flow
over the stdlib `http.server` and goes further on the serving design:

  * ALL requests share ONE persistent ContinuousBatcher on a background
    decode thread (serve/service.BatcherService) — N concurrent /tts
    clients ride the same B-row decode batch with mid-decode admission,
    so the b>=8 fused decode-attention gate engages under load instead of
    serializing on a per-request lock.
  * responses STREAM the wav: the unbounded-size chunk header
    (serve/web.wav_chunk_header, ref backup/web.py:145) goes out first and
    PCM chunks follow as the LM decodes — a browser's <audio> element
    starts playback at the first chunk.

Endpoints:
  GET /            — minimal HTML demo page (form + <audio>)
  GET /tts?text=…  — chunked audio/wav stream
  GET /healthz     — liveness probe

Codec chunks re-decode with left context so conv receptive fields span
chunk boundaries (same scheme as tools/serve_batch.py --stream). A stalled
client only stalls its own handler thread (60 s socket timeout) — decode
for the other rows continues.
"""
from __future__ import annotations

import json
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Iterator

import numpy as np

from .web import normalize_text, wav_chunk_header

_PAGE = """<!doctype html>
<html><head><title>kalle_tpu TTS</title></head>
<body style="font-family: sans-serif; max-width: 40em; margin: 2em auto">
<h1>kalle_tpu &mdash; streaming TTS</h1>
<form onsubmit="p.src='/tts?text='+encodeURIComponent(t.value);p.play();return false">
<input id="t" size="60" placeholder="Text to synthesize">
<button>Synthesize</button></form>
<audio id="p" controls autoplay></audio>
</body></html>"""


def make_stream_fn(params, cfg, tokenizer, codec, chunk_frames: int = 25,
                   max_frames: int = 200, stream_ctx: int = 8,
                   greedy: bool = False, batch_size: int = 8,
                   service=None) -> Callable[[str], Iterator[bytes]]:
    """text -> iterator of int16 PCM chunks (LM decode + codec decode both
    incremental). Every call shares ONE BatcherService decode batch —
    concurrent calls are admitted into free rows of the same batcher, not
    serialized. The service is exposed as `stream.service` (callers close()
    it on shutdown; tests inspect its batcher)."""
    import jax.numpy as jnp

    from ..data.tokens import build_prompt_ids
    from .service import BatcherService

    svc = service or BatcherService(
        params, cfg, batch_size=batch_size, max_frames=max_frames,
        chunk_frames=chunk_frames, greedy=greedy)
    spf = codec.samples_per_frame
    sigma = cfg.head_variant == "sigma"

    def stream(text: str) -> Iterator[bytes]:
        ids = np.asarray(build_prompt_ids(tokenizer, normalize_text(text)),
                         np.int32)
        rid, q = svc.submit(ids)
        del rid
        buf = np.zeros((0, cfg.latent_dim), np.float32)
        while True:
            ev = q.get()
            if ev is None:
                break
            kind, payload = ev
            if kind == "error":
                raise payload
            if kind != "chunk":
                continue  # "done" — frames already streamed via chunks
            lat = payload.samples if sigma else payload.means
            buf = np.concatenate([buf, lat])
            lo = max(0, payload.start_frame - stream_ctx)
            audio = codec.decode_latents(jnp.asarray(buf[None, lo:]))
            new = np.asarray(
                audio[0, 0, (payload.start_frame - lo) * spf:],
                np.float32)
            yield (np.clip(new, -1, 1) * 32767).astype("<i2").tobytes()

    stream.service = svc
    return stream


class _Handler(BaseHTTPRequestHandler):
    # class attrs injected by serve_http
    stream_fn: Callable[[str], Iterator[bytes]] = None
    sample_rate: int = 24000
    # socket timeout: a dead client's blocked wfile.write raises instead of
    # pinning its handler thread forever (decode continues regardless — the
    # shared batcher runs on its own thread)
    timeout = 60

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, ctype: str, body: bytes):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API name)
        url = urllib.parse.urlparse(self.path)
        if url.path == "/":
            return self._send(200, "text/html; charset=utf-8",
                              _PAGE.encode())
        if url.path == "/healthz":
            return self._send(200, "application/json",
                              json.dumps({"ok": True}).encode())
        if url.path != "/tts":
            return self._send(404, "text/plain", b"not found")
        text = urllib.parse.parse_qs(url.query).get("text", [""])[0]
        if not text.strip():
            return self._send(400, "text/plain", b"missing ?text=")
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Cache-Control", "no-store")
        self.end_headers()  # no Content-Length: stream until close
        try:
            self.wfile.write(wav_chunk_header(self.sample_rate))
            self.wfile.flush()
            for pcm in self.stream_fn(text):
                self.wfile.write(pcm)
                self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError, TimeoutError):
            pass  # client hung up / stalled mid-stream — its loss alone


def serve_http(stream_fn: Callable[[str], Iterator[bytes]],
               sample_rate: int = 24000, host: str = "0.0.0.0",
               port: int = 7860) -> ThreadingHTTPServer:
    """Build the server (caller runs .serve_forever(), tests use ephemeral
    port 0 + a daemon thread)."""
    handler = type("Handler", (_Handler,),
                   {"stream_fn": staticmethod(stream_fn),
                    "sample_rate": sample_rate})
    return ThreadingHTTPServer((host, port), handler)
