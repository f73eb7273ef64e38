"""Headline benchmark: END-TO-END synthesis RTF on the flagship model
(Llama-3.2-1B-shape Llasa, sigma head, 64-d latents @ 7.5 Hz + SigmaVAE
codec decode to 24 kHz waveform — the VibeVoice operating point,
ref BASELINE.md). Text prompt -> latents (KV-cached AR decode) -> waveform.

RTF = wall_clock / audio_seconds_generated on one chip. The reference
publishes no numbers (BASELINE.json "published": {}); the north-star target
is RTF < 0.1 per v5e chip, so vs_baseline = 0.1 / measured (>1 beats target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

OUTAGE-PROOFING (round 3 post-mortem): the TPU backend init can hang ~28
minutes before dying with `Unable to initialize backend 'axon':
UNAVAILABLE` — an infra failure that fires before any repo code runs, and
it erased round 3's headline number because this script had no bounded
failure path. The top-level invocation therefore:
  1. probes the backend with a trivial 1-element computation in a
     SUBPROCESS under a hard timeout (a hung init is killable there;
     in-process it is not), with bounded retries + backoff;
  2. on persistent unavailability prints a structured failure line
     (`"error": "backend_unavailable"`, value null) and exits nonzero —
     an infra flake is distinguishable from a perf regression at a glance;
  3. runs the actual benchmark as a subprocess too (`--run`), under a
     generous but HARD timeout, so a mid-run backend death also yields a
     structured line instead of an unbounded hang.
Timeouts are env-tunable: KALLE_BENCH_PROBE_TIMEOUT (s, default 120),
KALLE_BENCH_PROBE_ATTEMPTS (default 2), KALLE_BENCH_RUN_TIMEOUT (s,
default 2400 — remote first-compiles can take many minutes).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

LATENT_HZ = 7.5  # sigma-VAE frame rate (ref twj_dataset_offline.py:266,284)
# batch sweep on v5e (128-frame decode): B=8 -> RTF 0.0040, 16 -> 0.0024,
# 32 -> 0.0017, 64 -> 0.0014; 32 balances per-request latency (<1 s wall
# for ~17 s of audio) against throughput
BATCH = 32
MAX_FRAMES = 128
TEXT_LEN = 32
TARGET_RTF = 0.1

METRIC = "synthesis_rtf_v5e_chip"
UNIT = ("wall_s_per_audio_s, end-to-end text->24kHz wav "
        "(batch=32, KV-cached 1B int8-weight decode + bf16 codec)")

_PROBE_CODE = """
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
x = np.asarray(jnp.ones((1,), jnp.float32) + 1.0)  # 1-element compute
assert float(x[0]) == 2.0
print(f"probe ok: {jax.devices()} in {time.time()-t0:.1f}s", flush=True)
"""


def _fail(error: str, detail: str, rc: int = 3) -> int:
    print(json.dumps({
        "metric": METRIC, "value": None, "unit": UNIT, "vs_baseline": None,
        "error": error, "detail": detail[-400:],
    }))
    return rc


def _probe(timeout_s: float):
    """(ok, detail) — trivial backend computation in a killable subprocess."""
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s (hung init)"
    if p.returncode == 0:
        return True, p.stdout.strip().splitlines()[-1]
    tail = [ln for ln in (p.stderr or "").strip().splitlines() if ln.strip()]
    return False, tail[-1] if tail else f"probe rc={p.returncode}"


def supervise() -> int:
    probe_timeout = float(os.environ.get("KALLE_BENCH_PROBE_TIMEOUT", "120"))
    attempts = int(os.environ.get("KALLE_BENCH_PROBE_ATTEMPTS", "2"))
    run_timeout = float(os.environ.get("KALLE_BENCH_RUN_TIMEOUT", "2400"))

    detail = ""
    for i in range(attempts):
        if i:
            time.sleep(min(15 * i, 60))  # backoff between retries
        t0 = time.time()
        ok, detail = _probe(probe_timeout)
        print(f"# probe {i + 1}/{attempts}: "
              f"{'ok' if ok else 'FAIL'} ({time.time() - t0:.0f}s) {detail}",
              file=sys.stderr, flush=True)
        if ok:
            break
    else:
        return _fail("backend_unavailable",
                     f"{attempts} probes, {probe_timeout:.0f}s timeout each; "
                     f"last: {detail}")

    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--run"], timeout=run_timeout, text=True,
                           capture_output=True)
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")
        out = out.decode() if isinstance(out, bytes) else out
        return _fail("bench_run_timeout",
                     f"benchmark exceeded {run_timeout:.0f}s; "
                     f"stdout tail: {out[-200:]}", rc=4)
    sys.stderr.write(p.stderr or "")
    if p.returncode != 0:
        tail = [ln for ln in (p.stderr or "").strip().splitlines()
                if ln.strip()]
        return _fail("bench_run_failed",
                     f"rc={p.returncode}; {tail[-1] if tail else ''}", rc=5)
    sys.stdout.write(p.stdout)  # the one JSON line
    return 0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from kalle_tpu.infer.generate import generate
    from kalle_tpu.infer.pipeline import Codec
    from kalle_tpu.models.lm import llasa

    cfg = _flagship_cfg()
    from kalle_tpu.ops.quant import quantize_llama_params

    params = llasa.init_params(cfg, jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    # int8 weight-only decode: quality-gated on a trained model by
    # tests/test_quant.py::test_int8_decode_quality_on_trained_model.
    # NOT fused (ops.quant.fuse_decode_params): A/B on v5e shows fused
    # wqkv/wgu wins only at long cache (+22% at 1024) and loses at this
    # benchmark's cache 160 (-15%); serving exposes it via --fused.
    params = quantize_llama_params(params)
    codec = Codec.random_init("sigma").astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128255, (BATCH, TEXT_LEN)), jnp.int32)
    mask = jnp.ones((BATCH, TEXT_LEN), jnp.int32)

    def run(key):
        res = generate(params, cfg, ids, mask, key, max_frames=MAX_FRAMES)
        lat = jnp.asarray(res.samples, jnp.bfloat16)
        from kalle_tpu.models.codecs import sigmavae

        audio = sigmavae.decode(codec.params, codec.cfg, lat)
        # Fence: on the axon remote backend block_until_ready returns
        # immediately, so a host fetch is required — but fetching the FULL
        # waveform (26 MB/iter) times the tunnel, not the chip. An 8-byte
        # fetch of an on-device reduction forces the whole computation and
        # measures compute honestly (production hosts stream audio over
        # local DMA, not this tunnel).
        return np.asarray(audio.sum())

    # compile + warmup
    run(jax.random.key(1))

    # early-stop sanity arm (VERDICT r2 weak 6): with random weights the
    # end-KL floor is ~1.21 > the 0.5 threshold, so the headline decode
    # always runs to MAX_FRAMES; raise the threshold above the floor to
    # prove the while_loop early-exit path also executes on the real chip.
    res_es = generate(params, cfg, ids, mask, jax.random.key(99),
                      max_frames=MAX_FRAMES, end_kl_threshold=2.0)
    n_es = np.asarray(res_es.n_frames)
    assert (n_es < MAX_FRAMES).all() and (n_es >= cfg.min_frames).all(), (
        "early-stop exit path did not fire on chip", n_es[:4].tolist())

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        run(jax.random.key(2 + i))
    dt = (time.perf_counter() - t0) / n_iters

    # sigma head never early-stops (end-KL floor 1.21 > 0.5), so every row
    # emits MAX_FRAMES frames; valid = MAX_FRAMES - 1 (discard-last)
    audio_seconds = BATCH * (MAX_FRAMES - 1) / LATENT_HZ
    rtf = dt / audio_seconds
    print(json.dumps({
        "metric": METRIC,
        "value": round(rtf, 6),
        "unit": UNIT,
        "vs_baseline": round(TARGET_RTF / rtf, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main() if "--run" in sys.argv[1:] else supervise())
