"""Headline benchmark: END-TO-END synthesis RTF on the flagship model
(Llama-3.2-1B-shape Llasa, sigma head, 64-d latents @ 7.5 Hz + SigmaVAE
codec decode to 24 kHz waveform — the VibeVoice operating point,
ref BASELINE.md). Text prompt -> latents (KV-cached AR decode) -> waveform.

RTF = wall_clock / audio_seconds_generated on one chip. The reference
publishes no numbers (BASELINE.json "published": {}); the north-star target
is RTF < 0.1 per v5e chip, so vs_baseline = 0.1 / measured (>1 beats target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
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
        "metric": "synthesis_rtf_v5e_chip",
        "value": round(rtf, 6),
        "unit": "wall_s_per_audio_s, end-to-end text->24kHz wav "
                "(batch=32, KV-cached 1B int8-weight decode + bf16 codec)",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
