"""BatcherService: concurrent requests share ONE decode batch (the round-4
serving composition fix — previously each HTTP request ran a fresh batch-1
batcher behind a global lock and concurrent clients serialized)."""
import dataclasses
import threading

import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig, LlasaConfig
from kalle_tpu.infer.generate import generate
from kalle_tpu.models.lm import llasa
from kalle_tpu.serve.service import BatcherService

MAXF = 8


def _setup():
    cfg = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=300), latent_dim=8,
                      audio_proj_dim=64, head_variant="stableaudio")
    cfg = dataclasses.replace(cfg, end_kl_threshold=-1.0)
    params = llasa.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 300, (n,)).astype(np.int32)
               for n in (5, 11, 7)]
    return cfg, params, prompts


def _drain(q):
    chunks, done = [], None
    while True:
        ev = q.get(timeout=120)
        if ev is None:
            break
        kind, payload = ev
        if kind == "error":
            raise payload
        if kind == "chunk":
            chunks.append(payload)
        else:
            done = payload
    return chunks, done


def test_concurrent_requests_share_one_batch():
    """Two requests submitted together must decode CONCURRENTLY in the
    2-row batch: total decode steps ~ one generation, not two in sequence;
    each stream's chunks must reproduce the single-request decode."""
    cfg, params, prompts = _setup()
    svc = BatcherService(params, cfg, batch_size=2, max_frames=MAXF,
                         chunk_frames=2, prompt_buckets=(8, 16), greedy=True)
    try:
        qs = [svc.submit(p)[1] for p in prompts[:2]]
        results = [_drain(q) for q in qs]
        # serial execution would cost ~2*MAXF steps; shared-batch decode
        # costs ~MAXF (+ admission skew of a couple of chunk syncs)
        assert svc.cb.step_count <= MAXF + 4, svc.cb.step_count
        for i, (chunks, done) in enumerate(results):
            assert done is not None and done.n_frames == MAXF - 1
            got = np.concatenate([c.means for c in chunks])
            ids = prompts[i]
            ref = generate(params, cfg, jnp.asarray(ids[None]),
                           jnp.ones((1, len(ids)), jnp.int32),
                           jax.random.key(9), max_frames=MAXF,
                           end_kl_threshold=-1.0, greedy=True)
            n = int(ref.n_frames[0])
            np.testing.assert_allclose(
                got, np.asarray(ref.means[0, :n], np.float32),
                rtol=2e-3, atol=2e-4)
            assert chunks[-1].final
    finally:
        svc.close()


def test_overflow_requests_queue_and_complete():
    """3 requests on a 2-row batch: the third waits for a free row, then
    completes; the service keeps accepting submissions mid-decode."""
    cfg, params, prompts = _setup()
    svc = BatcherService(params, cfg, batch_size=2, max_frames=MAXF,
                         chunk_frames=2, prompt_buckets=(8, 16), greedy=True)
    try:
        qs = [svc.submit(p)[1] for p in prompts]
        dones = []
        for q in qs:
            chunks, done = _drain(q)
            assert done is not None
            assert sum(len(c.means) for c in chunks) == done.n_frames
            dones.append(done)
        assert all(d.n_frames == MAXF - 1 for d in dones)
    finally:
        svc.close()


def test_submissions_from_many_threads():
    """submit() is thread-safe: handler-style threads submitting and
    draining concurrently all complete."""
    cfg, params, prompts = _setup()
    svc = BatcherService(params, cfg, batch_size=2, max_frames=MAXF,
                         chunk_frames=2, prompt_buckets=(8, 16), greedy=True)
    results, errs = {}, []

    def worker(i):
        try:
            _, q = svc.submit(prompts[i % len(prompts)])
            chunks, done = _drain(q)
            results[i] = (sum(len(c.means) for c in chunks), done.n_frames)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        assert sorted(results) == [0, 1, 2, 3]
        assert all(n == got for got, n in results.values())
    finally:
        svc.close()


def test_close_releases_waiters():
    """close() must unblock a request that never got admitted."""
    cfg, params, _ = _setup()
    svc = BatcherService(params, cfg, batch_size=1, max_frames=MAXF,
                         chunk_frames=2, prompt_buckets=(8,), greedy=True)
    svc.close()
    # a queue registered before close is drained with a sentinel
    svc2 = BatcherService(params, cfg, batch_size=1, max_frames=MAXF,
                          chunk_frames=2, prompt_buckets=(8,), greedy=True)
    import pytest

    svc2.close()
    with pytest.raises(RuntimeError):
        svc2.submit(np.ones((4,), np.int32))
