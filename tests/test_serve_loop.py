"""Continuous-batching serving loop: per-row KV slots must reproduce the
single-request decode exactly, and free rows must be refilled mid-stream."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig, LlasaConfig
from kalle_tpu.infer.generate import generate
from kalle_tpu.infer.serve_loop import ContinuousBatcher
from kalle_tpu.models.lm import llasa

MAXF = 6


def _setup(end_thres=-1.0):
    cfg = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=300), latent_dim=8,
                      audio_proj_dim=64, head_variant="stableaudio")
    cfg = dataclasses.replace(cfg, end_kl_threshold=end_thres)
    params = llasa.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 300, (n,)).astype(np.int32)
               for n in (5, 11, 7)]
    return cfg, params, prompts


def test_matches_single_request_generate():
    cfg, params, prompts = _setup()
    cb = ContinuousBatcher(params, cfg, batch_size=2, max_frames=MAXF,
                           prompt_buckets=(8, 16), greedy=True)
    comps = {c.index: c for c in cb.run(prompts)}
    assert sorted(comps) == [0, 1, 2]

    for i, ids in enumerate(prompts):
        res = generate(params, cfg, jnp.asarray(ids[None]),
                       jnp.ones((1, len(ids)), jnp.int32), jax.random.key(9),
                       max_frames=MAXF, end_kl_threshold=-1.0, greedy=True)
        n = int(res.n_frames[0])
        assert comps[i].n_frames == n == MAXF - 1
        np.testing.assert_allclose(comps[i].means,
                                   np.asarray(res.means[0, :n], np.float32),
                                   rtol=2e-3, atol=2e-4)


def test_refills_freed_rows():
    """3 prompts on a 2-row batch: the third must be admitted only after a
    row frees, and still complete correctly."""
    cfg, params, prompts = _setup()
    cb = ContinuousBatcher(params, cfg, batch_size=2, max_frames=MAXF,
                           prompt_buckets=(8, 16), greedy=True)
    comps = sorted(cb.run(prompts), key=lambda c: c.index)
    # rows 0/1 admitted at step 0; prompt 2 admitted after they complete
    assert comps[2].steps_waited <= MAXF  # it didn't wait the whole run
    assert cb.step_count >= 2 * MAXF  # two generations in sequence
    assert all(c.n_frames == MAXF - 1 for c in comps)


def test_early_stop_per_row():
    """A huge threshold stops every row right after min_frames — rows stop
    independently of their neighbours."""
    cfg, params, prompts = _setup(end_thres=1e9)
    cb = ContinuousBatcher(params, cfg, batch_size=2, max_frames=MAXF,
                           prompt_buckets=(8, 16), greedy=True)
    comps = cb.run(prompts[:2])
    for c in comps:
        assert c.n_frames == cfg.min_frames  # stop at i == min_frames


def test_fused_params_match_single_request_generate():
    """Fused wqkv/wgu decode layout (ops.quant.fuse_decode_params) through
    the continuous batcher reproduces the unfused single-request decode."""
    from kalle_tpu.ops.quant import fuse_decode_params

    cfg, params, prompts = _setup()
    cb = ContinuousBatcher(fuse_decode_params(params), cfg, batch_size=2,
                           max_frames=MAXF, prompt_buckets=(8, 16),
                           greedy=True)
    comps = {c.index: c for c in cb.run(prompts)}
    for i, ids in enumerate(prompts):
        res = generate(params, cfg, jnp.asarray(ids[None]),
                       jnp.ones((1, len(ids)), jnp.int32), jax.random.key(9),
                       max_frames=MAXF, end_kl_threshold=-1.0, greedy=True)
        n = int(res.n_frames[0])
        np.testing.assert_allclose(comps[i].means,
                                   np.asarray(res.means[0, :n], np.float32),
                                   rtol=2e-3, atol=2e-4)


def test_int8_kv_continuous_close_to_bf16():
    """Continuous batcher with kv_cache_dtype='int8' stays close to the
    bf16-cache batcher (XLA fallback path on CPU)."""
    cfg, params, prompts = _setup()
    cfg8 = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_cache_dtype="int8"))

    ref = {c.index: c for c in ContinuousBatcher(
        params, cfg, batch_size=2, max_frames=MAXF, prompt_buckets=(8, 16),
        greedy=True).run(prompts)}
    got = {c.index: c for c in ContinuousBatcher(
        params, cfg8, batch_size=2, max_frames=MAXF, prompt_buckets=(8, 16),
        greedy=True).run(prompts)}
    for i in ref:
        a, b = ref[i].means, got[i].means
        sig = float(np.var(a)) + 1e-9
        assert float(np.mean((a - b) ** 2)) < 0.02 * sig


def test_kernel_branch_matches_xla_path():
    """The fused decode-attention serving branch (sideband current-frame
    column + per-row dynamic_update_slice cache writes) must reproduce the
    XLA scatter path exactly — forced on CPU via
    decode_attention_interpret (the branch is otherwise TPU-gated)."""
    cfg, params, prompts = _setup()
    kcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama,
                                       decode_attention_min_batch=1,
                                       decode_attention_interpret=True))

    ref = {c.index: c for c in ContinuousBatcher(
        params, cfg, batch_size=2, max_frames=MAXF, prompt_buckets=(8, 16),
        greedy=True).run(prompts)}
    got = {c.index: c for c in ContinuousBatcher(
        params, kcfg, batch_size=2, max_frames=MAXF, prompt_buckets=(8, 16),
        greedy=True).run(prompts)}
    assert sorted(got) == sorted(ref)
    for i in ref:
        assert got[i].n_frames == ref[i].n_frames
        np.testing.assert_allclose(got[i].means, ref[i].means,
                                   rtol=2e-3, atol=2e-4)


def test_serve_chunks_match_run():
    """serve(chunk_frames=2) must stream each request's frames incrementally
    and, concatenated, reproduce run()'s completions exactly; the first
    chunk must arrive before the request completes (that's the TTFA win)."""
    cfg, params, prompts = _setup()
    ref = {c.index: c for c in ContinuousBatcher(
        params, cfg, batch_size=2, max_frames=MAXF, prompt_buckets=(8, 16),
        greedy=True).run(prompts)}

    cb = ContinuousBatcher(params, cfg, batch_size=2, max_frames=MAXF,
                           prompt_buckets=(8, 16), greedy=True)
    chunks, dones, first_chunk_at, done_at = {}, {}, {}, {}
    events = list(cb.serve(prompts, chunk_frames=2))
    for t, (ev, p) in enumerate(events):
        if ev == "chunk":
            chunks.setdefault(p.index, []).append(p)
            first_chunk_at.setdefault(p.index, t)
        else:
            dones[p.index] = p
            done_at[p.index] = t

    assert sorted(dones) == sorted(ref)
    for i, comp in ref.items():
        got = np.concatenate([c.means for c in chunks[i]])
        np.testing.assert_allclose(got, comp.means, rtol=2e-3, atol=2e-4)
        # contiguous, non-overlapping chunk offsets
        offs = [(c.start_frame, len(c.means)) for c in chunks[i]]
        pos = 0
        for s, n in offs:
            assert s == pos
            pos += n
        assert pos == comp.n_frames
        assert chunks[i][-1].final
        assert first_chunk_at[i] < done_at[i]


def test_serve_arrivals_gate_admission():
    """A request whose arrival time is in the future must not be admitted
    before the clock reaches it (fake clock: 1 decode sync ~ 1 tick)."""
    cfg, params, prompts = _setup()
    ticks = [0.0]

    def clock():
        ticks[0] += 1.0
        return ticks[0]

    cb = ContinuousBatcher(params, cfg, batch_size=2, max_frames=MAXF,
                           prompt_buckets=(8, 16), greedy=True)
    # request 2 arrives in the future relative to the fake clock; the fake
    # sleep is a no-op (the ticking clock advances past the arrival)
    events = list(cb.serve(prompts, arrivals=[0.0, 0.0, 50.0], clock=clock,
                           sleep=lambda s: None))
    dones = [p for ev, p in events if ev == "done"]
    assert sorted(c.index for c in dones) == [0, 1, 2]
    # all requests still complete with the right frame counts
    assert all(c.n_frames == MAXF - 1 for c in dones)
