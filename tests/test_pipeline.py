"""Pipeline parallelism (parallel/pipeline.py): pp forward/backward parity
with the plain scanned path on the virtual CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kalle_tpu.core.config import LlamaConfig, LlasaConfig, TrainConfig
from kalle_tpu.models.lm import llasa
from kalle_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from kalle_tpu.train.optim import make_optimizer
from kalle_tpu.train.step import loss_fn, make_train_state, train_step


def _cfg(pp_microbatches=2):
    llama = dataclasses.replace(LlamaConfig.tiny(vocab_size=512),
                                num_layers=4,
                                pp_microbatches=pp_microbatches)
    return LlasaConfig(llama=llama, latent_dim=8, audio_proj_dim=64,
                       head_variant="sigma")


def _batch(cfg, b=4, seed=0):
    from __graft_entry__ import _synthetic_batch

    batch_np = _synthetic_batch(cfg, b=b, text_len=6, audio_len=10, bucket=32,
                                seed=seed)
    return {k: jnp.asarray(v) for k, v in batch_np.items()
            if isinstance(v, np.ndarray)}


@pytest.mark.parametrize("dp,pp", [(1, 4), (2, 2)])
def test_pp_forward_matches_plain(dp, pp):
    cfg = _cfg()
    params = llasa.init_params(cfg, jax.random.key(0))
    batch = _batch(cfg)
    rng = jax.random.key(1)

    ref = llasa.forward(params, cfg, batch, rng=rng)
    ref_loss = float(ref["audio_loss"])

    mesh = make_mesh(dp=dp, pp=pp, devices=jax.devices()[: dp * pp])
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh, pp=True)
        sb = shard_batch(batch, mesh)
        out = jax.jit(lambda p, b: llasa.forward(p, cfg, b, rng=rng))(sp, sb)
        pp_loss = float(out["audio_loss"])
        np.testing.assert_allclose(pp_loss, ref_loss, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["pre_mean"]),
                                   np.asarray(ref["pre_mean"]),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("dp,pp,tp", [(2, 2, 2), (1, 4, 2)])
def test_pp_tp_forward_matches_plain(dp, pp, tp):
    """pp x tp composition: layer weights Megatron-sharded inside each pp
    stage, manual psums in the shard_map body (llama._layer tp_axis)."""
    cfg = _cfg()
    params = llasa.init_params(cfg, jax.random.key(0))
    batch = _batch(cfg)
    rng = jax.random.key(1)

    ref = llasa.forward(params, cfg, batch, rng=rng)
    ref_loss = float(ref["audio_loss"])

    mesh = make_mesh(dp=dp, pp=pp, tp=tp, devices=jax.devices()[: dp * pp * tp])
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh, pp=True)
        # at rest: wq (L, h, nq*hd) sharded over BOTH pp (L) and tp (out)
        wq = sp["llama"]["layers"]["wq"]
        L, h, out = wq.shape
        shard_shapes = {s.data.shape for s in wq.addressable_shards}
        assert shard_shapes == {(L // pp, h, out // tp)}, shard_shapes
        sb = shard_batch(batch, mesh)
        out_t = jax.jit(lambda p, b: llasa.forward(p, cfg, b, rng=rng))(sp, sb)
        np.testing.assert_allclose(float(out_t["audio_loss"]), ref_loss,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out_t["pre_mean"]),
                                   np.asarray(ref["pre_mean"]),
                                   atol=1e-5, rtol=1e-4)


def test_pp_tp_grads_match_plain():
    cfg = _cfg()
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=10)
    params = llasa.init_params(cfg, jax.random.key(0))
    batch = _batch(cfg)
    rng = jax.random.key(1)

    grad_fn = jax.grad(lambda p, b: loss_fn(p, cfg, tcfg, b, rng)[0])
    ref_grads = grad_fn(params, batch)

    mesh = make_mesh(dp=2, pp=2, tp=2, devices=jax.devices()[:8])
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh, pp=True)
        sb = shard_batch(batch, mesh)
        tp_grads = jax.jit(grad_fn)(sp, sb)

    flat_r, _ = jax.tree.flatten(ref_grads)
    flat_p, _ = jax.tree.flatten(tp_grads)
    for r, p in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   atol=2e-4, rtol=1e-3)


def test_pp_grads_match_plain():
    cfg = _cfg()
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=10)
    params = llasa.init_params(cfg, jax.random.key(0))
    batch = _batch(cfg)
    rng = jax.random.key(1)

    grad_fn = jax.grad(lambda p, b: loss_fn(p, cfg, tcfg, b, rng)[0])
    ref_grads = grad_fn(params, batch)

    mesh = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh, pp=True)
        sb = shard_batch(batch, mesh)
        pp_grads = jax.jit(grad_fn)(sp, sb)

    flat_r, _ = jax.tree.flatten(ref_grads)
    flat_p, _ = jax.tree.flatten(pp_grads)
    for r, p in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   atol=2e-4, rtol=1e-3)


def test_pp_train_step_loss_matches_dp():
    cfg = _cfg()
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=10)
    params = llasa.init_params(cfg, jax.random.key(0))
    tx = make_optimizer(tcfg)
    batch = _batch(cfg)
    rng = jax.random.key(1)

    mesh_dp = make_mesh(dp=4, devices=jax.devices()[:4])
    with jax.sharding.set_mesh(mesh_dp):
        # copy: train_step donates state, and device_put on CPU may alias
        # the original buffers (same trick as the fsdp test)
        st = make_train_state(
            shard_params(jax.tree.map(jnp.copy, params), mesh_dp), tx)
        _, m_dp = train_step(st, cfg, tcfg, tx, shard_batch(batch, mesh_dp),
                             rng)
        loss_dp = float(m_dp["total_loss"])

    mesh_pp = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    with jax.sharding.set_mesh(mesh_pp):
        st = make_train_state(shard_params(params, mesh_pp, pp=True), tx)
        _, m_pp = train_step(st, cfg, tcfg, tx, shard_batch(batch, mesh_pp),
                             rng)
        loss_pp = float(m_pp["total_loss"])

    np.testing.assert_allclose(loss_pp, loss_dp, rtol=1e-5)
