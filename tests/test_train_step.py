"""Train-step tests: single-utterance overfit (the reference's acceptance
gate, ref configs/twj_sigmaVAE-overfit.yaml + SURVEY.md §4.1) and
dp/tp-sharded equivalence on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig, LlasaConfig, TrainConfig
from kalle_tpu.data.collate import Item, collate
from kalle_tpu.models.lm import llasa
from kalle_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from kalle_tpu.train.optim import make_optimizer
from kalle_tpu.train.step import make_train_state, train_step


def _tiny_batch(b=1, latent_dim=8, seed=0, n_ids=6, n_frames=10):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(b):
        ids = rng.integers(0, 300, (n_ids,)).astype(np.int32)
        lat = rng.normal(size=(n_frames, latent_dim)).astype(np.float32)
        items.append(Item(input_ids=ids, audio_latents=lat,
                          audio_distribution=lat.copy()))
    batch = collate(items, pad_token_id=0)
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


def test_overfit_single_utterance():
    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="sigma")
    tcfg = TrainConfig(lr=3e-3, warmup_steps=5, total_steps=4000,
                       end_loss_weight=0.002)
    params = llasa.init_params(cfg, jax.random.key(0))
    tx = make_optimizer(tcfg)
    state = make_train_state(params, tx)
    batch = _tiny_batch()
    rng = jax.random.key(42)

    first = None
    for i in range(60):
        state, metrics = train_step(state, cfg, tcfg, tx, batch, rng)
        if first is None:
            first = float(metrics["audio_loss"])
    last = float(metrics["audio_loss"])
    # sigma-noise floor keeps loss > 0; memorization should cut it sharply
    assert last < 0.5 * first, (first, last)
    assert np.isfinite(last)


def test_dp_tp_sharded_step_matches_single_device():
    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="melvae")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=100)
    params = llasa.init_params(cfg, jax.random.key(1))
    tx = make_optimizer(tcfg)
    batch = _tiny_batch(b=8, seed=3)
    # melvae needs 2d labels
    batch["distribute_labels"] = jnp.concatenate(
        [batch["distribute_labels"], jnp.zeros_like(batch["distribute_labels"])], -1)
    rng = jax.random.key(0)

    state_1 = make_train_state(jax.tree.map(jnp.copy, params), tx)
    state_1, m1 = train_step(state_1, cfg, tcfg, tx, batch, rng)

    mesh = make_mesh(dp=4, tp=2)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh)
        state_n = make_train_state(sp, tx)
        state_n, mn = train_step(state_n, cfg, tcfg, tx, sb, rng)

    np.testing.assert_allclose(float(m1["total_loss"]), float(mn["total_loss"]),
                               rtol=1e-5)
    # updated params must match across the mesh
    l1 = jax.tree.leaves(state_1.params)
    ln = jax.tree.leaves(jax.device_get(state_n.params))
    for a, b in zip(l1, ln):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_grad_accumulation_equivalence():
    """One accumulated step on an (A=2, B=2, ...) microbatch stack == one
    step on the full (4, ...) batch (in-step lax.scan accumulation; the
    optax.MultiSteps mechanism was retired — see train/step.py)."""
    # melvae head: deterministic forward (no sigma input-noise), so the
    # full batch and the two micro-batches see identical computations
    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="melvae")
    params = llasa.init_params(cfg, jax.random.key(2))
    batch = _tiny_batch(b=4, seed=5)
    batch["distribute_labels"] = jnp.concatenate(
        [batch["distribute_labels"], jnp.zeros_like(batch["distribute_labels"])], -1)
    rng = jax.random.key(9)

    tc_full = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=100,
                          gradient_accumulation_steps=1)
    tx_f = make_optimizer(tc_full)
    st_f = make_train_state(jax.tree.map(jnp.copy, params), tx_f)
    st_f, mf = train_step(st_f, cfg, tc_full, tx_f, batch, rng)

    tc_acc = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=100,
                         gradient_accumulation_steps=2)
    tx_a = make_optimizer(tc_acc)
    st_a = make_train_state(jax.tree.map(jnp.copy, params), tx_a)
    stacked = {k: jnp.stack([v[:2], v[2:]], axis=0) for k, v in batch.items()}
    st_a, ma = train_step(st_a, cfg, tc_acc, tx_a, stacked, rng)

    # the loss metric is the mean over microbatches == full-batch mean
    np.testing.assert_allclose(float(mf["total_loss"]),
                               float(ma["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_f.params), jax.tree.leaves(st_a.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_grad_accumulation_sharded_and_stacking():
    """Accumulated step on a dp=4 mesh through the Trainer's stacking path
    (stack_microbatches pads mixed-bucket batches) matches single device."""
    from kalle_tpu.data.collate import stack_microbatches

    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="melvae")
    tc = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=100,
                     gradient_accumulation_steps=2)
    params = llasa.init_params(cfg, jax.random.key(3))
    tx = make_optimizer(tc)
    rng = jax.random.key(4)

    def widen(b):
        b["distribute_labels"] = np.concatenate(
            [b["distribute_labels"], np.zeros_like(b["distribute_labels"])], -1)
        return b

    b1 = widen({k: np.asarray(v) for k, v in _tiny_batch(b=4, seed=21).items()})
    # shorter items -> shorter collated T: exercises the group-max pad path
    b2 = widen({k: np.asarray(v) for k, v in
                _tiny_batch(b=4, seed=22, n_frames=8).items()})
    stacked = stack_microbatches([b1, b2], pad_token_id=0)
    assert stacked["input_ids"].shape[0] == 2
    assert stacked["input_ids"].shape[2] == b1["input_ids"].shape[1]

    jb = {k: jnp.asarray(v) for k, v in stacked.items()}
    st_1 = make_train_state(jax.tree.map(jnp.copy, params), tx)
    st_1, m1 = train_step(st_1, cfg, tc, tx, jb, rng)

    from kalle_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    mesh = make_mesh(dp=4, tp=2)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sb = shard_batch(jb, mesh, leading_accum=True)
        assert sb["input_ids"].sharding.spec == jax.sharding.PartitionSpec(
            None, "dp")
        st_n = make_train_state(sp, tx)
        st_n, mn = train_step(st_n, cfg, tc, tx, sb, rng)
    np.testing.assert_allclose(float(m1["total_loss"]), float(mn["total_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_1.params),
                    jax.tree.leaves(jax.device_get(st_n.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_dp_tp_sp_sharded_step_matches_single_device():
    """3-D mesh: dp=2, tp=2, sp=2 (sequence parallel) == single device."""
    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="melvae")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=100)
    params = llasa.init_params(cfg, jax.random.key(7))
    tx = make_optimizer(tcfg)
    batch = _tiny_batch(b=4, seed=11)
    batch["distribute_labels"] = jnp.concatenate(
        [batch["distribute_labels"], jnp.zeros_like(batch["distribute_labels"])], -1)
    rng = jax.random.key(0)

    st1 = make_train_state(jax.tree.map(jnp.copy, params), tx)
    st1, m1 = train_step(st1, cfg, tcfg, tx, batch, rng)

    mesh = make_mesh(dp=2, tp=2, sp=2)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh)
        stn = make_train_state(sp, tx)
        stn, mn = train_step(stn, cfg, tcfg, tx, sb, rng)
    np.testing.assert_allclose(float(m1["total_loss"]), float(mn["total_loss"]),
                               rtol=1e-5)


def test_fsdp_sharded_step_matches_and_shards_memory():
    """fsdp=True (tp dims additionally sharded over dp) must reproduce the
    single-device step AND hold 1/(tp*dp) of each big weight per device —
    the ZeRO-3 memory behavior that lets f32-master 1B training fit small
    chips at dp >= 2."""
    from kalle_tpu.parallel.mesh import param_pspecs

    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="sigma")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=100)
    params = llasa.init_params(cfg, jax.random.key(1))
    tx = make_optimizer(tcfg)
    batch = _tiny_batch(b=8, seed=3)
    rng = jax.random.key(0)

    state_1 = make_train_state(jax.tree.map(jnp.copy, params), tx)
    state_1, m1 = train_step(state_1, cfg, tcfg, tx, batch, rng)

    mesh = make_mesh(dp=4, tp=2)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh, fsdp=True)
        # at rest: wq (L, h, nq*hd) sharded 1/8 on its out dim
        wq = sp["llama"]["layers"]["wq"]
        shard_shapes = {s.data.shape for s in wq.addressable_shards}
        L, h, out = wq.shape
        assert shard_shapes == {(L, h, out // 8)}, shard_shapes
        sb = shard_batch(batch, mesh)
        state_n = make_train_state(sp, tx)
        # optimizer state inherits the fsdp sharding (ZeRO)
        mu_wq = jax.tree.leaves(
            state_n.opt_state, is_leaf=lambda x: hasattr(x, "addressable_shards"))
        state_n, mn = train_step(state_n, cfg, tcfg, tx, sb, rng)

    np.testing.assert_allclose(float(m1["total_loss"]), float(mn["total_loss"]),
                               rtol=1e-5)
    l1 = jax.tree.leaves(state_1.params)
    ln = jax.tree.leaves(jax.device_get(state_n.params))
    for a, b in zip(l1, ln):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_remat_dots_policy_matches_full():
    """remat_policy='dots' must be numerically identical to full remat
    (both are pure rematerialization strategies)."""
    import dataclasses

    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="sigma")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=100)
    batch = _tiny_batch(b=4, seed=5)
    rng = jax.random.key(0)

    def grads(llama_over):
        c = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, **llama_over))
        params = llasa.init_params(c, jax.random.key(0))
        from kalle_tpu.train.step import loss_fn
        return jax.grad(lambda p: loss_fn(p, c, tcfg, batch, rng)[0])(params)

    g_full = grads({"remat": True, "remat_policy": "full"})
    g_dots = grads({"remat": True, "remat_policy": "dots"})
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
