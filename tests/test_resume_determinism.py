"""Deterministic resume: restoring an orbax checkpoint (params + optimizer
state + step) and replaying the same batches must reproduce the
uninterrupted run bit-for-bit (SURVEY.md §7 build plan item 5 — the
reference could not do this: optimizer state wasn't saved,
ref train_offline.py:261-264)."""
import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.core.checkpoint import CheckpointManager
from kalle_tpu.core.config import LlamaConfig, LlasaConfig, TrainConfig
from kalle_tpu.data.collate import Item, collate
from kalle_tpu.models.lm import llasa
from kalle_tpu.train.optim import make_optimizer
from kalle_tpu.train.step import make_train_state, train_step


def _batch(seed):
    rng = np.random.default_rng(seed)
    items = [Item(input_ids=rng.integers(0, 300, (5,)).astype(np.int32),
                  audio_latents=(l := rng.normal(size=(8, 8)).astype(np.float32)),
                  audio_distribution=l.copy()) for _ in range(2)]
    b = collate(items, 0, buckets=(16,))
    return {k: jnp.asarray(v) for k, v in b.items() if hasattr(v, "shape")}


def test_resume_reproduces_uninterrupted_run(tmp_path):
    cfg = LlasaConfig(llama=LlamaConfig.tiny(), latent_dim=8,
                      audio_proj_dim=64, head_variant="sigma")
    tcfg = TrainConfig(lr=1e-3, warmup_steps=2, total_steps=100)
    tx = make_optimizer(tcfg)
    rng = jax.random.key(0)
    batches = [_batch(s) for s in range(4)]

    # uninterrupted run: 4 steps
    params = llasa.init_params(cfg, jax.random.key(3))
    state = make_train_state(jax.tree.map(jnp.copy, params), tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    for i, b in enumerate(batches):
        state, _ = train_step(state, cfg, tcfg, tx, b, rng)
        if i == 1:
            mgr.save(int(state.step), jax.device_get(state), wait=True)
    final_uninterrupted = jax.device_get(state.params)

    # resume from step 2 and replay steps 3-4
    template = make_train_state(jax.tree.map(jnp.copy, params), tx)
    restored, step = mgr.restore(template)
    assert step == 2
    assert int(restored.step) == 2
    for b in batches[2:]:
        restored, _ = train_step(restored, cfg, tcfg, tx, b, rng)
    final_resumed = jax.device_get(restored.params)

    for a, c in zip(jax.tree.leaves(final_uninterrupted),
                    jax.tree.leaves(final_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
