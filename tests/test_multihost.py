"""Multi-host training utilities on the virtual 8-device mesh:
per-host dataset sharding + global-batch assembly (VERDICT r1 item 6)."""
import numpy as np

import jax
import jax.numpy as jnp

from kalle_tpu.parallel import multihost
from kalle_tpu.parallel.mesh import make_mesh


def _rows(n):
    return [{"id": f"u{i}", "caption": f"text {i}", "vae": f"/nope/{i}.npy"}
            for i in range(n)]


def test_dataset_host_sharding_partitions():
    from kalle_tpu.data.datasets import OfflineLatentDataset
    from kalle_tpu.data.tokens import build_tokenizer

    tok = build_tokenizer()
    rows = _rows(10)
    shards = [OfflineLatentDataset(rows, tok, shard_index=i, shard_count=4)
              for i in range(4)]
    ids = [tuple(r["id"] for r in s.lines) for s in shards]
    # disjoint and complete
    flat = [u for t in ids for u in t]
    assert sorted(flat) == sorted(r["id"] for r in rows)
    assert len(set(flat)) == len(flat)
    assert len(shards[0]) == 3 and len(shards[3]) == 2  # round-robin


def test_host_local_to_global_single_process():
    """With one process the host-local batch IS the global batch; the
    utility must still produce dp-sharded global arrays on the mesh."""
    mesh = make_mesh(dp=4, tp=2)
    batch = {
        "input_ids": np.arange(8 * 6, dtype=np.int32).reshape(8, 6),
        "audio_latents": np.ones((8, 6, 4), np.float32),
    }
    g = multihost.host_local_to_global(batch, mesh)
    assert g["input_ids"].shape == (8, 6)
    np.testing.assert_array_equal(np.asarray(g["input_ids"]),
                                  batch["input_ids"])
    shard_shapes = {s.data.shape for s in g["input_ids"].addressable_shards}
    assert shard_shapes == {(2, 6)}  # dp=4 split of 8 rows


def test_trainer_multihost_wiring(tmp_path):
    """Trainer must call multihost.initialize and shard the dataset by
    process info — asserted structurally on a single host."""
    import json

    from kalle_tpu.core.config import (DataConfig, ExperimentConfig,
                                       LlasaConfig, TrainConfig)
    from kalle_tpu.data.tokens import build_tokenizer
    from kalle_tpu.train.trainer import Trainer

    tok = build_tokenizer()
    rng = np.random.default_rng(0)
    meta = tmp_path / "meta.jsonl"
    rows = []
    for i in range(4):
        lat = rng.normal(size=(1, 6, 8)).astype(np.float32)
        p = str(tmp_path / f"l{i}.npy")
        np.save(p, lat)
        rows.append({"id": f"u{i}", "caption": f"some text {i}", "vae": p})
    meta.write_text("\n".join(json.dumps(r) for r in rows))

    exp = ExperimentConfig(
        exp_dir=str(tmp_path / "exp"),
        model=LlasaConfig.tiny(),
        train=TrainConfig(lr=1e-4, warmup_steps=1, total_steps=4,
                          log_interval=2, save_interval=1000, dp=4, tp=2),
        data=DataConfig(meta_path=str(meta), batch_size=4, num_workers=1,
                        length_buckets=(32,), max_length=32),
    )
    tr = Trainer(exp, tok)
    assert tr.process_count == 1 and tr.process_index == 0
    m = tr.fit(max_steps=2)
    assert np.isfinite(m["total_loss"])
