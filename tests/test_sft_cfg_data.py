"""SFT-mix dataset + CFG mask dropout."""
import numpy as np

from kalle_tpu.data.collate import cfg_mask_dropout
from kalle_tpu.data.datasets import SftMixDataset
from kalle_tpu.data.tokens import build_tokenizer


def test_sft_mix_epoch_resample(tmp_path):
    rng = np.random.default_rng(0)
    base, sft = [], []
    for i in range(20):
        lat = rng.normal(size=(1, 4, 8)).astype(np.float32)
        p = str(tmp_path / f"b{i}.npy")
        np.save(p, lat)
        base.append({"id": f"b{i}", "caption": f"base {i}", "vae": p})
    for i in range(5):
        lat = rng.normal(size=(1, 4, 8)).astype(np.float32)
        p = str(tmp_path / f"s{i}.npy")
        np.save(p, lat)
        sft.append({"id": f"s{i}", "caption": f"sft {i}", "vae": p})

    tok = build_tokenizer()
    ds = SftMixDataset(base, sft, tok, latent_kind="sigma")
    assert len(ds.lines) == 10  # 5 sft + 5 sampled base
    epoch0 = [l["id"] for l in ds.lines]
    ds.set_epoch(1)
    epoch1 = [l["id"] for l in ds.lines]
    assert sorted(i for i in epoch0 if i.startswith("s")) == \
        [f"s{i}" for i in range(5)]
    assert epoch0 != epoch1  # resampled/reshuffled
    item = ds[0]
    assert item.audio_latents.shape == (4, 8)


def test_cfg_mask_dropout():
    rng = np.random.default_rng(0)
    batch = {"audio_mask": np.ones((4, 100), bool),
             "ids_mask": np.ones((4, 100), bool)}
    out = cfg_mask_dropout(batch, cfg_prob=0.3, rng=rng)
    kept = out["audio_mask"].mean()
    assert 0.6 < kept < 0.8  # ~70% kept
    assert out["ids_mask"].all()  # text untouched (v2 semantics)
    out0 = cfg_mask_dropout(batch, cfg_prob=0.0, rng=rng)
    assert out0["audio_mask"].all()
