"""SFT-mix dataset + CFG mask dropout: distributional semantics.

Pins the behaviors of the reference's 1136-line backup/dy_dataset.py SFT/CFG
surface (TTSDataset_online_lance_for_sft.set_epoch :260-262 — sft_lst +
random.sample(base_lst, len(sft_lst)), shuffled per epoch; _for_cfg
per-POSITION audio-mask dropout :480-483 with text mask untouched — the V1
whole-text drop is commented out in the reference), not just shapes:
mix ratios every epoch, base-pool coverage across epochs, epoch determinism,
empirical drop-rate statistics, positional independence, and the
interaction of CFG dropout with collate spans and static length buckets.
"""
import numpy as np
import pytest

from kalle_tpu.data.collate import Item, cfg_mask_dropout, collate
from kalle_tpu.data.datasets import SftMixDataset
from kalle_tpu.data.tokens import build_tokenizer


# ---------------------------------------------------------------- fixtures

N_BASE, N_SFT = 20, 5


@pytest.fixture(scope="module")
def pools(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("sftmix")
    rng = np.random.default_rng(0)
    base, sft = [], []
    for i in range(N_BASE):
        lat = rng.normal(size=(1, 4, 8)).astype(np.float32)
        p = str(tmp_path / f"b{i}.npy")
        np.save(p, lat)
        base.append({"id": f"b{i}", "caption": f"base {i}", "vae": p})
    for i in range(N_SFT):
        lat = rng.normal(size=(1, 4 + i, 8)).astype(np.float32)
        p = str(tmp_path / f"s{i}.npy")
        np.save(p, lat)
        sft.append({"id": f"s{i}", "caption": f"sft {i}", "vae": p})
    return base, sft


@pytest.fixture(scope="module")
def tok():
    return build_tokenizer()


# ------------------------------------------------------------ SFT mixing


def test_sft_mix_epoch_resample(pools, tok):
    base, sft = pools
    ds = SftMixDataset(base, sft, tok, latent_kind="sigma")
    assert len(ds.lines) == 2 * N_SFT  # 5 sft + 5 sampled base
    epoch0 = [l["id"] for l in ds.lines]
    ds.set_epoch(1)
    epoch1 = [l["id"] for l in ds.lines]
    assert sorted(i for i in epoch0 if i.startswith("s")) == \
        [f"s{i}" for i in range(N_SFT)]
    assert epoch0 != epoch1  # resampled/reshuffled
    item = ds[0]
    assert item.audio_latents.shape[-1] == 8


def test_sft_mix_ratio_holds_every_epoch(pools, tok):
    """Every epoch is EXACTLY half sft half base (the 1:1 mix the reference
    constructs, dy_dataset.py:262), the sft pool appears complete (each line
    once), and the base half is a sample WITHOUT replacement."""
    base, sft = pools
    ds = SftMixDataset(base, sft, tok, latent_kind="sigma")
    for epoch in range(12):
        ds.set_epoch(epoch)
        ids = [l["id"] for l in ds.lines]
        sft_ids = [i for i in ids if i.startswith("s")]
        base_ids = [i for i in ids if i.startswith("b")]
        assert len(ids) == 2 * N_SFT
        assert sorted(sft_ids) == [f"s{i}" for i in range(N_SFT)]
        assert len(base_ids) == N_SFT
        assert len(set(base_ids)) == N_SFT  # no replacement


def test_sft_mix_base_coverage_and_uniformity(pools, tok):
    """Across epochs the base sample must sweep the whole base pool
    roughly uniformly: each base line is drawn with p = n_sft/n_base = 1/4
    per epoch; over E epochs the count is Binomial(E, 1/4)."""
    base, sft = pools
    ds = SftMixDataset(base, sft, tok, latent_kind="sigma")
    E = 80
    counts = {f"b{i}": 0 for i in range(N_BASE)}
    for epoch in range(E):
        ds.set_epoch(epoch)
        for line in ds.lines:
            if line["id"].startswith("b"):
                counts[line["id"]] += 1
    # full coverage: every base line seen at least once in 80 epochs
    # (miss probability per line = 0.75^80 ~ 1e-10)
    assert all(c > 0 for c in counts.values()), counts
    # uniformity: every count within 5 sigma of E/4 (sigma = sqrt(E*3/16))
    exp, sig = E / 4.0, np.sqrt(E * 3.0 / 16.0)
    for utt, c in counts.items():
        assert abs(c - exp) < 5 * sig, (utt, c, exp)
    # and the empirical mean matches the 1:1 mix ratio exactly by design
    assert sum(counts.values()) == E * N_SFT


def test_sft_mix_epoch_determinism(pools, tok):
    """set_epoch(k) is reproducible (py_rng reseeded per epoch): the same
    epoch yields the same mix and order — resume-safe shuffling."""
    base, sft = pools
    ds = SftMixDataset(base, sft, tok, latent_kind="sigma")
    ds.set_epoch(3)
    first = [l["id"] for l in ds.lines]
    ds.set_epoch(7)  # move away
    ds.set_epoch(3)  # come back
    assert [l["id"] for l in ds.lines] == first


def test_sft_mix_shuffles_interleave(pools, tok):
    """The mixed list is SHUFFLED (dy_dataset.py:263): sft lines must not
    sit in a contiguous block in (almost) any epoch."""
    base, sft = pools
    ds = SftMixDataset(base, sft, tok, latent_kind="sigma")
    contiguous = 0
    for epoch in range(20):
        ds.set_epoch(epoch)
        flags = [l["id"].startswith("s") for l in ds.lines]
        first = flags.index(True)
        if all(flags[first:first + N_SFT]):
            contiguous += 1
    # P(contiguous block) = 6*5!*5!/10! ~ 0.24% per epoch
    assert contiguous <= 1


# ------------------------------------------------------- CFG mask dropout


def _spanned_batch(b=6, s=7, t=40, dist_dim=16, buckets=None):
    """Real collate output: text span [0,s), audio span [s,s+t)."""
    items = [Item(input_ids=np.arange(s, dtype=np.int32) + 1,
                  audio_latents=np.ones((t, 8), np.float32),
                  audio_distribution=np.ones((t, dist_dim), np.float32))
             for _ in range(b)]
    return collate(items, pad_token_id=0, buckets=buckets), s, t


def test_cfg_drop_rate_statistics():
    """Empirical drop rate over many positions ~ cfg_prob (reference
    per-position Bernoulli, dy_dataset.py:480-483)."""
    rng = np.random.default_rng(0)
    batch, s, t = _spanned_batch(b=64, t=100)
    n_pos = 64 * 100
    for p in (0.1, 0.3, 0.5):
        out = cfg_mask_dropout(batch, cfg_prob=p, rng=rng)
        dropped = batch["audio_mask"].sum() - out["audio_mask"].sum()
        rate = dropped / n_pos
        sig = np.sqrt(p * (1 - p) / n_pos)
        assert abs(rate - p) < 5 * sig, (p, rate)


def test_cfg_drop_positional_independence():
    """Dropout is per-POSITION, not per-row: with p=0.3 over 100 audio
    frames, every row keeps some and drops some, and the per-row dropped
    count has Binomial(100, .3) spread (rules out an all-or-nothing
    row-level CFG implementation, which is the V1 variant the reference
    commented out)."""
    rng = np.random.default_rng(1)
    batch, s, t = _spanned_batch(b=32, t=100)
    out = cfg_mask_dropout(batch, cfg_prob=0.3, rng=rng)
    span = out["audio_mask"][:, s:s + t]
    per_row_kept = span.sum(axis=1)
    assert (per_row_kept > 0).all() and (per_row_kept < t).all()
    # binomial spread: std of kept ~ sqrt(100*.3*.7) ~ 4.6; a row-level
    # scheme would put mass only at 0 and 100
    assert 2.0 < per_row_kept.std() < 9.0
    # independence across rows: not all rows drop the same positions
    assert np.unique(span, axis=0).shape[0] > 1


def test_cfg_dropout_only_touches_audio_span():
    """Text/ids mask untouched (V2 semantics — the reference's V1 text-drop
    is commented out at :478), labels/target/end masks untouched, and no
    position OUTSIDE the audio span ever turns True."""
    rng = np.random.default_rng(2)
    batch, s, t = _spanned_batch()
    out = cfg_mask_dropout(batch, cfg_prob=0.4, rng=rng)
    np.testing.assert_array_equal(out["ids_mask"], batch["ids_mask"])
    np.testing.assert_array_equal(out["target_mask"], batch["target_mask"])
    np.testing.assert_array_equal(out["end_mask"], batch["end_mask"])
    np.testing.assert_array_equal(out["distribute_labels"],
                                  batch["distribute_labels"])
    # dropout can only CLEAR bits, never set them
    assert not (out["audio_mask"] & ~batch["audio_mask"]).any()
    # and outside the collate audio span everything stays False
    outside = np.ones_like(out["audio_mask"])
    outside[:, s:s + t] = False
    assert not out["audio_mask"][outside].any()


def test_cfg_dropout_edge_probs():
    rng = np.random.default_rng(3)
    batch, _, _ = _spanned_batch()
    out0 = cfg_mask_dropout(batch, cfg_prob=0.0, rng=rng)
    np.testing.assert_array_equal(out0["audio_mask"], batch["audio_mask"])
    out1 = cfg_mask_dropout(batch, cfg_prob=1.0, rng=rng)
    assert not out1["audio_mask"].any()  # fully unconditional batch
    # input batch never mutated in place
    assert batch["audio_mask"].any()


def test_cfg_dropout_respects_length_buckets():
    """With static TPU length buckets the collate pads rows past the packed
    length; CFG dropout must keep pad positions False and its statistics
    must be computed over the TRUE span only."""
    rng = np.random.default_rng(4)
    batch, s, t = _spanned_batch(b=48, s=5, t=50, buckets=(128, 256))
    assert batch["audio_mask"].shape[1] == 128  # bucketed
    out = cfg_mask_dropout(batch, cfg_prob=0.25, rng=rng)
    # pad region (beyond s+t) all False before and after
    assert not out["audio_mask"][:, s + t:].any()
    # empirical rate over the true span
    span = out["audio_mask"][:, s:s + t]
    rate = 1.0 - span.mean()
    sig = np.sqrt(0.25 * 0.75 / span.size)
    assert abs(rate - 0.25) < 5 * sig


def test_sft_items_through_collate(pools, tok):
    """SftMixDataset items flow through the real collate: per-row audio
    span length equals that row's latent length (variable across the sft
    pool by construction), labels keep the ones-init convention in pad."""
    base, sft = pools
    ds = SftMixDataset(base, sft, tok, latent_kind="sigma")
    ds.set_epoch(0)
    items = [ds[i] for i in range(len(ds.lines))]
    batch = collate(items, pad_token_id=tok.pad_token_id)
    for i, it in enumerate(items):
        s = it.input_ids.shape[0]
        t = it.audio_latents.shape[0]
        assert batch["audio_mask"][i].sum() == t
        assert batch["ids_mask"][i].sum() == s
        assert batch["end_mask"][i].argmax() == s + t - 1
    # pad labels stay at the ones-init (end-distribution N(1,.) convention)
    pad = ~(batch["target_mask"] | batch["end_mask"])
    # positions after every span: labels untouched -> exactly 1.0
    last = batch["distribute_labels"][0, -1]
    if pad[0, -1]:
        np.testing.assert_allclose(last, 1.0)
