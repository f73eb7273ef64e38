"""Online dataset (device-side encode) + prefetch pool parity layer."""
import io
import queue

import numpy as np
import pytest

import jax

from kalle_tpu.data.collate import Item, collate
from kalle_tpu.data.data_pool import (
    DataPrefetchPool,
    DynamicPrefetchBatchIterator,
    PrefetchDataIterator,
)
from kalle_tpu.data.online import (
    OnlineAudioDataset,
    OnlineEncoder,
    decode_audio_bytes,
    normalize_peak,
)
from kalle_tpu.data.tokens import build_tokenizer
from kalle_tpu.infer.pipeline import Codec
from kalle_tpu.models.codecs.oobleck import OobleckConfig
from kalle_tpu.utils.audio import write_wav


def _wav_bytes(freq=440, sr=16000, dur=0.2):
    import tempfile, os

    t = np.arange(int(sr * dur)) / sr
    x = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None]
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    write_wav(path, x, sr)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


def test_online_dataset_end_to_end():
    tok = build_tokenizer()
    cfg = OobleckConfig(io_channels=2, channels=8, latent_dim=4,
                        encoder_out_dim=8, c_mults=(1, 2), strides=(2, 4),
                        use_snake=True)
    codec = Codec.random_init("stableaudio", cfg=cfg)
    codec.cfg = cfg
    enc = OnlineEncoder(codec, sample_rate=16000)
    rows = [{"audio": {"bytes": _wav_bytes(300 + 100 * i)},
             "text_normalized": f"tone {i}", "id": f"u{i}"} for i in range(3)]
    ds = OnlineAudioDataset(rows, tok, enc)
    items = ds.make_items([0, 1, 2])
    assert len(items) == 3
    for it in items:
        assert it.audio_latents.shape[-1] == 4       # latent dim
        assert it.audio_distribution.shape[-1] == 8  # mean||scale
        assert it.audio_latents.shape[0] == it.audio_distribution.shape[0]
        assert np.isfinite(it.audio_latents).all()
    batch = collate(items, tok.pad_token_id)
    assert batch["input_ids"].shape[0] == 3


def test_decode_and_normalize():
    wav = decode_audio_bytes(_wav_bytes(), 8000)
    assert wav.shape[0] == 1 and wav.shape[1] > 0
    n = normalize_peak(wav)
    assert abs(np.abs(n).max() - 0.95) < 1e-3


class _ToyDataset:
    def __len__(self):
        return 100

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return Item(input_ids=np.arange(3, dtype=np.int32),
                    audio_latents=rng.normal(size=(4, 2)).astype(np.float32),
                    audio_distribution=rng.normal(size=(4, 2)).astype(np.float32))


def test_prefetch_pool_iterators():
    pool = DataPrefetchPool(_ToyDataset(), max_size=32, num_workers=2).start()
    try:
        it = PrefetchDataIterator(pool, batch_size=4)
        batch = next(it)
        assert len(batch) == 4
        dyn = DynamicPrefetchBatchIterator(pool, max_token_length=15)
        dbatch = next(dyn)
        assert 1 <= len(dbatch) <= 2  # item_len 7 -> 2 items max within 15
    finally:
        pool.stop()
