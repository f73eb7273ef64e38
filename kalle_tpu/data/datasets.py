"""Host-side datasets: jsonl metadata + precomputed-latent .npy files.

Reference equivalents:
  * TTSDataset_online_parquet (offline-latent jsonl variant,
    ref twj_dataset_offline.py:157-410): rows carry `speech`, `caption` /
    `AudioSetCaps`, `id`, `vae` = path to a (1, T, 64) .npy latent.
  * stable-audio offline variant (ref twj_data_offline_sd2.py:239-338):
    `vae_latent_path` -> (1, 128, T) mean||scale .npy, reparam-sampled
    per item via vae_sample.
  * error tolerance: any failure (missing file, NaN/Inf) resamples a
    random index (ref twj_dataset_offline.py:240-324).

TPU-first changes: items feed a token-budget batcher that pads to static
length buckets (XLA-friendly), and the prefetcher is a thread pool feeding
a bounded queue (ref data_pool.py:10-118 semantics).
"""
from __future__ import annotations

import json
import random
import threading
import queue
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .collate import DynamicBatchGenerator, Item, collate
from .tokens import build_prompt_ids


def read_jsonl(path: str) -> List[dict]:
    """Reconstruction of the missing twj_utils.read_jsonl (broken symlink;
    call sites ref twj_dataset_offline.py:12,175)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(json.loads(line))
    return out


def vae_sample(mean: np.ndarray, scale: np.ndarray, rng: np.random.Generator):
    """Reparameterized sample + KL — reconstruction of twj_utils.vae_sample,
    which exists verbatim in the vendored lib
    (ref stable_audio_tools/models/bottleneck.py:51-62). NOTE the quirk:
    `scale` is used directly as the stdev (line 56), NOT softplus'd."""
    stdev = scale
    latents = rng.standard_normal(mean.shape, dtype=np.float32) * stdev + mean
    var = stdev * stdev
    logvar = np.log(np.maximum(var, 1e-12))
    kl = (mean * mean + var - logvar - 1).sum(1).mean()
    return latents, kl


def load_sigma_latent(path: str) -> np.ndarray:
    """(1, T, d) .npy -> latents == means (sigma-VAE keeps means; noising
    happens in the model, ref twj_dataset_offline.py:404-410)."""
    arr = np.load(path)
    if arr.ndim == 3:
        arr = arr[0]
    return arr.astype(np.float32)  # (T, d)


def load_stableaudio_latent(path: str, rng: np.random.Generator):
    """(1, 2d, T) mean||scale .npy -> (dist (T, 2d), sampled latents (T, d))
    (ref twj_data_offline_sd2.py + twj_dataset_offline.py:389-400)."""
    arr = np.load(path)
    if arr.ndim == 2:
        arr = arr[None]
    arr = arr.astype(np.float32)  # (1, 2d, T)
    d2 = arr.shape[1]
    mean, scale = arr[:, : d2 // 2], arr[:, d2 // 2:]
    latents, _ = vae_sample(mean, scale, rng)
    dist = np.transpose(arr[0])      # (T, 2d)
    lat = np.transpose(latents[0])   # (T, d)
    return dist, lat


class OfflineLatentDataset:
    """jsonl-of-{caption, vae, speech} dataset with retry-on-error semantics."""

    def __init__(
        self,
        meta_path_or_lines,
        tokenizer,
        latent_kind: str = "sigma",
        caption_keys: Sequence[str] = ("AudioSetCaps", "caption", "text"),
        seed: int = 0,
        max_length: int = 2048,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        if isinstance(meta_path_or_lines, str):
            self.lines = read_jsonl(meta_path_or_lines)
        else:
            self.lines = list(meta_path_or_lines)
        if shard_count > 1:  # per-host sharding
            self.lines = self.lines[shard_index::shard_count]
        self.tokenizer = tokenizer
        self.latent_kind = latent_kind
        self.caption_keys = caption_keys
        self.max_length = max_length
        self.rng = np.random.default_rng(seed)
        self.py_rng = random.Random(seed)
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.lines)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.py_rng.seed(epoch)

    def _caption(self, row: dict) -> str:
        for k in self.caption_keys:
            if k in row and row[k]:
                return str(row[k])
        raise KeyError(f"no caption key in {list(row)}")

    def _latents(self, row: dict):
        """row -> (latents (T, d), distribution (T, d or 2d)). Hook for
        subclasses with other latent sources (e.g. MelVAECacheDataset)."""
        vae_path = row["vae"] if "vae" in row else row["vae_latent_path"]
        if self.latent_kind == "sigma":
            lat = load_sigma_latent(vae_path)
            return lat, lat.copy()
        dist, lat = load_stableaudio_latent(vae_path, self.rng)
        return lat, dist

    def __getitem__(self, idx: int) -> Item:
        for _attempt in range(64):
            try:
                row = self.lines[idx]
                if not row:
                    raise ValueError("empty row")
                text = self._caption(row)
                lat, dist = self._latents(row)
                ids = np.asarray(build_prompt_ids(self.tokenizer, text), np.int32)
                if not (np.isfinite(lat).all() and np.isfinite(dist).all()):
                    raise ValueError("NaN/Inf in latents")
                if ids.shape[0] + lat.shape[0] > self.max_length:
                    raise ValueError("sequence too long")
                return Item(input_ids=ids, audio_latents=lat,
                            audio_distribution=dist, raw_text=text,
                            speech_path=str(row.get("speech", "")))
            except Exception as e:  # retry-with-random-resample (ref :315-322)
                idx = self.py_rng.randint(0, len(self.lines) - 1)
                last_err = e
        raise RuntimeError(f"dataset failed 64 retries: {last_err}")

    def shuffled_indices(self) -> List[int]:
        idxs = list(range(len(self.lines)))
        self.py_rng.shuffle(idxs)
        return idxs


class SftMixDataset(OfflineLatentDataset):
    """SFT mixing: each epoch trains on sft_lines + an equal-size random
    sample of base_lines (ref backup/dy_dataset.py TTSDataset_online_lance_
    for_sft.set_epoch: sft_lst + random.sample(base_lst, len(sft_lst)))."""

    def __init__(self, base_meta, sft_meta, tokenizer, **kw):
        self.base_lines = (read_jsonl(base_meta) if isinstance(base_meta, str)
                           else list(base_meta))
        self.sft_lines = (read_jsonl(sft_meta) if isinstance(sft_meta, str)
                          else list(sft_meta))
        super().__init__(self.sft_lines, tokenizer, **kw)
        self.set_epoch(0)

    def set_epoch(self, epoch: int) -> None:
        super().set_epoch(epoch)
        if hasattr(self, "base_lines"):
            n = min(len(self.sft_lines), len(self.base_lines))
            sampled = self.py_rng.sample(self.base_lines, n)
            self.lines = self.sft_lines + sampled
            self.py_rng.shuffle(self.lines)


class MelVAECacheDataset(OfflineLatentDataset):
    """mel-VAE hybrid dataset: latents cached NEXT TO the wav as
    `{speech_stem}.melvae.npy` (1, 2*dim, T) mean||log_scale. If the cache
    file exists it is loaded; otherwise the wav is encoded through the
    injected `encode_fn` and (unlike the reference, which re-encodes every
    epoch) written back so the first epoch pays the encode once
    (ref training_version/melvae/twj_dataset_offline.py:123-138).

    encode_fn: (1, 1, T) float32 wav at target_sr -> (1, 2*dim, T') numpy
    (typically a jitted melvae.extract_latents + np.asarray)."""

    def __init__(self, meta_path_or_lines, tokenizer,
                 encode_fn: Callable[[np.ndarray], np.ndarray],
                 target_sr: int = 16000, write_cache: bool = True, **kw):
        kw.setdefault("latent_kind", "melvae")
        super().__init__(meta_path_or_lines, tokenizer, **kw)
        self.encode_fn = encode_fn
        self.target_sr = target_sr
        self.write_cache = write_cache

    def _latents(self, row: dict):
        import os

        speech = row["speech"]
        cache = os.path.splitext(speech)[0] + ".melvae.npy"
        if os.path.exists(cache):
            mean_scale = np.load(cache)  # (1, 2*dim, T)
        else:
            from ..utils.audio import read_wav, resample_linear

            wav, sr = read_wav(speech)
            wav = resample_linear(wav.mean(axis=0, keepdims=True),
                                  sr, self.target_sr)
            mean_scale = np.asarray(self.encode_fn(wav[None].astype(np.float32)))
            if self.write_cache:
                tmp = cache + ".tmp"
                np.save(tmp, mean_scale)
                os.replace(tmp + ".npy" if not tmp.endswith(".npy") else tmp,
                           cache)
        d = mean_scale.shape[1] // 2
        mean, logs = mean_scale[0, :d], mean_scale[0, d:]
        # reparameterized sample (ref :134-136), channel-first -> (T, dim)
        lat = (mean + np.exp(logs) * self.rng.standard_normal(mean.shape)
               ).astype(np.float32).T
        dist = mean_scale[0].astype(np.float32).T  # (T, 2*dim) mean||logs
        return lat, dist


class PrefetchLoader:
    """Threaded producer-consumer batch loader (ref data_pool.py:10-161).

    Reads items on worker threads, packs them with the token-budget
    DynamicBatchGenerator, collates to static bucket shapes, and queues
    ready numpy batches for the device feed."""

    def __init__(
        self,
        dataset: OfflineLatentDataset,
        pad_token_id: int,
        max_token_length: int = 11000,
        batch_size: int = 16,
        use_dynamic: bool = True,
        buckets: Optional[Sequence[int]] = None,
        num_workers: int = 2,
        prefetch: int = 8,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.pad_token_id = pad_token_id
        self.buckets = tuple(buckets) if buckets else None
        self.gen_args = (max_token_length, batch_size, use_dynamic)
        self.num_workers = max(1, num_workers)
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _produce(self, epoch: int):
        # item production is delegated to the shared DataPrefetchPool
        # (single prefetch engine in the framework, data_pool.finite_iter)
        from .data_pool import DataPrefetchPool

        gen = DynamicBatchGenerator(*self.gen_args)
        pool = DataPrefetchPool(self.dataset, num_workers=self.num_workers)
        for it in pool.finite_iter(self.dataset.shuffled_indices(),
                                   stop=self._stop):
            b = gen.add(it)
            if b:
                self.q.put(collate(b, self.pad_token_id, self.buckets))
        tail = gen.flush()
        if tail and not self._stop.is_set():
            self.q.put(collate(tail, self.pad_token_id, self.buckets))
        self.q.put(None)  # epoch sentinel

    def epoch_iter(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        self.dataset.set_epoch(epoch)
        self._stop.clear()
        self._thread = threading.Thread(target=self._produce, args=(epoch,),
                                        daemon=True)
        self._thread.start()
        while True:
            b = self.q.get()
            if b is None:
                break
            yield b

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass


class AttrDict(dict):
    """dict with attribute access — twj_utils.AttrDict reconstruction
    (used for codec h-configs, ref twj_dataset_offline.py:96-99)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


# twj_utils API aliases (the broken symlink exported both names)
load_jsonl = read_jsonl
