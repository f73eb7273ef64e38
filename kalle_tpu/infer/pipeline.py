"""InferTools — the synthesis entry point.

Equivalent public behavior to the reference's per-script `infer_tools`
classes (infer_vibevoice.py:222-379, infer_0828_sigma.py:209-399,
infer_0723.py): load codec + tokenizer + checkpoint, then for each test-set
row write {utt}.txt (caption), {utt}---copysyn.wav (ground-truth latent
round-trip — the codec-correctness baseline) and {utt}---gen.wav (AR
generation). Output dir: inference_results/{version}-{ckpt}[-timestamp]
(ref infer_0828_sigma.py:337-349).

TPU-first: generation is batched KV-cached decode (infer/generate.py);
codec decode is jitted; prompts are packed into padded buckets.
"""
from __future__ import annotations

import datetime
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ExperimentConfig, LlasaConfig
from ..data.datasets import load_sigma_latent, load_stableaudio_latent, read_jsonl
from ..data.tokens import build_prompt_ids, build_tokenizer
from ..models.codecs import melvae, oobleck, sigmavae
from ..models.lm import llasa
from ..utils.audio import write_wav
from .generate import generate


class Codec:
    """Uniform facade over the three codec families."""

    def __init__(self, kind: str, cfg, params):
        self.kind = kind
        self.cfg = cfg
        self.params = params

    @property
    def sample_rate(self) -> int:
        return self.cfg.sample_rate

    @property
    def samples_per_frame(self) -> int:
        """Audio samples produced per latent frame."""
        if self.kind == "stableaudio":
            return int(self.cfg.downsampling_ratio)
        return int(self.cfg.hop)  # sigma / melvae

    def astype(self, dtype) -> "Codec":
        """Cast codec params (bf16 decode is ~1.5x faster on v5e; wav
        deviation ~2e-2 worst-case — serving-quality tradeoff)."""
        self.params = jax.tree.map(lambda x: x.astype(dtype), self.params)
        self._dtype = jnp.dtype(dtype)
        return self

    def decode_latents(self, latents: jnp.ndarray, rng=None,
                       flow_reverse: bool = False) -> np.ndarray:
        """latents (B, T, d) -> host audio (B, C, T_audio).

        flow_reverse (melvae only): the AR model predicts FLOW-space
        latents; invert the residual-coupling flow before the decoder
        (ref backup/model copy.py:179-183 applies flow(reverse=True) to
        each sampled latent)."""
        latents = jnp.asarray(latents, getattr(self, "_dtype", jnp.float32))
        if self.kind == "sigma":
            return np.asarray(sigmavae.decode(self.params, self.cfg, latents))
        if self.kind == "stableaudio":
            z = jnp.transpose(latents, (0, 2, 1))  # (B, d, T)
            return np.asarray(oobleck.decode(self.params, self.cfg, z))
        if self.kind == "melvae":
            z = jnp.transpose(latents, (0, 2, 1))
            if flow_reverse:
                z = melvae.flow(self.params, self.cfg, z, reverse=True)
            return np.asarray(melvae.inference_from_latents(
                self.params, self.cfg, z,
                rng if rng is not None else jax.random.key(0),
                do_sample=False))
        raise ValueError(self.kind)

    def encode_audio(self, wav: jnp.ndarray) -> np.ndarray:
        if self.kind == "sigma":
            return np.asarray(sigmavae.encode(self.params, self.cfg, wav))
        if self.kind == "stableaudio":
            return np.asarray(oobleck.encode(self.params, self.cfg, wav))
        if self.kind == "melvae":
            return np.asarray(melvae.extract_latents(self.params, self.cfg, wav))
        raise ValueError(self.kind)

    @staticmethod
    def random_init(kind: str, key=None, **overrides) -> "Codec":
        key = key if key is not None else jax.random.key(0)
        mods = {"sigma": (sigmavae, sigmavae.SigmaVAEConfig),
                "stableaudio": (oobleck, oobleck.OobleckConfig),
                "melvae": (melvae, melvae.MelVAEConfig)}
        if kind not in mods:
            raise ValueError(kind)
        mod, cfg_cls = mods[kind]
        cfg = overrides.pop("cfg", None)
        if cfg is None:
            cfg = cfg_cls(**overrides)
        return Codec(kind, cfg, mod.init_params(cfg, key))

    @staticmethod
    def load(kind: str, config_path: str, ckpt_path: str) -> "Codec":
        if kind == "stableaudio":
            cfg, params = oobleck.load_pretrained(config_path, ckpt_path)
        elif kind == "melvae":
            cfg, params = melvae.load_pretrained(config_path, ckpt_path)
        else:
            raise ValueError(f"no pretrained loader for {kind}")
        return Codec(kind, cfg, params)


class InferTools:
    def __init__(
        self,
        cfg: LlasaConfig,
        params: dict,
        tokenizer,
        codec: Codec,
        output_root: str = "inference_results",
        version: str = "kalle_tpu",
        ckpt_name: str = "ckpt",
        timestamp: bool = True,
        seed: int = 0,
        flow_reverse: bool = False,
    ):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.codec = codec
        # melvae flow-space LMs: invert the coupling flow on generated
        # latents before decoding (ref backup/model copy.py:179-183)
        self.flow_reverse = flow_reverse
        self.rng = jax.random.key(seed)
        name = f"{version}-{ckpt_name}"
        if timestamp:
            name += "-" + datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        self.output_dir = os.path.join(output_root, name)
        os.makedirs(self.output_dir, exist_ok=True)

    def _next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    # ---- single utterance ----

    def synthesize(self, text: str, max_frames: int = 200,
                   prompt_latents: Optional[np.ndarray] = None) -> np.ndarray:
        """text -> audio (C, T). The infer_single API used by web demos
        (ref infer_backup/infer_single_nos.py)."""
        ids = np.asarray(build_prompt_ids(self.tokenizer, text), np.int32)
        res = generate(
            self.params, self.cfg, jnp.asarray(ids[None, :]),
            jnp.ones((1, len(ids)), jnp.int32), self._next_rng(),
            max_frames=max_frames,
            prompt_latents=None if prompt_latents is None
            else jnp.asarray(prompt_latents[None]),
        )
        n = int(res.n_frames[0])
        lat = self._latents_for_decode(res, slice(0, max(n, 1)))
        audio = self.codec.decode_latents(lat, self._next_rng(),
                                          flow_reverse=self.flow_reverse)
        return audio[0]

    def _latents_for_decode(self, res, sl,
                            resample_std: Optional[float] = None) -> jnp.ndarray:
        """Variant semantics: sigma decodes the SAMPLED latents
        (ref model_sigmaVAE.py:133); stableaudio/melvae decode means, or
        re-sample with a scaled std (x0.8 in the reference,
        ref infer_0828_sigma.py:319-323) via resample_std."""
        if self.cfg.head_variant == "sigma":
            return res.samples[:, sl]
        mean = res.means[:, sl]
        if resample_std:
            std = jnp.exp(res.log_scales[:, sl]) * resample_std
            return mean + std * jax.random.normal(self._next_rng(), mean.shape,
                                                  mean.dtype)
        return mean

    # ---- batched synthesis ----

    PROMPT_BUCKETS = (16, 32, 64, 128, 256, 512)

    def synthesize_batch(
        self,
        texts: Sequence[str],
        max_frames: int = 200,
        batch_size: int = 8,
        prompt_buckets: Sequence[int] = PROMPT_BUCKETS,
    ) -> List[np.ndarray]:
        """Batched text -> audio, packed into left-padded prompt-length
        buckets: one `generate` compile per (bucket, batch_size) pair
        regardless of how many distinct prompt lengths arrive — the TPU
        equivalent of the reference's padded batch inference
        (ref tools/batch_infer.py:72-77). Short groups are padded by
        repeating a row (discarded on output), so batch shape stays static.

        Returns audio arrays (C, T_i) aligned with `texts`, each trimmed to
        its own generated frame count.
        """
        ids_list = [np.asarray(build_prompt_ids(self.tokenizer, t), np.int32)
                    for t in texts]
        order = sorted(range(len(texts)), key=lambda i: len(ids_list[i]))
        out: List[Optional[np.ndarray]] = [None] * len(texts)
        spf = self.codec.samples_per_frame

        for g0 in range(0, len(order), batch_size):
            group = order[g0:g0 + batch_size]
            max_len = max(len(ids_list[i]) for i in group)
            bucket = next((bk for bk in prompt_buckets if bk >= max_len),
                          max_len)
            rows = group + [group[-1]] * (batch_size - len(group))
            ids = np.zeros((batch_size, bucket), np.int32)
            mask = np.zeros((batch_size, bucket), np.int32)
            for r, i in enumerate(rows):
                n = len(ids_list[i])
                ids[r, bucket - n:] = ids_list[i]  # LEFT padding
                mask[r, bucket - n:] = 1

            res = generate(self.params, self.cfg, jnp.asarray(ids),
                           jnp.asarray(mask), self._next_rng(),
                           max_frames=max_frames)
            lat = self._latents_for_decode(res, slice(0, max_frames))
            audio = self.codec.decode_latents(lat, self._next_rng(),
                                              flow_reverse=self.flow_reverse)
            n_frames = np.asarray(res.n_frames)
            for r, i in enumerate(group):
                n = max(int(n_frames[r]), 1)
                out[i] = np.asarray(audio[r, :, :n * spf])
        return out  # type: ignore[return-value]

    # ---- batch over a jsonl test set ----

    def infer_jsonl(self, meta_path_or_rows, max_frames: int = 200,
                    copysyn: bool = True, limit: Optional[int] = None,
                    caption_keys: Sequence[str] = ("AudioSetCaps", "caption",
                                                   "text"),
                    batch_size: int = 8) -> List[str]:
        """Write {utt}.txt / {utt}---copysyn.wav / {utt}---gen.wav per row.
        Generation runs batched through length-bucketed `synthesize_batch`
        (ref tools/batch_infer.py batches prompts the same way); copysyn
        stays per-row because ground-truth latent lengths vary freely."""
        rows = (read_jsonl(meta_path_or_rows)
                if isinstance(meta_path_or_rows, str) else list(meta_path_or_rows))
        if limit:
            rows = rows[:limit]
        sr = self.codec.sample_rate
        utts, texts, copysyn_paths = [], [], {}
        for idx, row in enumerate(rows):
            utt = str(row.get("id", idx))
            text = next(str(row[k]) for k in caption_keys if row.get(k))
            utts.append(utt)
            texts.append(text)

            with open(os.path.join(self.output_dir, f"{utt}.txt"), "w") as f:
                f.write(text)

            if copysyn and row.get("vae"):
                # ground-truth latent round-trip (ref infer_vibevoice.py:336-347)
                if self.codec.kind == "sigma":
                    mean = load_sigma_latent(row["vae"])  # (T, d)
                    lat = sigmavae.sample(self._next_rng(),
                                          jnp.asarray(mean[None]), self.cfg.sigma)
                else:
                    dist, lat_np = load_stableaudio_latent(
                        row["vae"], np.random.default_rng(0))
                    lat = jnp.asarray(lat_np[None])
                audio = self.codec.decode_latents(lat, self._next_rng())
                p = os.path.join(self.output_dir, f"{utt}---copysyn.wav")
                write_wav(p, audio[0], sr)
                copysyn_paths[utt] = p

        gens = self.synthesize_batch(texts, max_frames=max_frames,
                                     batch_size=batch_size)
        written = []
        for utt, audio in zip(utts, gens):
            if utt in copysyn_paths:
                written.append(copysyn_paths[utt])
            p = os.path.join(self.output_dir, f"{utt}---gen.wav")
            write_wav(p, audio, sr)
            written.append(p)
        return written
