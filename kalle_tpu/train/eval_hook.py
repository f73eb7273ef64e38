"""Mid-training listening-test hook.

Reference: train_offline.py:289-326 — every log_interval, decode the first
row's predicted means through the frozen codec and write
`sample_{step}-gen.wav`, the ground-truth latent decode `-gt.wav`, and the
raw source copy `-gt2.wav` into eval_audios_*/ (SURVEY.md §4.5)."""
from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lm import llasa
from ..utils.audio import write_wav


def make_eval_audio_hook(codec, out_dir: Optional[str] = None,
                         every: int = 1):
    """Returns an eval_hook(trainer, step, np_batch) for Trainer."""
    calls = {"n": 0}

    def hook(trainer, step, np_batch):
        calls["n"] += 1
        if calls["n"] % every:
            return
        d = out_dir or os.path.join(trainer.exp.exp_dir,
                                    trainer.exp.project_name, "eval_audios")
        os.makedirs(d, exist_ok=True)
        cfg = trainer.cfg
        batch = {k: jnp.asarray(v) for k, v in np_batch.items()
                 if hasattr(v, "shape")}
        out = llasa.forward(trainer.state.params, cfg, batch,
                            rng=jax.random.key(step))
        audio_mask = np.asarray(np_batch["audio_mask"][0], bool)
        n = int(audio_mask.sum())
        if n == 0:
            return
        sr = codec.sample_rate

        # predicted: sample from pre_mean like the reference (:293)
        mean = np.asarray(out["pre_mean"], np.float32)[0]
        if cfg.head_variant == "sigma":
            lat = mean + cfg.sigma * np.random.default_rng(step).standard_normal(
                mean.shape).astype(np.float32)
        else:
            lat = mean
        lat = lat[audio_mask][None]  # (1, n, d)
        audio = codec.decode_latents(jnp.asarray(lat))
        write_wav(os.path.join(d, f"sample_{step}-gen.wav"), audio[0], sr)

        # ground truth latents
        gt = np.asarray(np_batch["audio_latents"][0], np.float32)
        gt = gt[audio_mask][None]
        audio = codec.decode_latents(jnp.asarray(gt))
        write_wav(os.path.join(d, f"sample_{step}-gt.wav"), audio[0], sr)

        text = (np_batch.get("raw_texts") or [""])[0]
        with open(os.path.join(d, f"sample_{step}-gen.txt"), "w") as f:
            f.write(text)
        src = (np_batch.get("speech_paths") or [""])[0]
        if src and os.path.exists(src):
            shutil.copy2(src, os.path.join(d, f"sample_{step}-gt2.wav"))

    return hook
