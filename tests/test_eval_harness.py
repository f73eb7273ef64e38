"""Eval harness end-to-end with an injected fake transcriber and the
framework's own ECAPA embedder (no external checkpoints needed)."""
import os

import numpy as np

import jax

from kalle_tpu.eval.harness import (
    MetaItem,
    make_ecapa_embedder,
    read_meta_lst,
    speaker_similarity,
    wer_pipeline,
)
from kalle_tpu.models.conditioning.ecapa import EcapaConfig, init_params
from kalle_tpu.utils.audio import write_wav


def _tone(freq, sr=16000, dur=0.3):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None]


def test_wer_pipeline_end_to_end(tmp_path):
    meta_path = str(tmp_path / "meta.lst")
    with open(meta_path, "w") as f:
        f.write("u1|prompt one|p1.wav|hello world\n")
        f.write("u2|prompt two|p2.wav|good morning\n")
    wav_dir = str(tmp_path)
    for utt in ("u1", "u2"):
        write_wav(os.path.join(wav_dir, f"{utt}---gen.wav"), _tone(440), 16000)

    fake_asr = {"u1": "hello world", "u2": "good mourning"}

    def transcriber(path):
        utt = os.path.basename(path).split("---")[0]
        return fake_asr[utt]

    wer = wer_pipeline("en", wav_dir, meta_path, transcriber)
    assert abs(wer - 100 * 1 / 4) < 1e-6  # 1 sub over 4 ref words
    assert os.path.exists(os.path.join(wav_dir, "000000000_wer.txt"))
    items = read_meta_lst(meta_path)
    assert items[0].utt == "u1" and items[1].target_text == "good morning"


def test_speaker_similarity(tmp_path):
    sr = 16000
    wav_dir = str(tmp_path)
    prompt = os.path.join(wav_dir, "p1.wav")
    write_wav(prompt, _tone(220), sr)
    write_wav(os.path.join(wav_dir, "u1---gen.wav"), _tone(220), sr)
    meta = [MetaItem("u1", "x", prompt, "y")]

    ecfg = EcapaConfig(in_channels=80, channels=16, embd_dim=12, scale=4,
                       attn_bottleneck=8, pooled_channels=24)
    params = init_params(ecfg, jax.random.key(0))
    embed = make_ecapa_embedder(params, ecfg, sr)
    mean = speaker_similarity(wav_dir, meta, embed)
    # identical audio -> cosine == 1
    assert mean > 0.999
    assert os.path.exists(os.path.join(wav_dir, "0000000_sim.txt"))
    assert os.path.exists(os.path.join(wav_dir, "0000000_sim,json"))
