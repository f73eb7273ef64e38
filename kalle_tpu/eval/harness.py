"""ASR + speaker-similarity evaluation harnesses.

Behavioral equivalents of tools/asr_test.py, tools/compute-wer.sh, and
tools/sim_test.py:
  * meta.lst fixtures: `utt|prompt_text|prompt_wav|target_text`
    (ref tools/asr_test.py:67-71)
  * EN ASR via Whisper-large-v3, ZH via FunASR Paraformer
    (ref tools/asr_test.py:28-45) — both need external checkpoints, so
    transcriber backends are injectable and the built-ins degrade with a
    clear error when weights are unavailable (this image has no model hub).
  * outputs aaa_gt.txt / aaa_asr.txt with punctuation -> space
    (ref :96-99), then the WER scorer; speaker-sim writes per-utt json +
    mean txt (ref tools/sim_test.py:83-99).
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .wer import compute_wer, read_trn

_PUNCT = re.compile(r"[^\w\s一-鿿]")


@dataclass
class MetaItem:
    utt: str
    prompt_text: str
    prompt_wav: str
    target_text: str


def read_meta_lst(path: str) -> List[MetaItem]:
    items = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("|")
            items.append(MetaItem(*parts[:4]))
    return items


def clean_text(text: str) -> str:
    """punctuation -> space (ref tools/asr_test.py:96-99)."""
    return " ".join(_PUNCT.sub(" ", text).split())


def make_whisper_transcriber(model_name: str = "openai/whisper-large-v3",
                             language: str = "en") -> Callable[[str], str]:
    """EN backend (ref tools/asr_test.py:28-32). Requires local weights."""
    from transformers import pipeline

    asr = pipeline("automatic-speech-recognition", model=model_name)
    return lambda wav_path: asr(
        wav_path, generate_kwargs={"language": language,
                                   "task": "transcribe"})["text"]


def make_paraformer_transcriber(
    model: str = "iic/speech_seaco_paraformer_large_asr_nat-zh-cn-16k-common-vocab8404-pytorch",
    vad_model: Optional[str] = "iic/speech_fsmn_vad_zh-cn-16k-common-pytorch",
    punc_model: Optional[str] = "iic/punc_ct-transformer_cn-en-common-vocab471067-large",
    to_simplified: bool = True,
) -> Callable[[str], str]:
    """ZH backend: FunASR SeACo-Paraformer with VAD + punctuation models,
    output converted to simplified Chinese (ref tools/asr_test.py:34-45,
    85-95). Requires the funasr package + local checkpoints; transcription
    errors degrade to "" exactly as the reference does."""
    from funasr import AutoModel  # gated: not baked into this image

    asr = AutoModel(model=model, vad_model=vad_model, punc_model=punc_model,
                    disable_update=True, disable_pbar=True)
    try:
        import zhconv

        def _simplify(t: str) -> str:
            return zhconv.convert(t, "zh-cn") if to_simplified else t
    except ImportError:
        def _simplify(t: str) -> str:
            return t

    def transcribe(wav_path: str) -> str:
        try:
            res = asr.generate(input=wav_path, batch_size_s=300)
            return _simplify(res[0]["text"])
        except Exception:
            return ""  # ref asr_test.py:92-94

    return transcribe


def make_transcriber(lang: str, **kwargs) -> Callable[[str], str]:
    """Language dispatch matching the reference CLI: en -> Whisper-large-v3,
    zh -> Paraformer (ref tools/asr_test.py:46-50)."""
    if lang == "en":
        return make_whisper_transcriber(**kwargs)
    if lang == "zh":
        return make_paraformer_transcriber(**kwargs)
    raise ValueError(f"unsupported ASR language {lang!r} (en|zh)")


def run_asr(
    lang: str,
    wav_dir: str,
    meta: List[MetaItem],
    transcriber: Optional[Callable[[str], str]] = None,
    gen_suffix: str = "---gen.wav",
) -> Tuple[str, str]:
    """Transcribe every {utt}{gen_suffix} in wav_dir listed in meta ->
    (aaa_gt.txt, aaa_asr.txt) paths (ref tools/asr_test.py:47-99).
    transcriber=None builds the default backend for `lang` via
    make_transcriber (en: Whisper, zh: Paraformer)."""
    if transcriber is None:
        transcriber = make_transcriber(lang)
    gt_path = os.path.join(wav_dir, "aaa_gt.txt")
    asr_path = os.path.join(wav_dir, "aaa_asr.txt")
    with open(gt_path, "w", encoding="utf-8") as gt, \
            open(asr_path, "w", encoding="utf-8") as hyp:
        for item in meta:
            wav = os.path.join(wav_dir, item.utt + gen_suffix)
            if not os.path.exists(wav):
                wav = os.path.join(wav_dir, item.utt + ".wav")
            if not os.path.exists(wav):
                continue
            text = transcriber(wav)
            gt.write(f"{item.utt} {clean_text(item.target_text)}\n")
            hyp.write(f"{item.utt} {clean_text(text)}\n")
    return gt_path, asr_path


def wer_pipeline(lang: str, wav_dir: str, meta_path: str,
                 transcriber: Optional[Callable[[str], str]] = None,
                 char_level: Optional[bool] = None,
                 gen_suffix: str = "---gen.wav") -> float:
    """compute-wer.sh equivalent: asr -> scorer -> 000000000_wer.txt
    (ref tools/compute-wer.sh:24-27). gen_suffix selects which synthesis
    arm to score (---gen.wav vs ---copysyn.wav)."""
    meta = read_meta_lst(meta_path)
    gt, hyp = run_asr(lang, wav_dir, meta, transcriber,
                      gen_suffix=gen_suffix)
    char_level = (lang == "zh") if char_level is None else char_level
    tag = "" if gen_suffix == "---gen.wav" else \
        "_" + gen_suffix.split(".")[0].strip("-")
    out_path = os.path.join(wav_dir, f"000000000_wer{tag}.txt")
    with open(out_path, "w", encoding="utf-8") as f:
        wer, _ = compute_wer(read_trn(gt), read_trn(hyp),
                             char_level=char_level, verbose=True, out=f)
    return wer


def speaker_similarity(
    wav_dir: str,
    meta: List[MetaItem],
    embed_fn: Callable[[str], np.ndarray],
    gen_suffix: str = "---gen.wav",
) -> float:
    """Cosine similarity between prompt and generated embeddings; writes
    per-utt `0000000_sim,json` + mean `0000000_sim.txt`
    (ref tools/sim_test.py:67-99). embed_fn: wav path -> embedding; the
    reference uses WavLM-large ECAPA_TDNN_SMALL (external ckpt) — inject
    any embedder, e.g. this framework's ECAPA via mel frontend."""
    sims: Dict[str, float] = {}
    for item in meta:
        gen = os.path.join(wav_dir, item.utt + gen_suffix)
        if not (os.path.exists(gen) and os.path.exists(item.prompt_wav)):
            continue
        a = embed_fn(item.prompt_wav)
        b = embed_fn(gen)
        sim = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        sims[item.utt] = sim
    with open(os.path.join(wav_dir, "0000000_sim,json"), "w") as f:
        json.dump(sims, f, indent=2)
    mean = float(np.mean(list(sims.values()))) if sims else 0.0
    with open(os.path.join(wav_dir, "0000000_sim.txt"), "w") as f:
        f.write(f"{mean}\n")
    return mean


def make_spectral_embedder(sample_rate: int = 16000):
    """Weight-free speaker fingerprint: per-band log-mel mean + std over
    time (long-term average spectrum statistics). A RANDOM-init ECAPA
    saturates (all sims ~0.99) so it cannot discriminate speakers; spectral
    statistics separate the per-speaker formant/f0 structure without any
    external checkpoint. Used by the voice-clone acceptance gate
    (tools/run_experiment.prompt_clone_gate); inject a real WavLM/ECAPA
    embedder (ref tools/sim_test.py:23-26) when weights are available."""
    import jax.numpy as jnp

    from ..ops.mel import mel_spectrogram
    from ..utils.audio import read_wav, resample_linear

    def embed(wav_path: str) -> np.ndarray:
        audio, sr = read_wav(wav_path)
        audio = resample_linear(audio, sr, sample_rate)
        mono = audio.mean(axis=0, keepdims=True)
        mel = np.asarray(mel_spectrogram(jnp.asarray(mono),
                                         sample_rate=sample_rate))[0]
        logm = np.log(np.maximum(mel, 1e-5))  # (n_mels, T)
        return np.concatenate([logm.mean(axis=1), logm.std(axis=1)])

    return embed


def make_ecapa_embedder(params, ecapa_cfg, sample_rate: int = 16000):
    """Speaker embedder from this framework's ECAPA + mel frontend —
    a self-contained substitute for the external WavLM checkpoint."""
    import jax.numpy as jnp

    from ..models.conditioning import ecapa as ecapa_mod
    from ..ops.mel import mel_spectrogram
    from ..utils.audio import read_wav, resample_linear

    def embed(wav_path: str) -> np.ndarray:
        audio, sr = read_wav(wav_path)
        audio = resample_linear(audio, sr, sample_rate)
        mono = audio.mean(axis=0, keepdims=True)
        mel = mel_spectrogram(jnp.asarray(mono), sample_rate=sample_rate)
        emb = ecapa_mod.forward(params, ecapa_cfg,
                                jnp.transpose(mel, (0, 2, 1)))
        return np.asarray(emb)[0]

    return embed
