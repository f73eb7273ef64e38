"""In-framework CTC ASR on the tone-coded synthetic language: the runnable
WER back-end (VERDICT r4 missing #2). Verifies the acoustic code is
learnable, the trained model transcribes held-out renders, and WER flows
through the real scorer (eval/wer.py) end to end."""
import numpy as np
import jax.numpy as jnp
import pytest

from kalle_tpu.data import synth_speech as sl
from kalle_tpu.eval import ctc_asr


def test_renderer_deterministic_and_speaker_dependent():
    wav_a = sl.render("abc", 16000, speaker=0, seed=1)
    wav_b = sl.render("abc", 16000, speaker=0, seed=1)
    np.testing.assert_array_equal(wav_a, wav_b)
    wav_c = sl.render("abc", 16000, speaker=5, seed=1)
    assert wav_c.shape != wav_a.shape or not np.allclose(wav_c, wav_a)
    # text changes the audio too
    wav_d = sl.render("xyz", 16000, speaker=0, seed=1)
    n = min(len(wav_a), len(wav_d))
    assert not np.allclose(wav_a[:n], wav_d[:n])


def test_text_roundtrip():
    assert sl.decode_labels(sl.encode_text("hello world")) == "hello world"


@pytest.fixture(scope="module")
def trained_ctc():
    cfg = ctc_asr.CTCConfig.tiny()
    texts = ["abad", "cab", "dbca", "bad cab", "adcb", "ca db"]
    # random sentences over the same alphabet kill text priors: with few
    # training texts the conv head memorizes the "language model" and
    # hallucinates training substrings into held-out renders (observed:
    # 'cab' -> 'cad cab', a 'bad cab' suffix)
    rng = np.random.default_rng(42)
    extra = ["".join(sl.VOCAB[i] for i in rng.integers(0, 4,
                                                       rng.integers(3, 8)))
             for _ in range(24)]
    params, curve = ctc_asr.train_ctc(cfg, texts + extra, n_speakers=3,
                                      n_render=3, steps=900, batch=16,
                                      lr=2e-3, seed=0, log_every=100)
    return cfg, params, texts, curve


def test_ctc_loss_descends(trained_ctc):
    _, _, _, curve = trained_ctc
    assert curve[-1] < curve[0] * 0.5
    assert np.isfinite(curve[-1])


def test_ctc_transcribes_heldout_render(trained_ctc):
    """Transcribe RENDERS THE MODEL NEVER SAW (unseen seed + unseen speaker
    within the trained profile range): the model reads the acoustic code,
    not memorized waveforms."""
    cfg, params, texts, _ = trained_ctc
    hits = 0
    for i, text in enumerate(texts[:4]):
        wav = sl.render(text, cfg.sample_rate, speaker=i % 3, seed=991 + i)
        hyp = ctc_asr.transcribe_array(params, cfg, wav, cfg.sample_rate)
        hits += hyp == text
    assert hits >= 3  # exact-match transcriptions of unseen renders


def test_wer_pipeline_end_to_end(trained_ctc, tmp_path):
    """The full reference-shaped chain: wav files + meta.lst -> transcribe
    -> aaa_gt/aaa_asr -> eval/wer.py scorer -> a real WER number
    (ref tools/compute-wer.sh:24-27)."""
    from kalle_tpu.eval.harness import wer_pipeline
    from kalle_tpu.utils.audio import write_wav

    cfg, params, texts, _ = trained_ctc
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    lines = []
    for i, text in enumerate(texts[:3]):
        wav = sl.render(text, cfg.sample_rate, speaker=i % 3, seed=77 + i)
        write_wav(str(wav_dir / f"utt{i}---gen.wav"), wav[None],
                  cfg.sample_rate)
        lines.append(f"utt{i}|prompt|none.wav|{text}")
    meta = tmp_path / "meta.lst"
    meta.write_text("\n".join(lines))
    transcriber = ctc_asr.make_ctc_transcriber(params, cfg)
    wer = wer_pipeline("en", str(wav_dir), str(meta),
                       transcriber=transcriber)
    assert 0.0 <= wer < 15.0  # a real (percent) number from real transcription
    assert (wav_dir / "000000000_wer.txt").exists()
