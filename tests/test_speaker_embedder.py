"""Trained speaker embedder (VERDICT r4 missing #3): the ECAPA trained on
synthetic speaker classification must separate same-speaker from
cross-speaker pairs on held-out renders; a random-init ECAPA must not
(it saturates) — the property that makes the speaker-sim protocol
discriminative (ref tools/sim_test.py:26-49 trained-WavLM role)."""
import dataclasses

import jax
import numpy as np
import pytest

from kalle_tpu.eval import speaker_embedder as se


@pytest.fixture(scope="module")
def trained():
    cfg = dataclasses.replace(se.SpeakerTrainConfig.tiny(), steps=300)
    params, ecfg, curve = se.train_speaker_embedder(cfg)
    return cfg, params, ecfg, curve


def test_classification_loss_converges(trained):
    _, _, _, curve = trained
    assert curve[-1] < 0.1 * curve[0]


def test_heldout_margin_separates_speakers(trained):
    cfg, params, ecfg, _ = trained
    pos, neg = se.margin(params, ecfg, cfg)
    assert pos - neg > 0.2, (pos, neg)
    assert pos > 0.5


def test_random_init_cannot_discriminate(trained):
    """The justification for training at all: random weights saturate."""
    cfg, _, ecfg, _ = trained
    rnd = se.ecapa_mod.init_params(ecfg, jax.random.key(42))
    pos, neg = se.margin(rnd, ecfg, cfg)
    assert abs(pos - neg) < 0.1


def test_embedder_path_interface(trained, tmp_path):
    """File-path embedder contract used by harness.speaker_similarity:
    same speaker, different sentence -> high cosine; different speaker ->
    lower."""
    from kalle_tpu.data import synth_speech as sl
    from kalle_tpu.utils.audio import write_wav

    cfg, params, ecfg, _ = trained
    sr = cfg.sample_rate
    paths = {}
    for name, (spk, text, seed) in {
        "a0": (0, "voj kels", 1), "a1": (0, "mig warp", 2),
        "b0": (3, "voj kels", 3),
    }.items():
        wav = sl.render(text, sr, speaker=spk, seed=seed)
        p = str(tmp_path / f"{name}.wav")
        write_wav(p, wav[None], sr)
        paths[name] = p
    embed = se.make_trained_embedder(params, ecfg, cfg)
    e = {k: v / np.linalg.norm(v) for k, v in
         ((k, embed(p)) for k, p in paths.items())}
    same = float(e["a0"] @ e["a1"])
    diff = float(e["a0"] @ e["b0"])
    assert same > diff
