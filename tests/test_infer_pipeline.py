"""End-to-end TTS pipeline: jsonl test set -> caption txt + copysyn wav +
generated wav (the reference's infer_vibevoice.py flow) on tiny models."""
import json
import os

import numpy as np
import pytest

import jax

from kalle_tpu.core.config import LlamaConfig, LlasaConfig
from kalle_tpu.data.tokens import build_tokenizer
from kalle_tpu.infer.pipeline import Codec, InferTools
from kalle_tpu.models.lm import llasa
from kalle_tpu.utils.audio import read_wav, write_wav


@pytest.fixture
def setup(tmp_path):
    tok = build_tokenizer()
    cfg = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=len(tok)),
                      latent_dim=8, audio_proj_dim=64, head_variant="sigma")
    params = llasa.init_params(cfg, jax.random.key(0))
    from kalle_tpu.models.codecs.sigmavae import SigmaVAEConfig

    codec = Codec.random_init("sigma", cfg=SigmaVAEConfig.tiny())
    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        lat = rng.normal(size=(1, 6, 8)).astype(np.float32)
        p = str(tmp_path / f"lat{i}.npy")
        np.save(p, lat)
        rows.append({"id": f"utt{i}", "caption": f"a test sound {i}", "vae": p})
    meta = str(tmp_path / "meta.jsonl")
    with open(meta, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    return tok, cfg, params, codec, meta, tmp_path


def test_infer_jsonl_end_to_end(setup):
    tok, cfg, params, codec, meta, tmp_path = setup
    it = InferTools(cfg, params, tok, codec,
                    output_root=str(tmp_path / "out"), timestamp=False)
    files = it.infer_jsonl(meta, max_frames=8)
    assert len(files) == 4  # 2 x (copysyn + gen)
    for p in files:
        assert os.path.exists(p)
        audio, sr = read_wav(p)
        assert sr == codec.sample_rate
        assert audio.shape[-1] > 0
        assert np.isfinite(audio).all()
    # captions written
    assert open(os.path.join(it.output_dir, "utt0.txt")).read() == "a test sound 0"
    # gen length: (max_frames-1) valid frames * hop samples
    gen, _ = read_wav(os.path.join(it.output_dir, "utt0---gen.wav"))
    assert gen.shape[-1] == 7 * codec.cfg.hop


def test_synthesize_batch_bucketed_compiles(setup):
    """Mixed prompt lengths pack into left-padded buckets: one generate
    compile per (bucket, batch) pair, outputs aligned with input order and
    trimmed per-row (ref tools/batch_infer.py:72-77)."""
    tok, cfg, params, codec, meta, tmp_path = setup
    from kalle_tpu.infer import generate as gen_mod

    it = InferTools(cfg, params, tok, codec,
                    output_root=str(tmp_path / "out2"), timestamp=False)
    texts = ["hi", "a slightly longer caption here", "x", "medium one ok",
             "tiny", "another short", "yet another short text"]
    # expected compiles = distinct (bucket, batch) pairs after packing
    from kalle_tpu.data.tokens import build_prompt_ids

    lens = [len(build_prompt_ids(tok, t)) for t in texts]
    order = sorted(range(len(texts)), key=lambda i: lens[i])
    groups = [order[i:i + 4] for i in range(0, len(order), 4)]
    expect = len({next(bk for bk in (16, 32)
                       if bk >= max(lens[i] for i in g)) for g in groups})
    before = gen_mod.generate._cache_size()
    outs = it.synthesize_batch(texts, max_frames=8, batch_size=4,
                               prompt_buckets=(16, 32))
    after = gen_mod.generate._cache_size()
    assert after - before == expect, (before, after, expect)
    assert len(outs) == len(texts)
    spf = codec.samples_per_frame
    for a in outs:
        assert a.ndim == 2 and a.shape[-1] == 7 * spf  # sigma: no early stop
        assert np.isfinite(a).all()

    # determinism of packing: same call again adds no compiles
    it.synthesize_batch(texts[:3], max_frames=8, batch_size=4,
                        prompt_buckets=(16, 32))
    assert gen_mod.generate._cache_size() == after


def test_min_frames_gates_early_stop():
    """cfg.min_frames drives the stop gate (was hardcoded i > 3)."""
    import dataclasses

    import jax.numpy as jnp

    from kalle_tpu.infer.generate import generate

    base = LlasaConfig(llama=LlamaConfig.tiny(vocab_size=300), latent_dim=8,
                       audio_proj_dim=64, head_variant="stableaudio")
    params = llasa.init_params(base, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 300, (1, 8)),
                      jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    for mf in (2, 6):
        cfg = dataclasses.replace(base, min_frames=mf)
        res = generate(params, cfg, ids, mask, jax.random.key(1),
                       max_frames=16, end_kl_threshold=1e9)
        # threshold huge -> stops at the first gated step i == min_frames;
        # steps = min_frames + 1, n_frames discards the last frame
        assert int(res.n_frames[0]) == mf, (mf, int(res.n_frames[0]))


def test_wav_roundtrip(tmp_path):
    x = np.random.default_rng(0).normal(size=(2, 500)).astype(np.float32) * 0.5
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000 and y.shape == x.shape
    xn = x / np.abs(x).max()
    np.testing.assert_allclose(y, xn, atol=2e-4)
