"""Every example YAML in configs/ loads through the reference-schema
loader and lands on the intended operating point (SURVEY §1 row 1 — the
reference ships 8 experiment YAMLs; ours cover each distinct operating
point: sigma overfit/full, online stableaudio, offline vggsound,
mel-VAE SFT, mel-VAE 12.5 Hz dim-2048 TTS-SFT)."""
import glob
import os

import pytest

from kalle_tpu.core.config import load_experiment_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_YAMLS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


def test_config_dir_nonempty():
    assert len(ALL_YAMLS) >= 6


@pytest.mark.parametrize("path", ALL_YAMLS, ids=[os.path.basename(p)
                                                 for p in ALL_YAMLS])
def test_config_loads(path):
    exp = load_experiment_config(path)
    assert exp.model.head_variant in ("sigma", "stableaudio", "melvae")
    assert exp.model.latent_dim > 0
    assert exp.train.lr > 0


def test_melvae_dim2048_tts_sft_operating_point():
    exp = load_experiment_config(
        os.path.join(CONFIG_DIR, "melvae_dim2048_tts_sft.yaml"))
    # ref configs/vae_12_5hz_dim2048_tts-sft.yaml:14,18-21,43-47,58-62
    assert exp.model.head_variant == "melvae"
    assert exp.model.latent_dim == 1024          # 2048 = mean||scale stack
    assert exp.train.speaker_cond_kl_weight == pytest.approx(0.1)
    assert exp.train.end_loss_weight == pytest.approx(0.2)
    assert exp.data.spk_drop_prob == pytest.approx(0.1)
    assert exp.data.delay_frames == 1
    assert exp.data.batch_size == 50
    assert exp.data.max_token_length == 20000


def test_vggsound_operating_point():
    exp = load_experiment_config(
        os.path.join(CONFIG_DIR, "stableaudio_vggsound.yaml"))
    # ref configs/twj_0828.yaml:10-17,28-31,40-46
    assert exp.model.head_variant == "stableaudio"
    assert exp.model.latent_dim == 64
    assert exp.data.latent_kind == "stableaudio"
    assert exp.train.gradient_accumulation_steps == 2
    assert exp.train.end_loss_weight == pytest.approx(0.002)
    assert exp.train.log_interval == 1
    assert not exp.use_flash_attention
    assert not exp.model.llama.use_flash_attention


REF_CONFIG_DIR = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason="reference snapshot not present")
def test_all_reference_yamls_load_verbatim():
    """The loader accepts every one of the reference's own experiment YAMLs
    unmodified (the reference schema is the contract, incl. the
    use_flash_attation typo); spot-check operating points. head_variant is
    NOT encoded in the reference YAMLs (their train scripts hardcode the
    model class), so verbatim loads keep the sigma default."""
    import glob

    paths = sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "*.yaml")))
    assert len(paths) == 8, paths
    by_name = {}
    for p in paths:
        cfg = load_experiment_config(p)
        assert cfg.model.llama.hidden_size > 0
        by_name[os.path.basename(p)] = cfg

    assert by_name["twj_sigmaVAE.yaml"].model.latent_dim == 64
    assert by_name["twj_sigmaVAE.yaml"].model.audio_proj_dim == 2048
    assert by_name["vae_12_5hz_dim2048_tts-sft.yaml"].model.latent_dim == 1024
    assert by_name["vae_12_5_dim1024-sft.yaml"].model.latent_dim == 512
    assert (by_name["vae_12_5_dim512-ecapatdnn-globalvae_v1.yaml"]
            .model.latent_dim == 256)
