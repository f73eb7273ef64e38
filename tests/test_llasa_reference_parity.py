"""Golden parity: kalle_tpu Llasa forward vs the reference model.py Llasa
(stableaudio variant — deterministic forward, exact oracle).

We save a tiny random HF Llama locally (AutoModelForCausalLM loads offline
from a dir), stub the broken-symlink twj_utils with the documented split
semantics, instantiate the reference model, convert its weights, and compare
losses + head outputs on an identical batch."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig, LlasaConfig, RopeScaling
from kalle_tpu.models.lm import llasa
from kalle_tpu.models.lm.convert import llasa_params_from_state_dict

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_llasa(tmp_path_factory):
    from transformers.models.llama.configuration_llama import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("hf_llama")
    torch.manual_seed(0)
    vocab = 300
    hf_cfg = HFConfig(
        vocab_size=vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=500000.0,
        rms_norm_eps=1e-5, attention_bias=False, mlp_bias=False,
        tie_word_embeddings=True)
    LlamaForCausalLM(hf_cfg).save_pretrained(tmp)

    # twj_utils stub: mean||stdev split on the channel dim (SURVEY.md §0 —
    # scale used directly as stdev, matching vae_sample's quirk)
    if "twj_utils" not in sys.modules:
        m = types.ModuleType("twj_utils")

        def get_mean_stdev_from_stableaudio2_latents(x):  # (B, 2d, T)
            mean, stdev = x.chunk(2, dim=1)
            return mean, stdev

        m.get_mean_stdev_from_stableaudio2_latents = \
            get_mean_stdev_from_stableaudio2_latents
        sys.modules["twj_utils"] = m
    for p in ("/root/reference", "/root/reference/backup"):
        if p not in sys.path:
            sys.path.insert(0, p)

    import importlib
    import model as ref_model_mod  # /root/reference/model.py
    importlib.reload(ref_model_mod)

    class TokStub:
        def __len__(self):
            return vocab

    ref = ref_model_mod.Llasa(
        {"llm_model_name_or_path": str(tmp), "latent_dim": 8,
         "audio_proj_dim": 64},
        TokStub(), use_flash_attention=False).eval()

    cfg = LlasaConfig(
        llama=LlamaConfig(
            vocab_size=vocab, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            rope_theta=500000.0, rope_scaling=None, max_seq_len=256,
            dtype="float32"),
        latent_dim=8, audio_proj_dim=64, head_variant="stableaudio")
    sd = {k: v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, llasa_params_from_state_dict(sd, cfg))
    return ref, cfg, params


def test_forward_loss_parity(ref_llasa):
    ref, cfg, params = ref_llasa
    rng = np.random.default_rng(0)
    b, t_text, t_audio, d = 2, 5, 7, 8
    T = t_text + t_audio
    ids = rng.integers(0, 300, (b, T))
    latents = rng.normal(size=(b, T, d)).astype(np.float32)
    # labels: mean||scale with positive scales (stdev used directly)
    labels = np.concatenate([
        rng.normal(size=(b, T, d)).astype(np.float32),
        (0.3 + np.abs(rng.normal(size=(b, T, d)))).astype(np.float32)], -1)
    ids_mask = np.zeros((b, T)); ids_mask[:, :t_text] = 1
    audio_mask = np.zeros((b, T)); audio_mask[:, t_text:] = 1
    target_mask = np.zeros((b, T)); target_mask[:, t_text - 1:T - 1] = 1
    end_mask = np.zeros((b, T)); end_mask[:, T - 1] = 1

    with torch.no_grad():
        out_ref = ref(
            input_ids=torch.tensor(ids),
            audio_latents=torch.tensor(latents),
            audio_distribution_l=torch.tensor(labels),
            ids_mask=torch.tensor(ids_mask).float(),
            audio_mask=torch.tensor(audio_mask).float(),
            target_mask=torch.tensor(target_mask).float(),
            end_mask=torch.tensor(end_mask).float(),
        )

    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "audio_latents": jnp.asarray(latents),
        "distribute_labels": jnp.asarray(labels),
        "ids_mask": jnp.asarray(ids_mask, jnp.float32),
        "audio_mask": jnp.asarray(audio_mask, jnp.float32),
        "target_mask": jnp.asarray(target_mask, jnp.float32),
        "end_mask": jnp.asarray(end_mask, jnp.float32),
    }
    out = llasa.forward(params, cfg, batch)

    np.testing.assert_allclose(float(out["audio_loss"]),
                               float(out_ref["audio_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(out["end_loss"]),
                               float(out_ref["end_loss"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pre_mean"]),
                               out_ref["pre_mean"].numpy(),
                               rtol=1e-3, atol=1e-5)
