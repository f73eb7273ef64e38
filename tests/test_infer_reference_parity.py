"""Golden AR-loop parity: generate() vs the reference model.py Llasa.infer.

Noise is removed on both sides (torch.randn_like monkeypatched to zeros;
generate(greedy=True)), making the full autoregressive loop — head split,
latent feedback, end-KL stop, discard-last — exactly comparable.
Also exact sigma-variant loss parity via injected latent noise."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalle_tpu.infer.generate import generate
from kalle_tpu.models.lm import llasa

torch = pytest.importorskip("torch")

# reuse the reference fixture machinery
sys.path.insert(0, "/root/repo/tests")
from test_llasa_reference_parity import ref_llasa  # noqa: F401


def test_ar_loop_parity(ref_llasa):  # noqa: F811
    ref, cfg, params = ref_llasa
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 300, (7,))

    real_randn = torch.randn_like
    torch.randn_like = lambda x, **kw: torch.zeros_like(x)
    try:
        with torch.no_grad():
            # threshold -1: never stops early -> runs max_length steps
            ref_out = ref.infer(torch.tensor(ids), None,
                                end_disp_kl_thres=-1.0, max_length=6)
    finally:
        torch.randn_like = real_randn
    # reference returns stacked last_disp[:-1].transpose -> (1, 2d, n)
    ref_out = ref_out.numpy()

    res = generate(params, cfg, jnp.asarray(ids[None, :]),
                   jnp.ones((1, 7), jnp.int32), jax.random.key(0),
                   max_frames=6, end_kl_threshold=-1.0, greedy=True)
    n = int(res.n_frames[0])
    assert n == 5  # 6 steps, last discarded
    ours = np.concatenate(
        [np.asarray(res.means)[0, :n], np.asarray(res.log_scales)[0, :n]],
        axis=-1).T  # (2d, n) to match the reference layout
    assert ours.shape == ref_out[0].shape
    np.testing.assert_allclose(ours, ref_out[0], rtol=1e-3, atol=1e-4)


def test_sigma_loss_exact_parity(tmp_path):
    """model_sigmaVAE forward vs ours with IDENTICAL injected noise."""
    import types

    from transformers.models.llama.configuration_llama import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    from kalle_tpu.core.config import LlamaConfig, LlasaConfig
    from kalle_tpu.models.lm.convert import llasa_params_from_state_dict

    torch.manual_seed(1)
    vocab = 300
    hf_cfg = HFConfig(vocab_size=vocab, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      max_position_embeddings=256, rope_theta=500000.0,
                      rms_norm_eps=1e-5, attention_bias=False, mlp_bias=False,
                      tie_word_embeddings=True)
    LlamaForCausalLM(hf_cfg).save_pretrained(tmp_path)

    for p in ("/root/reference",):
        if p not in sys.path:
            sys.path.insert(0, p)
    import model_sigmaVAE as ref_mod

    class TokStub:
        def __len__(self):
            return vocab

    ref = ref_mod.Llasa({"llm_model_name_or_path": str(tmp_path),
                         "latent_dim": 8, "audio_proj_dim": 64},
                        TokStub(), use_flash_attention=False).eval()
    # NOTE: reference sigma head is latent->GELU->latent MLP (d out)
    cfg = LlasaConfig(
        llama=LlamaConfig(vocab_size=vocab, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=16, rope_theta=500000.0,
                          rope_scaling=None, max_seq_len=256, dtype="float32"),
        latent_dim=8, audio_proj_dim=64, head_variant="sigma")
    params = jax.tree.map(
        jnp.asarray, llasa_params_from_state_dict(ref.state_dict(), cfg))

    rng = np.random.default_rng(6)
    b, T, d = 2, 10, 8
    ids = rng.integers(0, vocab, (b, T))
    latents = rng.normal(size=(b, T, d)).astype(np.float32)
    labels = rng.normal(size=(b, T, d)).astype(np.float32)
    noise = rng.normal(size=(b, T, d)).astype(np.float32)
    ids_mask = np.zeros((b, T)); ids_mask[:, :4] = 1
    audio_mask = np.zeros((b, T)); audio_mask[:, 4:] = 1
    target_mask = np.zeros((b, T)); target_mask[:, 3:T - 1] = 1
    end_mask = np.zeros((b, T)); end_mask[:, T - 1] = 1

    real_randn = torch.randn_like
    torch.randn_like = lambda x, **kw: torch.tensor(noise)
    try:
        with torch.no_grad():
            out_ref = ref(input_ids=torch.tensor(ids),
                          audio_latents=torch.tensor(latents),
                          audio_distribution_l=torch.tensor(labels),
                          ids_mask=torch.tensor(ids_mask).float(),
                          audio_mask=torch.tensor(audio_mask).float(),
                          target_mask=torch.tensor(target_mask).float(),
                          end_mask=torch.tensor(end_mask).float())
    finally:
        torch.randn_like = real_randn

    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "audio_latents": jnp.asarray(latents),
             "distribute_labels": jnp.asarray(labels),
             "ids_mask": jnp.asarray(ids_mask, jnp.float32),
             "audio_mask": jnp.asarray(audio_mask, jnp.float32),
             "target_mask": jnp.asarray(target_mask, jnp.float32),
             "end_mask": jnp.asarray(end_mask, jnp.float32)}
    out = llasa.forward(params, cfg, batch, latent_noise=jnp.asarray(noise))

    np.testing.assert_allclose(float(out["audio_loss"]),
                               float(out_ref["audio_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(out["end_loss"]),
                               float(out_ref["end_loss"]), rtol=1e-4)
