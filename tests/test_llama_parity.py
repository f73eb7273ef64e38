"""Golden-parity: kalle_tpu Llama backbone vs HF torch LlamaModel.

The reference wraps HF's Llama-3.2 (ref: model_sigmaVAE.py:17-29); the
rebuild must produce the same hidden states given the same weights. We
instantiate a tiny random torch LlamaModel, convert its state_dict, and
compare full-sequence forward outputs (fp32, CPU).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from kalle_tpu.core.config import LlamaConfig, RopeScaling
from kalle_tpu.models.lm import llama as jllama
from kalle_tpu.models.lm.convert import llama_params_from_state_dict

torch = pytest.importorskip("torch")


def _tiny_hf_pair(rope_scaling=True, seed=0):
    from transformers.models.llama.configuration_llama import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import LlamaModel

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        vocab_size=300,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=True,
    )
    if rope_scaling:
        hf_cfg.rope_scaling = {
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        }
    model = LlamaModel(hf_cfg).eval().to(torch.float32)

    cfg = LlamaConfig(
        vocab_size=300,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_theta=500000.0,
        rope_scaling=RopeScaling(32.0, 1.0, 4.0, 64) if rope_scaling else None,
        max_seq_len=256,
        dtype="float32",
    )
    sd = {"model." + k: v for k, v in model.state_dict().items()}
    params = llama_params_from_state_dict(sd, cfg)
    return model, cfg, params


@pytest.mark.parametrize("rope_scaling", [True, False])
def test_forward_matches_hf(rope_scaling):
    model, cfg, params = _tiny_hf_pair(rope_scaling)
    rng = np.random.default_rng(0)
    b, t = 2, 17
    ids = rng.integers(0, 300, (b, t))
    # right padding: second row has 5 pad positions
    mask = np.ones((b, t), np.int64)
    mask[1, 12:] = 0

    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    embeds = jllama.embed_tokens(params, jnp.asarray(ids), cfg)
    ours = np.asarray(jllama.forward(params, cfg, embeds, jnp.asarray(mask)))

    # only compare non-pad positions (HF computes garbage on pads too but
    # masked keys make valid positions identical)
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_out[valid], rtol=2e-4, atol=2e-4)


def test_cache_matches_full_forward():
    """Prefill+decode through the KV cache == full-sequence forward."""
    _, cfg, params = _tiny_hf_pair(True)
    rng = np.random.default_rng(1)
    b, t = 2, 12
    ids = rng.integers(0, 300, (b, t))
    mask = np.ones((b, t), np.int64)

    embeds = jllama.embed_tokens(params, jnp.asarray(ids), cfg)
    full = np.asarray(jllama.forward(params, cfg, embeds, jnp.asarray(mask)))

    max_len = 32
    cache = jllama.KVCache.zeros(cfg, b, max_len, dtype=jnp.float32)
    # prefill 8, then decode 4 single steps
    out_p, cache = jllama.forward_with_cache(params, cfg, embeds[:, :8], cache)
    outs = [np.asarray(out_p)]
    for i in range(8, t):
        o, cache = jllama.forward_with_cache(params, cfg, embeds[:, i:i + 1], cache)
        outs.append(np.asarray(o))
    stitched = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stitched, full, rtol=2e-4, atol=2e-4)
