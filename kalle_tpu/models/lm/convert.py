"""Torch-checkpoint -> JAX param-tree converters.

Covers:
  * HF Llama (`LlamaModel`/`LlamaForCausalLM`) state_dicts — the frozen
    backbone the reference loads via AutoModelForCausalLM.from_pretrained
    (ref: model_sigmaVAE.py:17-29).
  * Llasa full checkpoints (`epoch_E_step_S.pt` state_dicts saved at
    ref train_offline.py:261-263), including audio_linear and
    distribution_linear head weights.

Numpy is the interchange format; torch is only imported lazily so the
TPU runtime has no torch dependency.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ...core.config import LlamaConfig, LlasaConfig


def _to_np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t)


def llama_params_from_state_dict(sd: Dict, cfg: LlamaConfig, prefix: str = "model.") -> dict:
    """Convert an HF Llama state_dict to the stacked-scan layout.
    torch nn.Linear stores (out, in); we keep (in, out) for x @ W."""
    g = lambda name: _to_np(sd[prefix + name])

    def stack(name_fmt, transpose=True):
        mats = []
        for i in range(cfg.num_layers):
            w = g(name_fmt.format(i))
            mats.append(w.T if transpose else w)
        return np.stack(mats).astype(np.float32)

    params = {
        "embed": g("embed_tokens.weight").astype(np.float32),
        "layers": {
            "attn_norm": stack("layers.{}.input_layernorm.weight", transpose=False),
            "wq": stack("layers.{}.self_attn.q_proj.weight"),
            "wk": stack("layers.{}.self_attn.k_proj.weight"),
            "wv": stack("layers.{}.self_attn.v_proj.weight"),
            "wo": stack("layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": stack("layers.{}.post_attention_layernorm.weight", transpose=False),
            "wg": stack("layers.{}.mlp.gate_proj.weight"),
            "wu": stack("layers.{}.mlp.up_proj.weight"),
            "wd": stack("layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": g("norm.weight").astype(np.float32),
    }
    vocab = params["embed"].shape[0]
    if vocab < cfg.vocab_size:
        # resize_token_embeddings equivalent (ref: model_sigmaVAE.py:28):
        # new rows init from the mean embedding (HF default is mean+noise;
        # mean is deterministic and sufficient for a frozen backbone).
        extra = np.broadcast_to(
            params["embed"].mean(axis=0, keepdims=True),
            (cfg.vocab_size - vocab, params["embed"].shape[1]),
        )
        params["embed"] = np.concatenate([params["embed"], extra], axis=0)
    return params


def llasa_params_from_state_dict(sd: Dict, cfg: LlasaConfig) -> dict:
    """Convert a full Llasa `.pt` state_dict (base_model.* + audio_linear.*
    + distribution_linear.*) into this framework's Llasa param tree."""
    llama = llama_params_from_state_dict(sd, cfg.llama, prefix="base_model.model.")
    head = {
        "audio_linear": {
            "w": _to_np(sd["audio_linear.weight"]).T,
            "b": _to_np(sd["audio_linear.bias"]),
        },
        "distribution_linear": {
            "w0": _to_np(sd["distribution_linear.0.weight"]).T,
            "b0": _to_np(sd["distribution_linear.0.bias"]),
            "w2": _to_np(sd["distribution_linear.2.weight"]).T,
            "b2": _to_np(sd["distribution_linear.2.bias"]),
        },
    }
    return {"llama": llama, **head}


def llasa_state_dict_from_params(params: dict, cfg: LlasaConfig) -> Dict:
    """Export this framework's Llasa params to a reference-layout torch
    state_dict (`base_model.model.*` + heads) so reference tooling can
    consume TPU-trained checkpoints."""
    import torch

    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    sd: Dict = {}
    ll = params["llama"]
    sd["base_model.model.embed_tokens.weight"] = t(ll["embed"])
    sd["base_model.model.norm.weight"] = t(ll["final_norm"])
    L = cfg.llama.num_layers
    names = {
        "attn_norm": ("input_layernorm.weight", False),
        "wq": ("self_attn.q_proj.weight", True),
        "wk": ("self_attn.k_proj.weight", True),
        "wv": ("self_attn.v_proj.weight", True),
        "wo": ("self_attn.o_proj.weight", True),
        "mlp_norm": ("post_attention_layernorm.weight", False),
        "wg": ("mlp.gate_proj.weight", True),
        "wu": ("mlp.up_proj.weight", True),
        "wd": ("mlp.down_proj.weight", True),
    }
    for key, (suffix, transpose) in names.items():
        stacked = np.asarray(ll["layers"][key], np.float32)
        for i in range(L):
            w = stacked[i].T if transpose else stacked[i]
            sd[f"base_model.model.layers.{i}.{suffix}"] = t(w)
    sd["audio_linear.weight"] = t(np.asarray(params["audio_linear"]["w"]).T)
    sd["audio_linear.bias"] = t(params["audio_linear"]["b"])
    dl = params["distribution_linear"]
    if "w0" in dl:
        sd["distribution_linear.0.weight"] = t(np.asarray(dl["w0"]).T)
        sd["distribution_linear.0.bias"] = t(dl["b0"])
        sd["distribution_linear.2.weight"] = t(np.asarray(dl["w2"]).T)
        sd["distribution_linear.2.bias"] = t(dl["b2"])
    else:
        sd["distribution_linear.weight"] = t(np.asarray(dl["w"]).T)
        sd["distribution_linear.bias"] = t(dl["b"])
    return sd


def load_torch_checkpoint(path: str) -> Dict:
    """Load a .pt / .safetensors checkpoint into a numpy-backed dict
    (ref loader: stable_audio_tools/models/utils.py:6-12)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "generator" in sd and all(
        hasattr(v, "shape") for v in sd["generator"].values()
    ):
        sd = sd["generator"]
    return sd
