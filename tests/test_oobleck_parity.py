"""Golden parity: JAX Oobleck VAE vs the vendored torch implementation
(/root/reference/stable_audio_tools, used as a read-only test oracle).

The vendored module needs CUDA-era deps (alias_free_torch, dac) and pulls
heavy diffusion imports; we stub those since the Oobleck path never touches
them (antialias_activation=False in all kalle configs)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalle_tpu.models.codecs.oobleck import (
    OobleckConfig,
    decode,
    encode,
    params_from_state_dict,
)

torch = pytest.importorskip("torch")


def _install_stubs():
    from torch import nn
    from torch.nn.utils import weight_norm

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.transforms = types.ModuleType("torchaudio.transforms")
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = ta.transforms

    if "alias_free_torch" not in sys.modules:
        m = types.ModuleType("alias_free_torch")

        class Activation1d(nn.Module):
            def __init__(self, activation):
                super().__init__()
                self.act = activation

            def forward(self, x):
                return self.act(x)

        m.Activation1d = Activation1d
        sys.modules["alias_free_torch"] = m

    if "dac" not in sys.modules:
        dac = types.ModuleType("dac")
        dac_nn = types.ModuleType("dac.nn")
        layers = types.ModuleType("dac.nn.layers")

        def WNConv1d(*args, **kwargs):
            return weight_norm(nn.Conv1d(*args, **kwargs))

        def WNConvTranspose1d(*args, **kwargs):
            return weight_norm(nn.ConvTranspose1d(*args, **kwargs))

        layers.WNConv1d = WNConv1d
        layers.WNConvTranspose1d = WNConvTranspose1d
        layers.Snake1d = nn.Identity  # imported by blocks.py, unused here
        quantize = types.ModuleType("dac.nn.quantize")
        quantize.ResidualVectorQuantize = object
        dac_nn.quantize = quantize
        sys.modules["dac.nn.quantize"] = quantize
        dac.nn = dac_nn
        dac_nn.layers = layers
        sys.modules["dac"] = dac
        sys.modules["dac.nn"] = dac_nn
        sys.modules["dac.nn.layers"] = layers

    # heavy sibling modules the Oobleck path never calls
    for name, attrs in [
        ("vector_quantize_pytorch", ["ResidualVQ", "FSQ"]),
        ("einops_exts", ["rearrange_many"]),
        ("stable_audio_tools.models.diffusion",
         ["ConditionedDiffusionModel", "DAU1DCondWrapper",
          "UNet1DCondWrapper", "DiTWrapper"]),
        ("stable_audio_tools.inference.sampling", ["sample"]),
        ("stable_audio_tools.inference.utils", ["prepare_audio"]),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, object)
            sys.modules[name] = m
    if "stable_audio_tools.inference" not in sys.modules:
        sys.modules["stable_audio_tools.inference"] = types.ModuleType(
            "stable_audio_tools.inference")


@pytest.fixture(scope="module")
def torch_oobleck():
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from stable_audio_tools.models.autoencoders import (
        OobleckDecoder,
        OobleckEncoder,
    )

    torch.manual_seed(0)
    cfg = OobleckConfig(
        io_channels=2, channels=8, latent_dim=4, encoder_out_dim=8,
        c_mults=(1, 2), strides=(2, 4), use_snake=True, final_tanh=True,
        scale=1.0)
    enc = OobleckEncoder(in_channels=2, channels=8, latent_dim=8,
                         c_mults=[1, 2], strides=[2, 4], use_snake=True).eval()
    dec = OobleckDecoder(out_channels=2, channels=8, latent_dim=4,
                         c_mults=[1, 2], strides=[2, 4], use_snake=True,
                         final_tanh=True).eval()
    # randomize snake params away from init zeros to harden the test
    with torch.no_grad():
        for m in list(enc.modules()) + list(dec.modules()):
            if hasattr(m, "alpha") and hasattr(m, "beta"):
                m.alpha.normal_(0, 0.3)
                m.beta.normal_(0, 0.3)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd = {k: v.numpy() for k, v in sd.items()}
    params = jax.tree.map(jnp.asarray, params_from_state_dict(sd, cfg))
    return cfg, enc, dec, params


def test_encoder_parity(torch_oobleck):
    cfg, enc, dec, params = torch_oobleck
    x = np.random.default_rng(0).normal(size=(2, 2, 64)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.tensor(x)).numpy()
    ours = np.asarray(encode(params, cfg, jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_decoder_parity(torch_oobleck):
    cfg, enc, dec, params = torch_oobleck
    z = np.random.default_rng(1).normal(size=(2, 4, 8)).astype(np.float32)
    with torch.no_grad():
        ref = dec(torch.tensor(z)).numpy()
    ours = np.asarray(decode(params, cfg, jnp.asarray(z)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_roundtrip_shapes(torch_oobleck):
    cfg, enc, dec, params = torch_oobleck
    ratio = cfg.downsampling_ratio
    x = np.random.default_rng(2).normal(size=(1, 2, 4 * ratio)).astype(np.float32)
    z = np.asarray(encode(params, cfg, jnp.asarray(x)))
    assert z.shape == (1, cfg.encoder_out_dim, 4)
    mean = z[:, : cfg.latent_dim]
    y = np.asarray(decode(params, cfg, jnp.asarray(mean)))
    assert y.shape == (1, 2, 4 * ratio)
    assert np.abs(y).max() <= 1.0  # final tanh
