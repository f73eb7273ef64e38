"""Golden parity: JAX BigVGANFlowVAE vs the reference backup/flows.py
(torch oracle, random weights).

flows.py needs `alias_free_torch`; we install a faithful stub implementing
the public NVIDIA BigVGAN kaiser-sinc Activation1d (the exact module the
reference depends on), so the oracle's numerics are the real ones."""
import math
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalle_tpu.models.codecs.melvae import (
    MelVAEConfig,
    extract_latents,
    flow,
    inference_from_latents,
    params_from_state_dict,
)

torch = pytest.importorskip("torch")


def _install_alias_free_stub():
    if "alias_free_torch" in sys.modules:
        return
    from torch import nn
    import torch.nn.functional as F

    def kaiser_sinc_filter1d(cutoff, half_width, kernel_size):
        even = kernel_size % 2 == 0
        half_size = kernel_size // 2
        delta_f = 4 * half_width
        A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
        if A > 50.0:
            beta = 0.1102 * (A - 8.7)
        elif A >= 21.0:
            beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21)
        else:
            beta = 0.0
        window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
        if even:
            time = torch.arange(-half_size, half_size) + 0.5
        else:
            time = torch.arange(kernel_size) - half_size
        if cutoff == 0:
            return torch.zeros(kernel_size)
        f = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
        f = f / f.sum()
        return f.view(1, 1, kernel_size)

    class UpSample1d(nn.Module):
        def __init__(self, ratio=2, kernel_size=None):
            super().__init__()
            self.ratio = ratio
            self.kernel_size = (int(6 * ratio // 2) * 2
                                if kernel_size is None else kernel_size)
            self.stride = ratio
            self.pad = self.kernel_size // ratio - 1
            self.pad_left = self.pad * self.stride + (self.kernel_size - self.stride) // 2
            self.pad_right = (self.pad * self.stride
                              + (self.kernel_size - self.stride + 1) // 2)
            self.register_buffer(
                "filter",
                kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size))

        def forward(self, x):
            C = x.shape[1]
            x = F.pad(x, (self.pad, self.pad), mode="replicate")
            x = self.ratio * F.conv_transpose1d(
                x, self.filter.expand(C, -1, -1), stride=self.stride, groups=C)
            return x[..., self.pad_left:-self.pad_right]

    class LowPassFilter1d(nn.Module):
        def __init__(self, cutoff=0.5, half_width=0.6, stride=1,
                     padding=True, padding_mode="replicate", kernel_size=12):
            super().__init__()
            self.kernel_size = kernel_size
            self.even = kernel_size % 2 == 0
            self.pad_left = kernel_size // 2 - int(self.even)
            self.pad_right = kernel_size // 2
            self.stride = stride
            self.padding = padding
            self.padding_mode = padding_mode
            self.register_buffer(
                "filter", kaiser_sinc_filter1d(cutoff, half_width, kernel_size))

        def forward(self, x):
            C = x.shape[1]
            if self.padding:
                x = F.pad(x, (self.pad_left, self.pad_right),
                          mode=self.padding_mode)
            return F.conv1d(x, self.filter.expand(C, -1, -1),
                            stride=self.stride, groups=C)

    class DownSample1d(nn.Module):
        def __init__(self, ratio=2, kernel_size=None):
            super().__init__()
            self.ratio = ratio
            ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
            self.lowpass = LowPassFilter1d(cutoff=0.5 / ratio,
                                           half_width=0.6 / ratio,
                                           stride=ratio, kernel_size=ks)

        def forward(self, x):
            return self.lowpass(x)

    class Activation1d(nn.Module):
        def __init__(self, activation, up_ratio=2, down_ratio=2,
                     up_kernel_size=12, down_kernel_size=12):
            super().__init__()
            self.act = activation
            self.upsample = UpSample1d(up_ratio, up_kernel_size)
            self.downsample = DownSample1d(down_ratio, down_kernel_size)

        def forward(self, x):
            return self.downsample(self.act(self.upsample(x)))

    m = types.ModuleType("alias_free_torch")
    m.Activation1d = Activation1d
    m.UpSample1d = UpSample1d
    m.DownSample1d = DownSample1d
    sys.modules["alias_free_torch"] = m


@pytest.fixture(scope="module")
def ref_model():
    _install_alias_free_stub()
    if "/root/reference/backup" not in sys.path:
        sys.path.insert(0, "/root/reference/backup")
    import flows as ref_flows

    cfg = MelVAEConfig.tiny()
    h = dict(
        latent_dim=cfg.latent_dim, use_vae=True,
        downsample_channels=list(cfg.downsample_channels),
        downsample_rates=list(cfg.downsample_rates),
        flow_hidden_channels=cfg.flow_hidden_channels,
        resblock=cfg.resblock,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        activation=cfg.activation, snake_logscale=cfg.snake_logscale,
        causal=cfg.causal,
    )

    class H(dict):
        __getattr__ = dict.__getitem__

        def get(self, k, d=None):
            return super().get(k, d)

    torch.manual_seed(0)
    # the reference Encoder defaults stacks=6; tiny cfg uses 2 — patch via
    # direct construction args
    model = ref_flows.BigVGANFlowVAE.__new__(ref_flows.BigVGANFlowVAE)
    torch.nn.Module.__init__(model)
    hh = H(h)
    model.h = hh
    model.audio_encoder = ref_flows.Encoder(
        out_channels=cfg.latent_dim, use_vae=True,
        base_channels=cfg.downsample_channels[0],
        channels=list(cfg.downsample_channels),
        down_sample_factors=list(cfg.downsample_rates),
        stacks=cfg.stacks)
    model.flow = ref_flows.ResidualCouplingBlock(
        cfg.latent_dim, cfg.flow_hidden_channels, cfg.flow_kernel_size, 1,
        cfg.flow_n_layers, n_flows=cfg.n_flows, gin_channels=0,
        causal=cfg.causal)
    model.num_kernels = len(cfg.resblock_kernel_sizes)
    model.num_upsamples = len(cfg.upsample_rates)
    model.conv_pre = torch.nn.utils.weight_norm(ref_flows.Conv1d(
        cfg.latent_dim, cfg.upsample_initial_channel, 7, 1, causal=False))
    model.ups = torch.nn.ModuleList()
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        model.ups.append(torch.nn.ModuleList([
            torch.nn.utils.weight_norm(ref_flows.ConvTranspose1d(
                cfg.upsample_initial_channel // (2 ** i),
                cfg.upsample_initial_channel // (2 ** (i + 1)),
                k, u, causal=cfg.causal))]))
    model.resblocks = torch.nn.ModuleList()
    for i in range(len(model.ups)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            model.resblocks.append(ref_flows.AMPBlock1(
                hh, ch, k, list(d), activation=cfg.activation,
                causal=cfg.causal))
    from alias_free_torch import Activation1d
    model.activation_post = Activation1d(
        activation=ref_flows.SnakeBeta(ch, alpha_logscale=cfg.snake_logscale))
    model.conv_post = torch.nn.utils.weight_norm(
        ref_flows.Conv1d(ch, 1, 7, 1, causal=cfg.causal))
    model.eval()

    # randomize snake params + zero-ish post convs already zeroed
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, (ref_flows.Snake, ref_flows.SnakeBeta)):
                mod.alpha.normal_(0, 0.3)
                if hasattr(mod, "beta"):
                    mod.beta.normal_(0, 0.3)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, params_from_state_dict(sd, cfg))
    return cfg, model, params


def test_extract_latents_parity(ref_model):
    cfg, model, params = ref_model
    wav = np.random.default_rng(0).normal(size=(2, 1, 8 * cfg.hop)).astype(np.float32)
    with torch.no_grad():
        ref = model.extract_latents(torch.tensor(wav)).numpy()
    ours = np.asarray(extract_latents(params, cfg, jnp.asarray(wav)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_flow_parity(ref_model):
    cfg, model, params = ref_model
    z = np.random.default_rng(1).normal(size=(2, cfg.latent_dim, 6)).astype(np.float32)
    mask = torch.ones(2, 1, 6)
    with torch.no_grad():
        ref_fwd = model.flow(torch.tensor(z), mask).numpy()
        ref_rev = model.flow(torch.tensor(z), mask, reverse=True).numpy()
    ours_fwd = np.asarray(flow(params, cfg, jnp.asarray(z), reverse=False))
    ours_rev = np.asarray(flow(params, cfg, jnp.asarray(z), reverse=True))
    np.testing.assert_allclose(ours_fwd, ref_fwd, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_rev, ref_rev, rtol=1e-4, atol=1e-5)
    # invertibility
    back = np.asarray(flow(params, cfg, jnp.asarray(ours_fwd), reverse=True))
    np.testing.assert_allclose(back, z, rtol=1e-4, atol=1e-5)


def test_decode_parity(ref_model):
    cfg, model, params = ref_model
    x = np.random.default_rng(2).normal(
        size=(1, 2 * cfg.latent_dim, 5)).astype(np.float32)
    with torch.no_grad():
        # do_sample=False branch requires latent-dim input; sample manually
        # with fixed z to avoid RNG mismatch: use mean only
        m = torch.tensor(x[:, :cfg.latent_dim])
        ref = model.inference_from_latents(m, do_sample=False).numpy()
    ours = np.asarray(inference_from_latents(
        params, cfg, jnp.asarray(x[:, :cfg.latent_dim]), jax.random.key(0),
        do_sample=False))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
