"""Golden parity: JAX MRTE vs the reference torch implementation."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalle_tpu.models.conditioning.mrte import (
    MRTEConfig,
    forward,
    init_params,
    params_from_state_dict,
)

torch = pytest.importorskip("torch")


def test_matches_reference():
    if "/root/reference/backup" not in sys.path:
        sys.path.insert(0, "/root/reference/backup")
    from mrte import MRTE

    torch.manual_seed(0)
    cfg = MRTEConfig(mel_bins=8, hidden_size=16, mel_stride=4,
                     n_layers=2, n_stacks=2, n_blocks=1, n_heads=1)
    model = MRTE(mel_bins=8, mel_stride=4, mel_n_layer=2, mel_n_stack=2,
                 mel_n_block=1, hidden_size=16, content_n_heads=1,
                 dropout=0.0).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, params_from_state_dict(sd, cfg))

    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 8, 32)).astype(np.float32)
    phone = rng.normal(size=(2, 7, 16)).astype(np.float32)
    with torch.no_grad():
        ref_cond, ref_tc = model(torch.tensor(mel), torch.tensor(phone))
    cond, tc = forward(params, cfg, jnp.asarray(mel), jnp.asarray(phone))
    assert cond.shape == tuple(ref_cond.shape)
    assert tc.shape == tuple(ref_tc.shape)
    np.testing.assert_allclose(np.asarray(tc), ref_tc.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cond), ref_cond.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_random_init_runs():
    cfg = MRTEConfig.tiny()
    params = init_params(cfg, jax.random.key(0))
    cond, tc = forward(params, cfg, jnp.zeros((1, cfg.mel_bins, 20)),
                       jnp.zeros((1, 5, cfg.hidden_size)))
    assert cond.shape == (1, 2048)
    assert tc.shape == (1, 5, cfg.hidden_size)
