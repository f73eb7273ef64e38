"""Golden parity: JAX ECAPA-TDNN vs the reference torch implementation."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalle_tpu.models.conditioning.ecapa import (
    EcapaConfig,
    forward,
    init_params,
    params_from_state_dict,
)

torch = pytest.importorskip("torch")


def test_matches_reference():
    if "/root/reference/backup" not in sys.path:
        sys.path.insert(0, "/root/reference/backup")
    from ecapa_tdnn import ECAPA_TDNN

    torch.manual_seed(0)
    cfg = EcapaConfig(in_channels=8, channels=32, embd_dim=12, scale=8,
                      attn_bottleneck=16, pooled_channels=1536)
    # reference hardcodes 1536 pooled channels (ecapa_tdnn.py:162)
    model = ECAPA_TDNN(in_channels=8, channels=32, embd_dim=12).eval()
    # randomize BN running stats so folding is actually tested
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, params_from_state_dict(sd, cfg))

    x = np.random.default_rng(0).normal(size=(2, 50, 8)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x)).numpy()
    ours = np.asarray(forward(params, cfg, jnp.asarray(x)))
    assert ours.shape == ref.shape == (2, 12)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_random_init_runs():
    cfg = EcapaConfig.tiny()
    params = init_params(cfg, jax.random.key(0))
    emb = forward(params, cfg, jnp.zeros((1, 30, cfg.in_channels)))
    assert emb.shape == (1, cfg.embd_dim)
    assert np.isfinite(np.asarray(emb)).all()
