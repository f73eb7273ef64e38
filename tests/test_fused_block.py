"""Fused ConvNeXt-block Pallas kernel vs the XLA reference path."""
import numpy as np
import jax
import jax.numpy as jnp

from kalle_tpu.models.codecs import sigmavae
from kalle_tpu.ops.pallas.convnext_block import fused_convnext_block


def test_fused_block_parity_interpret():
    cfg = sigmavae.SigmaVAEConfig(latent_dim=8, strides=(2, 4),
                                  channels=(16, 32), blocks_per_stage=1)
    params = sigmavae.init_params(cfg, jax.random.key(0))
    blk = params["decoder"]["stages"][0]["blocks"][0]
    C = blk["norm"].shape[0]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, C)),
                    jnp.float32)
    ref = sigmavae._block(x, blk, cfg)
    out = fused_convnext_block(
        x, blk["norm"], blk["dw"]["w"], blk["dw"]["b"],
        blk["up"]["w"], blk["up"]["b"], blk["down"]["w"], blk["down"]["b"],
        block_t=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_block_causal_carry():
    """Block boundaries must not change results (halo carry correctness)."""
    cfg = sigmavae.SigmaVAEConfig(latent_dim=8, strides=(2, 4),
                                  channels=(16, 32), blocks_per_stage=1)
    params = sigmavae.init_params(cfg, jax.random.key(1))
    blk = params["decoder"]["stages"][0]["blocks"][0]
    C = blk["norm"].shape[0]
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, C)),
                    jnp.float32)
    a = fused_convnext_block(
        x, blk["norm"], blk["dw"]["w"], blk["dw"]["b"],
        blk["up"]["w"], blk["up"]["b"], blk["down"]["w"], blk["down"]["b"],
        block_t=64, interpret=True)
    b = fused_convnext_block(
        x, blk["norm"], blk["dw"]["w"], blk["dw"]["b"],
        blk["up"]["w"], blk["up"]["b"], blk["down"]["w"], blk["down"]["b"],
        block_t=16, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
