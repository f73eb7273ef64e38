"""conv1d padding variants and the causal transposed conv."""
import numpy as np
import jax.numpy as jnp

from kalle_tpu.ops.conv import conv1d, conv_transpose1d


def test_conv1d_asymmetric_padding_matches_jnp_pad():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 20, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 4, 8)), jnp.float32)
    ref = conv1d(jnp.pad(x, ((0, 0), (6, 0), (0, 0))), w)
    got = conv1d(x, w, padding=(6, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_conv_transpose1d_causal_matches_slice():
    from kalle_tpu.ops.conv import conv_transpose1d_causal

    rng = np.random.default_rng(1)
    for s in (2, 4, 5, 8):
        x = jnp.asarray(rng.normal(size=(2, 9, 4)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(2 * s, 4, 6)), jnp.float32)
        ref = conv_transpose1d(x, w, stride=s, padding=0)[:, : 9 * s, :]
        got = conv_transpose1d_causal(x, w, stride=s)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
