"""Blockwise attention kernel: equivalence with the dense reference across
block boundaries, padding, and asymmetric Lq/Lk."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.ops.kernels.attention import (
    blockwise_scaled_dot_attention,
    reference_attention,
)

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("B,Lq,Lk,C,bq,bk", [
    (2, 16, 16, 192, 128, 128),    # reference scale: single block
    (2, 256, 256, 64, 128, 128),   # multi-block both axes
    (1, 100, 100, 64, 32, 32),     # padding on both axes
    (2, 64, 192, 32, 32, 64),      # asymmetric Lq/Lk
])
def test_matches_dense_reference(B, Lq, Lk, C, bq, bk):
    x = jnp.asarray(RNG.randn(B, Lq, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, Lk, C).astype(np.float32))
    want = reference_attention(x, y)
    got = blockwise_scaled_dot_attention(x, y, block_q=bq, block_k=bk,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_online_softmax_stability():
    # large score magnitudes: the online max-subtraction must not overflow
    x = jnp.asarray(RNG.randn(1, 64, 32).astype(np.float32)) * 30
    y = jnp.asarray(RNG.randn(1, 64, 32).astype(np.float32)) * 30
    got = blockwise_scaled_dot_attention(x, y, block_q=32, block_k=32,
                                         interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    want = reference_attention(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
