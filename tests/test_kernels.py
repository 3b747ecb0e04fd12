"""Pallas kernel equivalence tests (interpret mode on CPU)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.ops.kernels.node_mixed import (
    NodeMixedParams,
    fuse_bn_into_dense,
    node_mixed_op_fused,
    node_mixed_op_reference,
)

RNG = np.random.RandomState(0)


def make_params(L, C):
    return NodeMixedParams(
        ln_scale=jnp.asarray(RNG.randn(L, C).astype(np.float32)),
        ln_bias=jnp.asarray(RNG.randn(L, C).astype(np.float32)),
        glu_kernel=jnp.asarray(RNG.randn(2 * C, 2 * C).astype(np.float32) * 0.1),
        glu_bias=jnp.asarray(RNG.randn(2 * C).astype(np.float32)),
        cfc_kernel=jnp.asarray(RNG.randn(2 * C, C).astype(np.float32) * 0.1),
        cfc_bias=jnp.asarray(RNG.randn(C).astype(np.float32)),
    )


@pytest.mark.parametrize("B,L,C", [(2, 8, 16), (3, 16, 192)])
def test_fused_matches_reference(B, L, C):
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    gammas = jax.nn.softmax(jnp.asarray([0.1, 0.4, 0.3, 0.2]))
    p = make_params(L, C)
    want = node_mixed_op_reference(x, y, gammas, p)
    got = node_mixed_op_fused(x, y, gammas, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_one_hot_gammas_select_branches():
    B, L, C = 2, 8, 16
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    p = make_params(L, C)
    # gamma = e0 -> exactly x + y
    got = node_mixed_op_fused(x, y, jnp.asarray([1.0, 0, 0, 0]), p,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x + y), rtol=1e-5)


def test_bn_folding():
    C = 8
    kernel = jnp.asarray(RNG.randn(2 * C, C).astype(np.float32))
    bias = jnp.asarray(RNG.randn(C).astype(np.float32))
    scale = jnp.asarray(RNG.rand(C).astype(np.float32) + 0.5)
    bn_bias = jnp.asarray(RNG.randn(C).astype(np.float32))
    mean = jnp.asarray(RNG.randn(C).astype(np.float32))
    var = jnp.asarray(RNG.rand(C).astype(np.float32) + 0.5)
    xk, xb = fuse_bn_into_dense(kernel, bias, scale, bn_bias, mean, var)
    x = jnp.asarray(RNG.randn(5, 2 * C).astype(np.float32))
    want = scale * ((x @ kernel + bias) - mean) / jnp.sqrt(var + 1e-5) + bn_bias
    got = x @ xk + xb
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=1e-5)
