"""Numerics tests for the fusion-op library.

Where the semantics come from torch layers (adaptive pooling, GLU, nearest
interpolation, LayerNorm over [C, L]), we verify directly against torch-CPU
as an oracle, accounting for the (B, C, L) <-> (B, L, C) layout transpose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bmnas_tpu.ops import (
    ConcatFC,
    LinearGLU,
    NodeMixedOp,
    ScaledDotAttn,
    SumOp,
    adaptive_max_pool_1d,
    adaptive_max_pool_2d,
    edge_weighted_sum,
)
from bmnas_tpu.ops.layers import (
    LayerNorm2D,
    Maxout,
    interpolate_nearest_1d,
)

RNG = np.random.RandomState(0)


def jx(a):
    return jnp.asarray(a)


class TestAdaptivePool:
    @pytest.mark.parametrize("in_hw,out_hw", [((7, 7), (4, 4)), ((1, 1), (4, 4)),
                                              ((9, 5), (4, 4)), ((3, 3), (4, 4))])
    def test_matches_torch_2d(self, in_hw, out_hw):
        x = RNG.randn(2, 5, *in_hw).astype(np.float32)  # torch NCHW
        want = torch.nn.AdaptiveMaxPool2d(out_hw)(torch.from_numpy(x)).numpy()
        # ours: NHWC
        got = adaptive_max_pool_2d(jx(x.transpose(0, 2, 3, 1)), out_hw)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   rtol=1e-6)

    @pytest.mark.parametrize("t,l", [(30, 8), (8, 8), (5, 8), (1, 8)])
    def test_matches_torch_1d(self, t, l):
        x = RNG.randn(2, 6, t).astype(np.float32)  # torch (B, C, T)
        want = torch.nn.AdaptiveMaxPool1d(l)(torch.from_numpy(x)).numpy()
        got = adaptive_max_pool_1d(jx(x.transpose(0, 2, 1)), l, axis=1)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   rtol=1e-6)


class TestInterpolate:
    @pytest.mark.parametrize("t,l", [(30, 8), (8, 8), (3, 8)])
    def test_matches_torch_nearest(self, t, l):
        x = RNG.randn(2, 6, t).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), l).numpy()
        got = interpolate_nearest_1d(jx(x.transpose(0, 2, 1)), l, axis=1)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   rtol=1e-6)


class TestLayerNorm2D:
    def test_matches_torch_layernorm_CL(self):
        # torch LayerNorm([C, L]) on (B, C, L) == LayerNorm2D on (B, L, C)
        B, C, L = 4, 6, 5
        x = RNG.randn(B, C, L).astype(np.float32)
        want = torch.nn.LayerNorm([C, L])(torch.from_numpy(x)).detach().numpy()
        mod = LayerNorm2D()
        vars_ = mod.init(jax.random.PRNGKey(0), jx(x.transpose(0, 2, 1)))
        got = mod.apply(vars_, jx(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   rtol=2e-5, atol=2e-6)


class TestEdgeWeightedSum:
    def test_collapses_mixed_ops(self):
        # sum_j (w_none*0 + w_skip*x_j) over 3 states
        states = RNG.randn(3, 2, 4, 6).astype(np.float32)
        w = np.array([0.2, 0.5, 0.9], np.float32)
        got = edge_weighted_sum(jx(states), jx(w))
        want = sum(w[i] * states[i] for i in range(3))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def _apply(mod, x, y, train=False, rngs=None):
    vars_ = mod.init(jax.random.PRNGKey(0), x, y, train=False)
    return mod, vars_


class TestInnerOps:
    B, L, C = 3, 8, 16

    def _xy(self):
        x = jx(RNG.randn(self.B, self.L, self.C).astype(np.float32))
        y = jx(RNG.randn(self.B, self.L, self.C).astype(np.float32))
        return x, y

    def test_sum(self):
        x, y = self._xy()
        mod = SumOp()
        v = mod.init(jax.random.PRNGKey(0), x, y, train=False)
        np.testing.assert_allclose(np.asarray(mod.apply(v, x, y, train=False)),
                                   np.asarray(x) + np.asarray(y), rtol=1e-6)

    def test_scaled_dot_attn_matches_reference_math(self):
        x, y = self._xy()
        mod = ScaledDotAttn(C=self.C, L=self.L)
        v = mod.init(jax.random.PRNGKey(0), x, y, train=False)
        got = mod.apply(v, x, y, train=False)
        # reference math in (B, C, L): q = x^T, k = y, v = y^T
        xt = np.asarray(x).transpose(0, 2, 1)  # (B, C, L)
        yt = np.asarray(y).transpose(0, 2, 1)
        q = torch.from_numpy(xt).transpose(1, 2)
        k = torch.from_numpy(yt)
        vv = torch.from_numpy(yt).transpose(1, 2)
        scores = torch.matmul(q, k) / np.sqrt(q.shape[-1])
        attn = F.softmax(scores, dim=-1)
        out = torch.matmul(attn, vv).transpose(1, 2)  # (B, C, L)
        out = torch.nn.LayerNorm([self.C, self.L])(out).detach().numpy()
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), out,
                                   rtol=2e-4, atol=2e-5)

    def test_linear_glu_gating(self):
        # with identity-like params check GLU split semantics via torch
        x, y = self._xy()
        mod = LinearGLU(C=self.C, drpt=0.0)
        v = mod.init(jax.random.PRNGKey(1), x, y, train=False)
        got = np.asarray(mod.apply(v, x, y, train=False))
        # manual recompute with the same params
        kernel = np.asarray(v["params"]["Dense_0"]["kernel"])
        bias = np.asarray(v["params"]["Dense_0"]["bias"])
        cat = np.concatenate([np.asarray(x), np.asarray(y)], axis=-1)
        h = cat @ kernel + bias
        # BN in eval mode with init stats: mean 0 var 1 -> h * 1 + 0
        a, b = np.split(h, 2, axis=-1)
        want = a * (1.0 / (1.0 + np.exp(-b)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_concat_fc_shape_and_relu(self):
        x, y = self._xy()
        mod = ConcatFC(C=self.C, drpt=0.0)
        v = mod.init(jax.random.PRNGKey(1), x, y, train=False)
        got = np.asarray(mod.apply(v, x, y, train=False))
        assert got.shape == (self.B, self.L, self.C)
        assert (got >= 0).all()

    def test_node_mixed_op_is_weighted_sum_of_branches(self):
        x, y = self._xy()
        mod = NodeMixedOp(C=self.C, L=self.L, drpt=0.0)
        v = mod.init(jax.random.PRNGKey(2), x, y, jnp.ones(4) / 4, train=False)
        w = jnp.asarray([0.1, 0.2, 0.3, 0.4])
        got = np.asarray(mod.apply(v, x, y, w, train=False))
        # one-hot weights recover each branch; their weighted sum == mixed out
        branches = []
        for i in range(4):
            onehot = jnp.zeros(4).at[i].set(1.0)
            branches.append(np.asarray(mod.apply(v, x, y, onehot, train=False)))
        want = sum(float(w[i]) * branches[i] for i in range(4))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestMaxout:
    def test_matches_torch_semantics(self):
        d, m, k = 10, 4, 5
        x = RNG.randn(3, d).astype(np.float32)
        mod = Maxout(features=m, pool_size=k)
        v = mod.init(jax.random.PRNGKey(0), jx(x))
        got = np.asarray(mod.apply(v, jx(x)))
        kernel = np.asarray(v["params"]["Dense_0"]["kernel"])
        bias = np.asarray(v["params"]["Dense_0"]["bias"])
        lin = torch.from_numpy(x @ kernel + bias)
        want, _ = lin.view(3, m, k).max(dim=2)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)
