"""bf16-threaded BatchNorm (VERDICT r04 #5 — NTU-found bandwidth gap).

ops/layers.BatchNorm now forwards a ``dtype`` so bf16 backbones keep their
activations bf16 through BN+relu instead of promoting to fp32 between
every conv (2x the elementwise HBM bytes; benchmarks/ROOFLINE.md #4).
These tests pin the numerics contract: statistics are still computed in
fp32 (flax upcasts internally), running stats and scale/bias params stay
fp32, outputs are bf16 and match the fp32 reference within bf16 tolerance,
and the fp32 default is bit-for-bit unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.ops.layers import BatchNorm


def _run(dtype, x, train=True):
    bn = BatchNorm(dtype=dtype)
    variables = bn.init(jax.random.PRNGKey(0), x, True)
    out, mut = bn.apply(variables, x, train, mutable=["batch_stats"])
    return out, variables, mut["batch_stats"]


@pytest.mark.quick
def test_bf16_output_dtype_and_fp32_params_stats():
    x = jnp.asarray(np.random.RandomState(0).randn(8, 4, 4, 16),
                    jnp.bfloat16)
    out, variables, stats = _run(jnp.bfloat16, x)
    assert out.dtype == jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(stats):
        assert leaf.dtype == jnp.float32  # running stats stay fp32


@pytest.mark.quick
def test_bf16_matches_fp32_within_tolerance():
    r = np.random.RandomState(1)
    x32 = r.randn(16, 8, 8, 32).astype(np.float32) * 3 + 1.5
    out32, _, stats32 = _run(None, jnp.asarray(x32))
    out16, _, stats16 = _run(jnp.bfloat16, jnp.asarray(x32, jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), atol=0.05, rtol=0.05)
    # the batch statistics reductions stay fp32-accurate: running stats of
    # the two runs agree to much tighter than bf16 resolution would allow
    # if the reduction itself had been done in bf16
    for a, b in zip(jax.tree_util.tree_leaves(stats16),
                    jax.tree_util.tree_leaves(stats32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=6e-3, atol=6e-3)


@pytest.mark.quick
def test_fp32_default_unchanged():
    """dtype=None must reproduce the exact pre-change behavior (all the
    torch-parity goldens run through this path)."""
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(4, 6, 10).astype(np.float32))
    out_default, _, _ = _run(None, x)
    out_fp32, _, _ = _run(jnp.float32, x)
    assert out_default.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out_default),
                                  np.asarray(out_fp32))


@pytest.mark.quick
def test_eval_mode_bf16_uses_running_stats():
    x = jnp.asarray(np.random.RandomState(3).randn(8, 16), jnp.bfloat16)
    bn = BatchNorm(dtype=jnp.bfloat16)
    variables = bn.init(jax.random.PRNGKey(0), x, True)
    out = bn.apply(variables, x, False)  # eval: running stats, no mutation
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
