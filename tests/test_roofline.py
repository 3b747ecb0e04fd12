"""Guard tests for the static MXU roofline walker (benchmarks/mxu_roofline.py).

The roofline artifact (benchmarks/ROOFLINE.md) is part of the published perf
record, so its FLOP accounting and tile-padding model get oracle tests: a
hand-computed grouped conv, a batched dot, and a scan body whose counts must
multiply by trip count.
"""
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_roofline():
    path = os.path.join(_ROOT, "benchmarks", "mxu_roofline.py")
    spec = importlib.util.spec_from_file_location("mxu_roofline", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["mxu_roofline"] = mod
    spec.loader.exec_module(mod)
    return mod


rl = _load_roofline()


def _analyze(fn, *args):
    jxp = jax.make_jaxpr(fn)(*args)
    acc = rl.Acc()
    rl.walk(jxp.jaxpr, acc)
    return acc


class TestWalker:
    def test_grouped_conv_flops_and_padding(self):
        # (B=2, H=W=8, Cin=32) -> Cout=32, 3x3 kernel, 4 feature groups:
        # per-group GEMM is M=2*8*8=128, N=32/4=8, K=3*3*8=72.
        x = jax.ShapeDtypeStruct((2, 8, 8, 32), jnp.float32)
        w = jax.ShapeDtypeStruct((3, 3, 8, 32), jnp.float32)

        def f(x, w):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                feature_group_count=4)

        acc = _analyze(f, x, w)
        M, N, K, G = 2 * 8 * 8, 8, 72, 4
        assert acc.flops == 2.0 * M * N * K * G
        assert acc.padded == 2.0 * 128 * 128 * 128 * G  # N->128, K->128
        (row,) = acc.rows.values()
        assert (row["N_per_group"], row["K_per_group"], row["groups"]) == \
            (N, K, G)

    def test_dot_general_batched(self):
        # batched matmul: B=3 batch, M=16, K=32, N=64
        a = jax.ShapeDtypeStruct((3, 16, 32), jnp.float32)
        b = jax.ShapeDtypeStruct((3, 32, 64), jnp.float32)
        acc = _analyze(lambda a, b: jnp.einsum("bmk,bkn->bmn", a, b), a, b)
        assert acc.flops == 2.0 * 3 * 16 * 32 * 64
        # M=16 -> 16 (already /8), N=64 -> 128, K=32 -> 128
        assert acc.padded == 2.0 * 16 * 128 * 128 * 3

    def test_scan_multiplies_by_length(self):
        w = jax.ShapeDtypeStruct((32, 32), jnp.float32)
        xs = jax.ShapeDtypeStruct((5, 4, 32), jnp.float32)

        def f(w, xs):
            def body(carry, x):
                return carry, x @ w
            return jax.lax.scan(body, 0.0, xs)

        acc = _analyze(f, w, xs)
        assert acc.flops == 5 * 2.0 * 4 * 32 * 32

    def test_jit_boundary_is_traversed(self):
        a = jax.ShapeDtypeStruct((8, 16), jnp.float32)
        g = jax.jit(lambda x: x @ x.T)
        acc = _analyze(lambda x: g(x), a)
        assert acc.flops == 2.0 * 8 * 8 * 16

    def test_remat_body_counted(self):
        a = jax.ShapeDtypeStruct((8, 16), jnp.float32)
        w = jax.ShapeDtypeStruct((16, 16), jnp.float32)

        def f(x, w):
            h = jax.checkpoint(lambda x: jnp.tanh(x @ w))(x)
            return jnp.sum(h)

        # forward + backward: remat recomputes the fwd matmul inside the
        # bwd, and d/dx, d/dw add two more GEMMs of the same size
        acc = _analyze(lambda x, w: jax.grad(
            lambda x: f(x, w))(x), a, w)
        base = 2.0 * 8 * 16 * 16
        assert acc.flops >= 3 * base  # fwd + recompute-or-reuse + 2 grads


class TestWorkloadSmoke:
    def test_mmimdb_trace_is_mxu_bound_and_sane(self):
        builder, batch = rl.WORKLOADS["mmimdb_bf16"]
        res = rl.analyze("mmimdb_bf16", builder, batch)
        assert res["gflops"] > 100           # VGG-19 fwd at 160x256, b8
        assert 0 < res["mxu_tile_efficiency"] <= 1
        assert res["predicted_mfu_ceiling"] == res["mxu_tile_efficiency"] \
            or res["bound_by"] == "HBM"
        assert res["predicted_max_samples_per_sec"] > 1000
