#!/usr/bin/env python
"""Probe: are ResNeXt's 32-group 3x3x3 convs the ego-search MFU sink?

Times each distinct grouped-conv shape of the ResNeXt-101 tower (batch 96,
32x112x112 inputs — bench.measure_ego_search's workload) three ways:
  grouped   — feature_group_count=32 as the model runs today;
  dense     — same conv with a block-diagonal kernel (identical math, the
              off-block weights are zero; 32x the counted FLOPs but full
              128x128 MXU tiles);
  dense_eq  — a genuinely dense kernel (upper bound for the dense path).

If dense beats grouped in wall-clock, the fix is a block-diagonal rewrite of
ResNeXtBottleneck's conv2 (models/resnext.py:45-47). Prints one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# (T, H, W, mid_channels) per stage at batch 96; mid = planes (cardinality 32)
SHAPES = [
    ("layer1", (16, 28, 28), 128),
    ("layer2", (8, 14, 14), 256),
    ("layer3", (4, 7, 7), 512),
    ("layer4", (2, 4, 4), 1024),
]
B = 96
GROUPS = 32


def timeit(fn, x, w, iters=30, warm=5):
    # chained applications amortize relay RTT; scalar fetch is the only sync
    def chain(x, w, n):
        def body(c, _):
            return fn(c, w) * 0.999 + x * 1e-3, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(out[0, 0, 0, 0])

    j = jax.jit(chain, static_argnums=2)
    float(j(x, w, warm))
    t0 = time.perf_counter()
    float(j(x, w, iters))
    per = (time.perf_counter() - t0) / iters
    return per


def main():
    out = {}
    for name, (t, h, w_sp), mid in SHAPES:
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(B, t, h, w_sp, mid).astype(np.float32),
                        jnp.bfloat16)
        cpg = mid // GROUPS  # channels per group
        k_g = jnp.asarray(np.random.RandomState(1)
                          .randn(3, 3, 3, cpg, mid).astype(np.float32),
                          jnp.bfloat16)
        # block-diagonal dense kernel: same math as grouped, zeros off-block
        k_d = np.zeros((3, 3, 3, mid, mid), np.float32)
        kg = np.asarray(k_g, np.float32)
        for g in range(GROUPS):
            k_d[:, :, :, g * cpg:(g + 1) * cpg, g * cpg:(g + 1) * cpg] = \
                kg[:, :, :, :, g * cpg:(g + 1) * cpg]
        k_d = jnp.asarray(k_d, jnp.bfloat16)

        dn = jax.lax.conv_dimension_numbers(
            x.shape, (3, 3, 3, cpg, mid), ("NTHWC", "THWIO", "NTHWC"))

        def grouped(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=GROUPS)

        dn_d = jax.lax.conv_dimension_numbers(
            x.shape, (3, 3, 3, mid, mid), ("NTHWC", "THWIO", "NTHWC"))

        def dense(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", dimension_numbers=dn_d)

        # correctness: block-diagonal dense == grouped
        if name == "layer1":
            a = np.asarray(grouped(x, k_g), np.float32)
            b = np.asarray(dense(x, k_d), np.float32)
            err = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-6))
            out["blockdiag_rel_err"] = round(err, 6)

        tg = timeit(grouped, x, k_g)
        td = timeit(dense, x, k_d)
        out[f"{name}_grouped_ms"] = round(tg * 1e3, 3)
        out[f"{name}_dense_ms"] = round(td * 1e3, 3)
        out[f"{name}_dense_speedup"] = round(tg / td, 2)

    # decision-grade: the WHOLE ego search step, grouped vs block-diag dense
    import bench
    for tag, dg in (("grouped", False), ("dense", True)):
        try:
            sps, t_step, *_ = bench.measure_ego_search(iters=30, warm=5,
                                                      dense_grouped=dg)
            out[f"ego_step_{tag}_ms"] = round(t_step * 1e3, 2)
            out[f"ego_step_{tag}_sps"] = round(sps, 1)
        except Exception as e:
            out[f"ego_step_{tag}_error"] = f"{type(e).__name__}: {e}"[:150]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
