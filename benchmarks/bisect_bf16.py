#!/usr/bin/env python
"""Bisect the r02->r03 bf16 MM-IMDB bench regression (3522 -> 1748 samples/s).

Two bench-visible changes landed between the measurements:
  * commit 81ec176 — frozen-partition weight step (backbones closed over as
    constants, no backward built for them);
  * commit 9301225 — bench.py times the AOT-compiled executable
    (jitted.lower().compile()) instead of the jit dispatch path.

This script measures the bf16 weight step under all four combinations and the
arch step (unchanged by both commits) separately, so the regressed component
and the causal commit are unambiguous. Prints one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402


def build(frozen):
    from bmnas_tpu.models.mmimdb import (
        MMIMDB_FROZEN_PREFIXES,
        SearchableImageTextNet,
    )
    from bmnas_tpu.models.supernet import init_arch_params
    from bmnas_tpu.search.bilevel import (
        TrainState,
        bce_with_logits,
        build_step_functions,
        make_arch_optimizer,
        make_param_labels,
        make_weight_optimizer,
    )
    from bmnas_tpu.utils.metrics import multilabel_counts

    cfg = dict(C=192, L=16, steps=2, multiplier=2, node_steps=1,
               node_multiplier=1, num_input_nodes=6, num_keep_edges=2,
               num_outputs=23, drpt=0.1)
    model = SearchableImageTextNet(backbone_dtype=jnp.bfloat16, **cfg)
    arch = init_arch_params(jax.random.PRNGKey(1), cfg["steps"],
                            cfg["num_input_nodes"], cfg["node_steps"])
    batch = bench.make_batch(0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(2)},
        batch, arch, True)
    labels = make_param_labels(variables["params"], MMIMDB_FROZEN_PREFIXES)
    w_tx = make_weight_optimizer(labels, weight_decay=1e-4)
    arch_tx = make_arch_optimizer(3e-4, 1e-3)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        arch=arch, opt_w=w_tx.init(variables["params"]),
        opt_arch=arch_tx.init(arch), rng=jax.random.PRNGKey(3),
        step=jnp.asarray(0, jnp.int32))

    def apply_fn(vs, b, a, train, rngs, mutable):
        if mutable:
            return model.apply(vs, b, a, train, rngs=rngs, mutable=mutable)
        return model.apply(vs, b, a, train)

    def counts_fn(logits, lab, mask):
        preds = (jax.nn.sigmoid(logits) > 0.3).astype(jnp.float32)
        return multilabel_counts(preds, lab, mask)

    fns = build_step_functions(
        apply_fn, bce_with_logits, counts_fn, w_tx, arch_tx, donate=True,
        frozen_prefixes=MMIMDB_FROZEN_PREFIXES if frozen else ())
    return fns, state


def timeit(fn_call, s, batches, iters=300, warm=20):
    for i in range(warm):
        s, c = fn_call(s, batches[i % 4])
    float(c["loss_sum"])
    t0 = time.perf_counter()
    for i in range(iters):
        s, c = fn_call(s, batches[i % 4])
    float(c["loss_sum"])
    return (time.perf_counter() - t0) / iters, s


def main():
    batches = [bench.make_batch(i) for i in range(4)]
    eta = np.float32(1e-3)
    out = {}

    for frozen in (True, False):
        fns, state = build(frozen)
        tag = "part" if frozen else "mask"
        # plain jit dispatch path
        t, state = timeit(lambda s, b: fns.weight_step(s, b, eta), state,
                          batches)
        out[f"w_jit_{tag}_ms"] = round(t * 1e3, 3)
        # AOT executable path (bench.py r03 behavior)
        fns2, state2 = build(frozen)
        w_step, flops = bench.aot_step(fns2.weight_step, state2, batches[0],
                                       eta)
        t, state2 = timeit(lambda s, b: w_step(s, b, eta), state2, batches)
        out[f"w_aot_{tag}_ms"] = round(t * 1e3, 3)
        out[f"w_aot_{tag}_gflops"] = round((flops or 0) / 1e9, 2)

    # arch step (identical across commits) once
    fns, state = build(True)
    t, state = timeit(lambda s, b: fns.arch_step(s, b), state, batches)
    out["arch_jit_ms"] = round(t * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
