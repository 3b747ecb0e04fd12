#!/usr/bin/env python
"""Static MXU/HBM roofline analysis of the bench.py hot steps (chip-free).

VERDICT r03 #4/#6 asked where the missing 70-83% of the bf16 roof goes on
the video steps. Most of the answer is *static*: walk the step's jaxpr
(backend-independent — no TPU or compile needed), count FLOPs per
contraction op, and model how each conv/dot tiles onto the v5e MXU
(128x128 systolic array; lane dim padded to 128, sublane to 8). Grouped
convs are the worst case the hardware has: ResNeXt-101's cardinality-32
blocks give each group 4-32 output channels, so a layer1 grouped conv
fills 4/128 lanes — a 3% ceiling on that op no kernel tuning can fix
short of changing the execution plan (see --dense_grouped_convs,
models/resnext.py BlockDiagGroupedConv).

For each workload this prints per-op-class FLOPs, padded-FLOPs (what the
MXU actually clocks through), the resulting compute-bound MFU ceiling,
and an HBM floor from conv operand/result traffic at 819 GB/s. The
measured MFU (BENCH_r*.json) should sit at or below min(ceilings); the
gap between measured and predicted is what on-chip profiling
(benchmarks/profile_steps.py) still has to explain.

Reference workloads: main_darts_searchable_ego.py:39-67 (ego search),
main_darts_found_ntu.py:122-139 (NTU found), datasets/mmimdb.py +
main_darts_searchable_mmimdb.py (MM-IMDB search) — same shapes as
bench.py's measure_* functions.

Usage: python benchmarks/mxu_roofline.py [--workloads ego_search,...]
Writes benchmarks/roofline.json and prints one JSON line per workload.
"""
import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize overrides the JAX_PLATFORMS env var; the config
# call is the only reliable way to stay off the (possibly absent) TPU.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK_FLOPS = 197e12   # v5e bf16 MXU peak (same single roof as bench.py)
HBM_BW = 819e9        # v5e HBM bytes/s
LANE = 128            # MXU lane width (N and K pad to this)
SUBLANE = 8           # sublane pad (M); bf16 packs 16 but M is always huge


def _ceil(x, m):
    return m * math.ceil(x / m)


class Acc:
    """Accumulates contraction ops into shape-classes."""

    def __init__(self):
        self.rows = {}
        self.flops = 0.0
        self.padded = 0.0
        self.bytes = 0.0
        self.elementwise_bytes = 0.0

    def add(self, kind, M, N, K, groups, out_elems, op_bytes, mult):
        """One contraction: per-group GEMM MxNxK, `groups` of them."""
        f = 2.0 * M * N * K * groups * mult
        pf = 2.0 * _ceil(M, SUBLANE) * _ceil(N, LANE) * _ceil(K, LANE) \
            * groups * mult
        key = (kind, int(N), int(K), int(groups))
        row = self.rows.setdefault(
            key, {"kind": kind, "N_per_group": int(N), "K_per_group": int(K),
                  "groups": int(groups), "count": 0, "gflops": 0.0,
                  "padded_gflops": 0.0})
        row["count"] += mult
        row["gflops"] += f / 1e9
        row["padded_gflops"] += pf / 1e9
        self.flops += f
        self.padded += pf
        self.bytes += op_bytes * mult


def _aval_bytes(aval):
    try:
        return aval.size * aval.dtype.itemsize
    except Exception:
        return 0


def walk(jaxpr, acc, mult=1):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            fgc = int(eqn.params.get("feature_group_count", 1))
            bgc = int(eqn.params.get("batch_group_count", 1))
            groups = fgc * bgc
            rhs_spec = dn.rhs_spec  # (out_c, in_c, *spatial) positions
            k_spatial = 1
            for i, d in enumerate(rhs.shape):
                if i not in (rhs_spec[0], rhs_spec[1]):
                    k_spatial *= d
            cin_pg = rhs.shape[rhs_spec[1]]          # already per-group
            cout_total = rhs.shape[rhs_spec[0]]
            n_pg = cout_total // groups if cout_total % groups == 0 \
                else cout_total
            K = k_spatial * cin_pg
            M = out.size // cout_total if cout_total else out.size
            op_bytes = sum(_aval_bytes(a) for a in (lhs, rhs, out))
            acc.add("conv", M, n_pg, K, groups, out.size, op_bytes, mult)
        elif prim == "dot_general":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            K = 1
            for d in lc:
                K *= lhs.shape[d]
            B = 1
            for d in lb:
                B *= lhs.shape[d]
            N = 1
            for i, d in enumerate(rhs.shape):
                if i not in rc and i not in rb:
                    N *= d
            M = out.size // (N * B) if N * B else out.size
            op_bytes = sum(_aval_bytes(a) for a in (lhs, rhs, out))
            acc.add("dot", M, N, K, B, out.size, op_bytes, mult)
        else:
            sub = []
            m = mult
            if "jaxpr" in eqn.params:
                j = eqn.params["jaxpr"]
                sub.append(j.jaxpr if hasattr(j, "jaxpr") else j)
                if prim == "scan":
                    m = mult * int(eqn.params.get("length", 1))
            if "call_jaxpr" in eqn.params:
                j = eqn.params["call_jaxpr"]
                sub.append(j.jaxpr if hasattr(j, "jaxpr") else j)
            if "branches" in eqn.params:
                sub.extend(b.jaxpr for b in eqn.params["branches"])
            if "cond_jaxpr" in eqn.params:   # while_loop
                sub.append(eqn.params["cond_jaxpr"].jaxpr)
            if "body_jaxpr" in eqn.params:
                sub.append(eqn.params["body_jaxpr"].jaxpr)
            if sub:
                for s in sub:
                    walk(s, acc, m)
            elif len(eqn.invars) >= 1:
                # elementwise/reduction traffic (upper bound; XLA fuses
                # most of it into the adjacent convs)
                acc.elementwise_bytes += sum(
                    _aval_bytes(v.aval) for v in list(eqn.invars)
                    + list(eqn.outvars)
                    if hasattr(v, "aval")) * mult


# ---------------------------------------------------------------- workloads
# Builders mirror bench.py's measure_* construction exactly (same cfg,
# shapes, optimizers); bench.py stays the single timing tool, this file
# only TRACES — every array is a ShapeDtypeStruct (jax.eval_shape), so the
# heavyweight backbones never execute on this 1-core host. Keep the two in
# sync when workload scales change.

def _struct_batch(**shapes):
    return {k: jax.ShapeDtypeStruct(s, d) for k, (s, d) in shapes.items()}


def _abstract_state(model, batch, arch, frozen_prefixes, mk_w_tx, mk_arch_tx):
    """TrainState of ShapeDtypeStructs, built without running anything."""
    from bmnas_tpu.search.bilevel import TrainState, make_param_labels

    def init_vars(bb):
        return model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(2)}, bb, arch, True)

    variables = jax.eval_shape(init_vars, batch)
    labels = make_param_labels(variables["params"], frozen_prefixes)
    w_tx = mk_w_tx(labels)
    arch_tx = mk_arch_tx() if mk_arch_tx else None
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        arch=arch, opt_w=jax.eval_shape(w_tx.init, variables["params"]),
        opt_arch=(jax.eval_shape(arch_tx.init, arch)
                  if arch_tx is not None else None),
        rng=jax.random.PRNGKey(3), step=jnp.asarray(0, jnp.int32))
    return state, w_tx, arch_tx


def build_ego_search(dense_grouped=False, batch=96):
    from bmnas_tpu.models.ego import EGO_FROZEN_PREFIXES, SearchableRGBDepthNet
    from bmnas_tpu.models.supernet import init_arch_params
    from bmnas_tpu.search.bilevel import (
        build_step_functions,
        cross_entropy,
        make_arch_optimizer,
        make_weight_optimizer,
    )
    cfg = dict(C=128, L=8, steps=2, multiplier=2, node_steps=3,
               node_multiplier=3, num_input_nodes=8, num_keep_edges=2,
               num_outputs=83, drpt=0.0)
    model = SearchableRGBDepthNet(backbone_dtype=jnp.bfloat16,
                                  dense_grouped=dense_grouped, **cfg)
    arch = init_arch_params(jax.random.PRNGKey(1), cfg["steps"],
                            cfg["num_input_nodes"], cfg["node_steps"])
    b = _struct_batch(
        rgb=((batch, 32, 112, 112, 3), jnp.float32),
        depth=((batch, 32, 112, 112, 1), jnp.float32),
        label=((batch,), jnp.int32),
        mask=((batch,), jnp.float32))
    state, w_tx, arch_tx = _abstract_state(
        model, b, arch, EGO_FROZEN_PREFIXES,
        lambda labels: make_weight_optimizer(labels, weight_decay=1e-4),
        lambda: make_arch_optimizer(3e-4, 1e-3))

    def apply_fn(vs, bb, a, train, rngs, mutable):
        if mutable:
            return model.apply(vs, bb, a, train, rngs=rngs, mutable=mutable)
        return model.apply(vs, bb, a, train)

    def counts_fn(logits, lab, mask):
        preds = jnp.argmax(logits, axis=-1)
        return {"correct": jnp.sum((preds == lab) * mask)}

    fns = build_step_functions(apply_fn, cross_entropy, counts_fn, w_tx,
                               arch_tx, donate=False,
                               frozen_prefixes=EGO_FROZEN_PREFIXES)
    return lambda: jax.make_jaxpr(
        lambda s, bb: fns.weight_step(s, bb, np.float32(3e-3)))(state, b)


def build_ntu_found(batch=48):
    from bmnas_tpu.genotype import Genotype, StepGenotype
    from bmnas_tpu.models.ntu import FoundSkeletonImageNet
    from bmnas_tpu.search.bilevel import (
        build_step_functions,
        cross_entropy,
        make_weight_optimizer,
    )
    geno = Genotype(
        edges=[("skip", 2), ("skip", 5), ("skip", 3), ("skip", 4)],
        steps=[StepGenotype([("skip", 0), ("skip", 1)], ["ScaleDotAttn"], [2]),
               StepGenotype([("skip", 1), ("skip", 0)], ["LinearGLU"], [2])],
        concat=[8, 9])
    model = FoundSkeletonImageNet.from_genotype(
        geno, remat=True, backbone_dtype=jnp.bfloat16, C=128, L=8, steps=2,
        multiplier=2, node_steps=1, node_multiplier=1, num_input_nodes=8,
        num_keep_edges=2, num_outputs=60, drpt=0.0)
    b = _struct_batch(
        image=((batch, 8, 256, 256, 3), jnp.float32),
        skeleton=((batch, 32, 25, 2, 3), jnp.float32),
        label=((batch,), jnp.int32),
        mask=((batch,), jnp.float32))
    state, w_tx, _ = _abstract_state(
        model, b, None, (),
        lambda labels: make_weight_optimizer(labels, weight_decay=1e-4),
        None)

    def apply_fn(vs, bb, a, train, rngs, mutable):
        if mutable:
            return model.apply(vs, bb, a, train, rngs=rngs, mutable=mutable)
        return model.apply(vs, bb, a, train)

    def counts_fn(logits, lab, mask):
        preds = jnp.argmax(logits, axis=-1)
        return {"correct": jnp.sum((preds == lab) * mask)}

    fns = build_step_functions(apply_fn, cross_entropy, counts_fn, w_tx,
                               None, donate=False)
    return lambda: jax.make_jaxpr(
        lambda s, bb: fns.weight_step(s, bb, np.float32(1e-3)))(state, b)


def build_mmimdb(backbone_dtype=jnp.bfloat16, batch=8):
    from bmnas_tpu.models.mmimdb import (
        MMIMDB_FROZEN_PREFIXES,
        SearchableImageTextNet,
    )
    from bmnas_tpu.models.supernet import init_arch_params
    from bmnas_tpu.search.bilevel import (
        bce_with_logits,
        build_step_functions,
        make_arch_optimizer,
        make_weight_optimizer,
    )
    from bmnas_tpu.utils.metrics import multilabel_counts
    cfg = dict(C=192, L=16, steps=2, multiplier=2, node_steps=1,
               node_multiplier=1, num_input_nodes=6, num_keep_edges=2,
               num_outputs=23, drpt=0.1)
    model = SearchableImageTextNet(backbone_dtype=backbone_dtype, **cfg)
    arch = init_arch_params(jax.random.PRNGKey(1), cfg["steps"],
                            cfg["num_input_nodes"], cfg["node_steps"])
    b = _struct_batch(
        image=((batch, 160, 256, 3), jnp.float32),
        text=((batch, 300), jnp.float32),
        label=((batch, 23), jnp.float32),
        mask=((batch,), jnp.float32))
    state, w_tx, arch_tx = _abstract_state(
        model, b, arch, MMIMDB_FROZEN_PREFIXES,
        lambda labels: make_weight_optimizer(labels, weight_decay=1e-4),
        lambda: make_arch_optimizer(3e-4, 1e-3))

    def apply_fn(vs, bb, a, train, rngs, mutable):
        if mutable:
            return model.apply(vs, bb, a, train, rngs=rngs, mutable=mutable)
        return model.apply(vs, bb, a, train)

    def counts_fn(logits, lab, mask):
        preds = (jax.nn.sigmoid(logits) > 0.3).astype(jnp.float32)
        return multilabel_counts(preds, lab, mask)

    fns = build_step_functions(apply_fn, bce_with_logits, counts_fn, w_tx,
                               arch_tx, donate=False,
                               frozen_prefixes=MMIMDB_FROZEN_PREFIXES)
    return lambda: jax.make_jaxpr(
        lambda s, bb: fns.weight_step(s, bb, np.float32(1e-3)))(state, b)


WORKLOADS = {
    "ego_search": (lambda: build_ego_search(False), 96),
    "ego_search_dense": (lambda: build_ego_search(True), 96),
    "ntu_found": (build_ntu_found, 48),
    "mmimdb_bf16": (build_mmimdb, 8),
}


def analyze(name, builder, batch):
    jxp = builder()()
    acc = Acc()
    walk(jxp.jaxpr, acc)
    mxu_floor_s = acc.padded / PEAK_FLOPS
    hbm_floor_s = acc.bytes / HBM_BW
    bound = "MXU" if mxu_floor_s >= hbm_floor_s else "HBM"
    ceiling = acc.flops / (max(mxu_floor_s, hbm_floor_s) * PEAK_FLOPS) \
        if acc.flops else 0.0
    top = sorted(acc.rows.values(), key=lambda r: -r["padded_gflops"])[:8]
    for r in top:
        r["gflops"] = round(r["gflops"], 1)
        r["padded_gflops"] = round(r["padded_gflops"], 1)
        r["mxu_eff"] = round(r["gflops"] / r["padded_gflops"], 3) \
            if r["padded_gflops"] else None
    return {
        "workload": name,
        "batch": batch,
        "gflops": round(acc.flops / 1e9, 1),
        "padded_gflops": round(acc.padded / 1e9, 1),
        "mxu_tile_efficiency": round(acc.flops / acc.padded, 4)
        if acc.padded else None,
        "contraction_hbm_gb": round(acc.bytes / 1e9, 3),
        "mxu_floor_ms": round(mxu_floor_s * 1e3, 2),
        "hbm_floor_ms": round(hbm_floor_s * 1e3, 2),
        "bound_by": bound,
        "predicted_mfu_ceiling": round(ceiling, 4),
        "predicted_min_step_ms": round(max(mxu_floor_s, hbm_floor_s) * 1e3, 2),
        "predicted_max_samples_per_sec": round(
            batch / max(mxu_floor_s, hbm_floor_s), 1),
        "top_op_classes": top,
        "elementwise_bytes_gb_upper_bound": round(
            acc.elementwise_bytes / 1e9, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default=",".join(WORKLOADS))
    args = ap.parse_args()
    out = {}
    for name in args.workloads.split(","):
        builder, batch = WORKLOADS[name]
        res = analyze(name, builder, batch)
        out[name] = res
        print(json.dumps(res))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# written {path}")


if __name__ == "__main__":
    main()
