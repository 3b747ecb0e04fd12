"""Batch-inference serving CLI on top of ``bmnas_tpu.serving``.

The reference has no serving path — its test-only CLI mode re-instantiates
the whole training stack for a single pass. This entry point loads a found
experiment's genotype + model snapshot and serves a dataset split through
``FoundNetServer``: one compiled inference function, optional bfloat16,
optional fused Pallas cell kernel, optional data-parallel mesh.

Usage (task-specific flags are the found CLIs' own):

    python main_serve.py --task mmimdb --eval_exp_dir <exp> \
        --datadir ... [--bf16] [--fused_kernels] [--parallel] [--split test]

Prints one JSON line: {"metric", "value", "samples", "samples_per_sec"}.
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import time

import numpy as np


def _resolve_artifacts(exp_dir: str, model_path: str = None):
    """Locate (genotype, snapshot) under <exp>/best/ — eval dirs carry
    best_test_* (train_searchable/mmimdb.py:155-182 naming), search dirs
    best_*."""
    best = os.path.join(exp_dir, "best")
    geno = None
    for name in ("best_test_genotype.pkl", "best_genotype.pkl"):
        p = os.path.join(best, name)
        if os.path.exists(p):
            geno = p
            break
    snap = model_path
    if snap is None:
        for name in ("best_test_model.pt", "best_model.pt"):
            p = os.path.join(best, name)
            if os.path.exists(p):
                snap = p
                break
    if geno is None or snap is None:
        raise SystemExit(f"no genotype/model snapshot under {best}")
    return geno, snap


def _build_task(task: str, args, genotype):
    """Found model + eval dataset for a task (mirrors each CLI's run_found)."""
    from bmnas_tpu.cli.common import model_kwargs_from_args

    kwargs = dict(node_variant=getattr(args, "node_variant", "bmnas"),
                  fused_eval=getattr(args, "fused_kernels", False),
                  **model_kwargs_from_args(args))
    if task == "mmimdb":
        from bmnas_tpu.models.mmimdb import FoundImageTextNet
        model = FoundImageTextNet.from_genotype(genotype, **kwargs)
    elif task == "ntu":
        from bmnas_tpu.models.ntu import FoundSkeletonImageNet
        model = FoundSkeletonImageNet.from_genotype(
            genotype, remat=getattr(args, "remat", False), **kwargs)
    else:
        from bmnas_tpu.models.ego import FoundRGBDepthNet
        model = FoundRGBDepthNet.from_genotype(genotype, **kwargs)
    return model


def _dataset(task: str, args, split: str):
    if task == "mmimdb":
        from bmnas_tpu.data.mmimdb import MMIMDBDataset
        return MMIMDBDataset(args.datadir, split,
                             small_dataset=args.small_dataset,
                             num_workers=args.num_workers)
    if task == "ntu":
        from bmnas_tpu.data.ntu import NTUDataset
        return NTUDataset(args.datadir, split,
                          small_dataset=args.small_dataset,
                          vid_len=tuple(args.vid_len), vid_dim=args.vid_dim,
                          num_workers=args.num_workers)
    from bmnas_tpu.data.ego import EgoDataset
    annotation = os.path.join(args.checkpointdir, args.annotation)
    subset = {"test": "testing", "dev": "validation",
              "train": "training"}.get(split, split)
    return EgoDataset(args.datadir, annotation, subset,
                      small_dataset=args.small_dataset,
                      sample_size=args.sample_size,
                      sample_duration=args.sample_duration,
                      downsample=args.downsample, train_transform=False,
                      num_workers=args.num_workers)


def _metric(task: str, logits: np.ndarray, labels: np.ndarray):
    if task == "mmimdb":
        from bmnas_tpu.cli.mmimdb import TH_FSCORE
        from bmnas_tpu.utils.metrics import f1_from_counts, multilabel_counts
        import jax.numpy as jnp
        preds = (1.0 / (1.0 + np.exp(-logits)) > TH_FSCORE).astype(np.float32)
        counts = multilabel_counts(jnp.asarray(preds), jnp.asarray(labels),
                                   jnp.ones(len(labels)))
        counts = {k: np.asarray(v) for k, v in counts.items()}
        return "weighted_f1", float(f1_from_counts(counts, "weighted"))
    acc = float((logits.argmax(-1) == labels.astype(np.int64)).mean())
    return "accuracy", acc


def main_serve(argv=None):
    top = argparse.ArgumentParser(description="BM-NAS found-net serving")
    top.add_argument("--task", choices=["mmimdb", "ntu", "ego"],
                     required=True)
    top.add_argument("--eval_exp_dir", default=None,
                     help="experiment dir with best/{*genotype.pkl,*model.pt}"
                          " (required unless --from_export)")
    top.add_argument("--model", default=None,
                     help="explicit snapshot path (default: best/ lookup)")
    top.add_argument("--split", default="test",
                     help="dataset split/stage to serve")
    top.add_argument("--bf16", action="store_true",
                     help="serve with bfloat16 weights/activations")
    top.add_argument("--export", default=None, metavar="PATH",
                     help="write a self-contained jax.export artifact "
                          "(StableHLO + baked weights, cpu+tpu) instead of "
                          "serving; verified against the live server on one "
                          "batch before writing")
    top.add_argument("--from_export", default=None, metavar="PATH",
                     help="serve from a jax.export artifact instead of "
                          "building the model from genotype + snapshot")
    args0, rest = top.parse_known_args(argv)

    mod = importlib.import_module(f"bmnas_tpu.cli.{args0.task}")
    # reuse the found CLI's full flag set (model shape, data paths, ...)
    args = mod.parse_found_args(rest)
    from bmnas_tpu.cli.common import fail_fast_checks
    fail_fast_checks(args)

    import jax.numpy as jnp

    from bmnas_tpu.cli.common import maybe_parallel
    from bmnas_tpu.genotype import load_genotype
    from bmnas_tpu.serving import load_exported, load_server

    geno_path = snap_path = None
    if args0.from_export is not None:
        server = load_exported(args0.from_export)
    else:
        if args0.eval_exp_dir is None:
            raise SystemExit("--eval_exp_dir is required unless "
                             "--from_export is given")
        geno_path, snap_path = _resolve_artifacts(args0.eval_exp_dir,
                                                  args0.model)
        genotype = load_genotype(geno_path)
        model = _build_task(args0.task, args, genotype)
        parallel_ctx = maybe_parallel(args) if args0.export is None else None
        if parallel_ctx is not None:
            from bmnas_tpu.parallel.mesh import pad_batch_to_multiple
            args.batchsize = pad_batch_to_multiple(args.batchsize,
                                                   parallel_ctx.num_devices)
        server = load_server(
            snap_path, model,
            dtype=jnp.bfloat16 if args0.bf16 else jnp.float32,
            parallel_ctx=parallel_ctx,
            fused=getattr(args, "fused_kernels", False))

    dataset = _dataset(args0.task, args, args0.split)

    if args0.export is not None:
        # one example batch fixes the artifact's (static) batch schema;
        # verify the artifact reproduces the live server before writing
        example = next(iter(dataset.batches(args.batchsize, shuffle=False)))
        blob = server.export_bytes(example)
        exported = load_exported(blob)
        live, exp_out = server.predict(example), exported.predict(example)
        np.testing.assert_allclose(exp_out, live, rtol=2e-5, atol=2e-5)
        with open(args0.export, "wb") as f:
            f.write(blob)
        result = {
            "metric": "export_artifact_bytes",
            "value": len(blob),
            "path": args0.export,
            "platforms": list(exported.platforms),
            "batchsize": args.batchsize,
            "verified_batch_max_abs_diff": float(
                np.abs(exp_out - live).max()),
            "genotype": geno_path,
            "model": snap_path,
        }
        print(json.dumps(result))
        return result
    label_key = "label"
    logits_parts, labels_parts = [], []
    n_total = n_warm = 0
    t0 = t_warm = time.perf_counter()
    for batch in dataset.batches(args.batchsize, shuffle=False):
        n = int(batch["mask"].sum()) if "mask" in batch else len(
            batch[label_key])
        out = server.predict(batch)
        logits_parts.append(out)
        labels_parts.append(np.asarray(batch[label_key])[:n])
        n_total += n
        if n_warm == 0:
            # first predict() includes jit compilation; steady-state
            # throughput starts here
            n_warm, t_warm = n_total, time.perf_counter()
    elapsed = time.perf_counter() - t0
    steady = time.perf_counter() - t_warm
    logits = np.concatenate(logits_parts, axis=0)
    labels = np.concatenate(labels_parts, axis=0)
    name, value = _metric(args0.task, logits, labels)
    result = {
        "metric": name,
        "value": round(value, 6),
        "samples": n_total,
        "samples_per_sec": round(
            (n_total - n_warm) / steady if n_total > n_warm
            else n_total / max(elapsed, 1e-9), 2),
        "wall_seconds_incl_compile": round(elapsed, 2),
        "genotype": geno_path,
        "model": snap_path,
        "from_export": args0.from_export,
        "bf16": bool(args0.bf16),
        "fused_kernels": bool(getattr(args, "fused_kernels", False)),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main_serve()
