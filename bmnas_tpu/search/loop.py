"""Generic epoch driver for search ('search') and found retraining ('eval').

Rebuild of the three near-identical train loops
``models/search/train_searchable/{mmimdb,ntu,ego}.py`` as one engine:

* phase schedule: search -> [train, dev]; eval -> [train, dev, test] for
  mmimdb (dev also trains! train_searchable/mmimdb.py:36-38,85,96) and
  [train, test] for ntu/ego (train_searchable/ntu.py:31-36);
* per-batch cosine LR stepping on every weight-update batch
  (mmimdb.py:96-99);
* arch (DARTS) steps on every dev batch during search (mmimdb.py:77-78);
* NaN-loss escape (mmimdb.py:150-153) and the NaN-metric one-extra-epoch
  failsafe (mmimdb.py:25-27,191-197);
* best-dev / best-test snapshots to ``<exp>/best/{best_model.pt,
  best_genotype.pkl,best_test_model.pt,best_test_genotype.pkl}``
  (mmimdb.py:155-182) and per-epoch genotype plots to
  ``<exp>/architectures/epoch_N`` (mmimdb.py:184-186);
* log-line format parity ('{phase} Loss: ..., {f1} F1: ...' /
  '{phase} Loss: ... Acc: ...', 'Fusion Model Params: N', ...).

All metric/loss accumulation stays on device; one host transfer of a
counts dict per phase (vs. the reference's per-batch .item()/.cpu() syncs).
Adds per-epoch full-state resume checkpoints (absent in the reference).
"""
from __future__ import annotations

import copy
import math
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from bmnas_tpu.genotype import Genotype, save_genotype
from bmnas_tpu.search.bilevel import StepFunctions, TrainState
from bmnas_tpu.search.scheduler import LRCosineAnnealingScheduler
from bmnas_tpu.utils import checkpoint as ckpt
from bmnas_tpu.utils.metrics import count_parameters, f1_from_counts


def _accumulate(total, counts):
    if total is None:
        return counts
    return jax.tree_util.tree_map(lambda a, b: a + b, total, counts)


def _make_preflight_accumulate():
    """_accumulate plus a ONE-TIME scalar sync on the first dispatched chunk
    of the run. Steps are dispatched async, so a RESOURCE_EXHAUSTED from an
    over-booked HBM (device cache/pool + step workspace) otherwise surfaces
    only at the end-of-phase metric fetch — the first R5HYBRID full-scale
    NTU attempt burned 50 minutes of epoch 0 before reporting the OOM. The
    eager fetch of one f32 scalar costs one relay round-trip once per run."""
    state = {"synced": False}

    def add(total, counts):
        total = _accumulate(total, counts)
        if not state["synced"]:
            state["synced"] = True
            try:
                float(np.asarray(total["loss_sum"]))
            except Exception as e:
                raise RuntimeError(
                    "preflight sync of the first dispatched chunk failed. "
                    "If the cause below is RESOURCE_EXHAUSTED, the device "
                    "data cache/pool plus the step workspace over-book HBM: "
                    "lower --device_cache_budget_gb or raise "
                    "BMNAS_CACHE_HEADROOM_GB "
                    "(see cli/common.clamp_cache_budget)") from e
        return total

    return add


def _release_host_memory():
    """Collect the TPU-relay client's buffer cycles and return freed arenas
    to the OS. Generational GC never triggers on its own here (allocation
    pressure sits in untracked C buffers), and glibc retains freed arenas —
    a streaming video run otherwise leaks the footprint of every batch ever
    sent (measured 130 GB anon RSS -> OOM kill). Called every
    _GC_EVERY_BATCHES steps from the epoch loop; costs ~ms."""
    import ctypes
    import gc
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


_GC_EVERY_BATCHES = 8


def _finalize_metric(counts: Dict[str, np.ndarray], metric: str,
                     f1_type: str, dataset_size: int):
    host = {k: np.asarray(v) for k, v in counts.items()}
    loss = float(host["loss_sum"]) / dataset_size
    if metric == "f1":
        value = f1_from_counts(host, average=f1_type, zero_division=1.0)
    else:
        value = float(host["correct"]) / dataset_size
    return loss, value


def run_training(
    *,
    task: str,
    status: str,                      # 'search' | 'eval'
    fns: StepFunctions,
    state: TrainState,
    scheduler: LRCosineAnnealingScheduler,
    loaders: Dict[str, Callable],      # phase -> fn(epoch) -> batch iterator
    dataset_sizes: Dict[str, int],
    num_epochs: int,
    metric: str,                       # 'f1' | 'acc'
    f1_type: str,
    args,
    logger,
    plotter,
    genotype_fn: Optional[Callable[[TrainState], Genotype]],
    fusion_param_keys: Callable[[str], bool] = None,
    save_resume: bool = True,
    profile_dir: Optional[str] = None,
    device_cache=None,                 # {'caches': {phase: pytree},
                                       #  'indices': fn(phase, epoch) -> (n,B)}
    gather_fns: StepFunctions = None,  # build_gather_step_functions(fns)
    resume_info: Optional[Dict] = None,  # from cli.common.apply_resume
):
    """Returns (best_metric, best_genotype, state). In search mode the best
    is tracked on dev; in eval mode on test (train_searchable/mmimdb.py:202-205)."""
    if fusion_param_keys is None:
        fusion_param_keys = lambda k: k.startswith("reshape_") or k == "fusion_net"
    _acc = _make_preflight_accumulate()

    best_metric, best_genotype, best_epoch = 0.0, None, 0
    best_test_metric, best_test_genotype, best_test_epoch = 0.0, None, 0
    start_epoch = 0
    if resume_info:
        start_epoch = resume_info.get("start_epoch", 0)
        best_metric = resume_info.get("best_metric", 0.0)
        best_test_metric = resume_info.get("best_test_metric", 0.0)
        best_epoch = resume_info.get("best_epoch", 0)
        best_test_epoch = resume_info.get("best_test_epoch", 0)
        best_genotype = resume_info.get("best_genotype")
        best_test_genotype = resume_info.get("best_test_genotype")

    # Multi-process runs: every worker computes identical state (replicated
    # deterministic updates), so only process 0 writes best/checkpoint/
    # metrics/plot artifacts — the others' -procN exp dirs keep log.txt only.
    from bmnas_tpu.parallel.multihost import is_primary_host
    primary = is_primary_host()

    if status == "search":
        phases = ["train", "dev"]
    elif task == "mmimdb":
        phases = ["train", "dev", "test"]
    else:
        phases = ["train", "test"]

    if profile_dir is None:
        profile_dir = getattr(args, "profile_dir", None)
    profiling = False

    failsafe = True
    cont_overloop = 0
    while failsafe:
        for epoch in range(start_epoch, num_epochs):
            logger.info("Epoch: {}".format(epoch))
            logger.info("EXP: {}".format(args.save))
            if profile_dir and epoch == 0 and not profiling:
                # capture the first epoch (includes compile + steady state)
                jax.profiler.start_trace(profile_dir)
                profiling = True

            genotype = None
            for phase in phases:
                trains_weights = phase == "train" or (
                    phase == "dev" and status == "eval")
                arch_steps = status == "search" and phase in ("dev", "test")
                # --unrolled: second-order DARTS needs a train batch paired
                # with every dev batch (virtual weight step inside the arch
                # objective); cycle a fresh train iterator through the phase.
                unrolled = (arch_steps and getattr(args, "unrolled", False)
                            and fns.arch_step_unrolled is not None)
                train_iter = iter(loaders["train"](epoch)) if unrolled else None
                # --steps_per_dispatch k>1: run k sequential steps per device
                # call via the scanned step variants — amortizes dispatch
                # latency (dominant for small per-step compute and/or
                # high-RTT device links). Exact same math and PRNG stream.
                spd = max(1, int(getattr(args, "steps_per_dispatch", 1)))

                counts_total = None
                use_cache = (device_cache is not None and gather_fns is not None
                             and not unrolled
                             and phase in device_cache["caches"])
                use_pool = (device_cache is not None and not unrolled
                            and not arch_steps
                            and phase in device_cache.get("pools", {})
                            and device_cache.get("pool_fns") is not None)
                if use_cache:
                    # --device_data_cache: dataset lives in HBM; steps gather
                    # their batches on device from tiny index arrays (zero
                    # per-epoch H2D traffic). Chunked by steps_per_dispatch.
                    import jax.numpy as jnp
                    cache = device_cache["caches"][phase]
                    idxs_all = device_cache["indices"](phase, epoch)
                    # NOTE: a tail chunk shorter than spd compiles a second
                    # scan program specialized to the tail length — once per
                    # (phase shape, tail length), cached across epochs.
                    # Padding it with -1 index rows would NOT be equivalent:
                    # an all-masked weight step still applies weight decay
                    # and advances the Adam moments and LR schedule.
                    for start in range(0, len(idxs_all), spd):
                        # numpy, not jnp.asarray: a host array enters the jit
                        # as replicated on the global mesh, which is what a
                        # multi-process --parallel cluster needs (jnp.asarray
                        # would commit it to one local device and clash with
                        # the globally-sharded cache arrays)
                        idx = idxs_all[start:start + spd]
                        k = idx.shape[0]
                        if arch_steps:
                            state, counts = gather_fns.arch_step_many(
                                state, cache, idx)
                        elif trains_weights:
                            etas = np.asarray(
                                [scheduler.step() for _ in range(k)],
                                np.float32)
                            state, counts = gather_fns.weight_step_many(
                                state, cache, idx, etas)
                        else:
                            counts = gather_fns.eval_step_many(
                                state, cache, idx)
                        counts_total = _acc(counts_total, counts)
                elif use_pool:
                    # --device_data_cache train FRAME POOL: decoded frames
                    # live in HBM; each step ships only skeletons/labels +
                    # sample/frame index arrays and gathers pixels on device
                    # (bilevel.build_pool_step_functions). Host fields stay
                    # numpy so multi-process --parallel sees them replicated.
                    #
                    # HYBRID pool+stream (oversized splits, VERDICT r04 #2):
                    # the iterator may interleave POOL-kind batches (have
                    # sample_idx/frame_idx) with STREAM-kind ones (full
                    # pixels, for rows that did not fit the HBM budget —
                    # data/ntu.hybrid_batches). Chunks stay homogeneous by
                    # kind: pooled chunks run the pool step functions,
                    # streamed chunks the regular ones.
                    pfns = device_cache["pool_fns"]
                    pool = device_cache["pools"][phase]

                    def _dispatch_pool_chunk(state, counts_total, chunk):
                        pooled = "sample_idx" in chunk[0]
                        if len(chunk) == spd and spd > 1:
                            # prefetched (single-process) chunks arrive
                            # device-resident: stack ON DEVICE — np.stack
                            # would pull every staged batch back to host
                            # and re-ship it, undoing the overlap. Host
                            # (multi-process) chunks keep np.stack so they
                            # enter the jit replicated on the global mesh.
                            import jax.numpy as jnp
                            on_device = isinstance(
                                next(iter(chunk[0].values())), jax.Array)
                            stack = jnp.stack if on_device else np.stack
                            stacked = jax.tree_util.tree_map(
                                lambda *xs: stack(list(xs)), *chunk)
                            if trains_weights:
                                etas = np.asarray(
                                    [scheduler.step() for _ in chunk],
                                    np.float32)
                                if pooled:
                                    state, counts = pfns.weight_step_many(
                                        state, pool, stacked, etas)
                                else:
                                    state, counts = fns.weight_step_many(
                                        state, stacked, etas)
                            elif pooled:
                                counts = pfns.eval_step_many(
                                    state, pool, stacked)
                            else:
                                counts = fns.eval_step_many(state, stacked)
                            counts_total = _acc(counts_total, counts)
                        else:
                            # tail (or spd == 1): single-step functions avoid
                            # compiling a tail-length scan program
                            for h in chunk:
                                if trains_weights:
                                    eta = np.float32(scheduler.step())
                                    if pooled:
                                        state, counts = pfns.weight_step(
                                            state, pool, h, eta)
                                    else:
                                        state, counts = fns.weight_step(
                                            state, h, eta)
                                elif pooled:
                                    counts = pfns.eval_step(state, pool, h)
                                else:
                                    counts = fns.eval_step(state, h)
                                counts_total = _acc(counts_total,
                                                           counts)
                        # Pool-kind chunks ("sample_idx" present) move only
                        # KB-scale index arrays to the device — the relay
                        # buffer leak the trim works around (130 GB RSS) only
                        # accumulates on streamed pixel batches, so skip the
                        # per-chunk trim when nothing streamed (VERDICT r04
                        # weak #6: blunt per-chunk overhead in cached modes).
                        if "sample_idx" not in chunk[0]:
                            _release_host_memory()
                        return state, counts_total

                    buf = []
                    for h in device_cache["pool_batches"](phase, epoch):
                        if buf and (len(buf) == spd
                                    or ("sample_idx" in h)
                                    != ("sample_idx" in buf[0])):
                            state, counts_total = _dispatch_pool_chunk(
                                state, counts_total, buf)
                            buf = []
                        buf.append(h)
                    if buf:
                        state, counts_total = _dispatch_pool_chunk(
                            state, counts_total, buf)
                elif spd > 1 and not unrolled and fns.weight_step_many is not None:
                    import itertools
                    import jax.numpy as jnp
                    it = iter(loaders[phase](epoch))
                    while True:
                        chunk = list(itertools.islice(it, spd))
                        if not chunk:
                            break
                        if len(chunk) < spd:
                            # tail chunk: run the already-jitted single-step
                            # functions instead of compiling a second scan
                            # program specialized to the tail length
                            # (identical math/PRNG stream either way)
                            for b in chunk:
                                if arch_steps:
                                    state, counts = fns.arch_step(state, b)
                                elif trains_weights:
                                    state, counts = fns.weight_step(
                                        state, b,
                                        np.float32(scheduler.step()))
                                else:
                                    counts = fns.eval_step(state, b)
                                counts_total = _acc(counts_total,
                                                           counts)
                            break
                        stacked = jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs), *chunk)
                        if arch_steps:
                            state, counts = fns.arch_step_many(state, stacked)
                        elif trains_weights:
                            etas = np.asarray(
                                [scheduler.step() for _ in chunk], np.float32)
                            state, counts = fns.weight_step_many(
                                state, stacked, etas)
                        else:
                            counts = fns.eval_step_many(state, stacked)
                        counts_total = _acc(counts_total, counts)
                        _release_host_memory()
                else:
                    for bi, batch in enumerate(loaders[phase](epoch)):
                        if unrolled:
                            try:
                                tb = next(train_iter)
                            except StopIteration:
                                train_iter = iter(loaders["train"](epoch))
                                tb = next(train_iter)
                            state, counts = fns.arch_step_unrolled(
                                state, batch, tb, np.float32(scheduler.eta))
                        elif arch_steps:
                            state, counts = fns.arch_step(state, batch)
                        elif trains_weights:
                            eta = scheduler.step()
                            state, counts = fns.weight_step(
                                state, batch, np.float32(eta))
                        else:
                            counts = fns.eval_step(state, batch)
                        counts_total = _acc(counts_total, counts)
                        if (bi + 1) % _GC_EVERY_BATCHES == 0:
                            _release_host_memory()

                _release_host_memory()
                epoch_loss, epoch_metric = _finalize_metric(
                    counts_total, metric, f1_type, dataset_sizes[phase])

                if metric == "f1":
                    logger.info("{} Loss: {:.4f}, {} F1: {:.4f}".format(
                        phase, epoch_loss, f1_type, epoch_metric))
                else:
                    logger.info("{} Loss: {:.4f} Acc: {:.4f}".format(
                        phase, epoch_loss, epoch_metric))

                # machine-readable metrics stream (not in the reference)
                if primary:
                    try:
                        import json
                        with open(os.path.join(args.save, "metrics.jsonl"),
                                  "a") as mf:
                            mf.write(json.dumps({
                                "epoch": epoch, "phase": phase,
                                "loss": epoch_loss, "metric": epoch_metric,
                                "metric_name": ("%s_f1" % f1_type
                                                if metric == "f1" else "acc"),
                            }) + "\n")
                    except OSError:
                        pass

                num_params = sum(
                    count_parameters(v) for k, v in state.params.items()
                    if fusion_param_keys(k))
                logger.info("Fusion Model Params: {}".format(num_params))

                genotype = genotype_fn(state) if genotype_fn else None
                if genotype is not None:
                    logger.info(str(genotype))

                if phase == "train" and math.isnan(epoch_loss):
                    logger.info("Nan loss during training, escaping")
                    return best_metric, best_genotype, state

                if phase == "dev" and status == "search":
                    is_better = (epoch_metric > best_metric if task == "mmimdb"
                                 else epoch_metric >= best_metric)
                    if is_better:
                        best_metric = epoch_metric
                        best_genotype = copy.deepcopy(genotype)
                        best_epoch = epoch
                        if primary:
                            ckpt.save_model(
                                os.path.join(args.save, "best",
                                             "best_model.pt"),
                                state.params, state.batch_stats, state.arch)
                            if best_genotype is not None:
                                save_genotype(best_genotype, os.path.join(
                                    args.save, "best", "best_genotype.pkl"))

                if phase == "test":
                    is_better = (epoch_metric > best_test_metric
                                 if task == "mmimdb"
                                 else epoch_metric >= best_test_metric)
                    if is_better:
                        best_test_metric = epoch_metric
                        best_test_genotype = copy.deepcopy(genotype)
                        best_test_epoch = epoch
                        if primary:
                            ckpt.save_model(
                                os.path.join(args.save, "best",
                                             "best_test_model.pt"),
                                state.params, state.batch_stats, state.arch)
                            if best_test_genotype is not None:
                                save_genotype(
                                    best_test_genotype,
                                    os.path.join(args.save, "best",
                                                 "best_test_genotype.pkl"))

            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                logger.info("Profiler trace written to %s", profile_dir)

            if plotter is not None and genotype is not None and primary:
                plotter.plot(genotype,
                             os.path.join(args.save, "architectures",
                                          "epoch_{}".format(epoch)),
                             task=task)

            if metric == "f1":
                logger.info("Current best dev {} F1: {}, at training epoch: {}"
                            .format(f1_type, best_metric, best_epoch))
                logger.info("Current best test {} F1: {}, at training epoch: {}"
                            .format(f1_type, best_test_metric, best_test_epoch))
            else:
                logger.info("Current best dev accuracy: {}, at training epoch: {}"
                            .format(best_metric, best_epoch))
                logger.info("Current best test accuracy: {}, at training epoch: {}"
                            .format(best_test_metric, best_test_epoch))

            if save_resume and primary:
                ckpt.save_state(
                    os.path.join(args.save, "checkpoint.msgpack"), state,
                    extra={"epoch": epoch, "scheduler": scheduler.state(),
                           "best_metric": best_metric,
                           "best_test_metric": best_test_metric,
                           "best_epoch": best_epoch,
                           "best_test_epoch": best_test_epoch})

        # NaN-metric failsafe (train one more epoch; mmimdb.py:191-197)
        if math.isnan(best_metric) and num_epochs == 1 and cont_overloop < 1:
            failsafe = True
            logger.info("Recording a NaN F1, training for one more epoch.")
        else:
            failsafe = False
        cont_overloop += 1

    if math.isnan(best_metric):
        best_metric = 0.0

    if status == "search":
        return best_metric, best_genotype, state
    return best_test_metric, best_test_genotype, state
