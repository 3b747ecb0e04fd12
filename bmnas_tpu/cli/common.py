"""Shared CLI plumbing: argparse groups mirroring the reference flag sets.

The six reference entry scripts carry near-duplicate argparse blocks
(SURVEY.md §5.6); here the shared flags live in one place. Known reference
defect normalized while keeping CLI parity: the MM-IMDB scripts define
``--use_dataparallel`` but downstream reads ``args.parallel``
(main_darts_searchable_mmimdb.py:26 vs mmimdb_darts_searchable.py:48) — we
accept both spellings and make ``args.parallel`` canonical.
"""
from __future__ import annotations

import argparse


def add_common_flags(parser: argparse.ArgumentParser, *, datadir_default: str,
                     batchsize: int, C: int, L: int, num_input_nodes: int,
                     num_outputs: int, eta_max: float = 1e-3,
                     epochs: int = 30, node_steps: int = 1,
                     steps: int = 2) -> None:
    parser.add_argument('--seed', type=int, default=2, help='random seed')
    parser.add_argument('--save', type=str, default='EXP',
                        help='where to save the experiment')
    parser.add_argument('--datadir', type=str, default=datadir_default,
                        help='data directory')
    parser.add_argument('--small_dataset', action='store_true', default=False,
                        help='use mini dataset for debugging')
    parser.add_argument('--num_workers', type=int, default=32,
                        help='dataloader CPUs')
    parser.add_argument('--use_dataparallel', dest='parallel',
                        action='store_true', default=False,
                        help='shard batches over all devices (GSPMD)')
    parser.add_argument('--parallel', dest='parallel', action='store_true',
                        help='alias of --use_dataparallel')
    parser.add_argument('--batchsize', type=int, default=batchsize)
    parser.add_argument('--epochs', type=int, default=epochs)
    parser.add_argument('--drpt', action='store', default=0.1, dest='drpt',
                        type=float, help='dropout')
    parser.add_argument('--num_input_nodes', type=int, default=num_input_nodes,
                        help='total number of modality features')
    parser.add_argument('--num_keep_edges', type=int, default=2,
                        help='cells and steps will have 2 input edges')
    parser.add_argument('--C', type=int, default=C,
                        help='channels for conv layer')
    parser.add_argument('--L', type=int, default=L,
                        help='length after conv and pool')
    parser.add_argument('--multiplier', type=int, default=2,
                        help='cell output concat')
    parser.add_argument('--steps', type=int, default=steps, help='cell steps')
    parser.add_argument('--node_steps', type=int, default=node_steps,
                        help='inner node steps')
    parser.add_argument('--node_multiplier', type=int, default=1,
                        help='inner node output concat')
    parser.add_argument('--num_outputs', type=int, default=num_outputs,
                        help='output dimension')
    parser.add_argument('--arch_learning_rate', type=float, default=3e-4,
                        help='learning rate for arch encoding')
    parser.add_argument('--arch_weight_decay', type=float, default=1e-3,
                        help='weight decay for arch encoding')
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--eta_max', type=float, default=eta_max,
                        help='max learning rate')
    parser.add_argument('--eta_min', type=float, default=1e-6,
                        help='min learning rate')
    parser.add_argument('--Ti', type=int, default=1,
                        help='cosine annealing epochs Ti')
    parser.add_argument('--Tm', type=int, default=2,
                        help='cosine annealing multiplier Tm')
    # TPU-rebuild extras (not in the reference)
    parser.add_argument('--resume', type=str, default=None,
                        help='path to a checkpoint.msgpack to resume from')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='capture a jax.profiler trace into this dir')
    parser.add_argument('--bf16_backbone', action='store_true', default=False,
                        help='run the frozen image backbone in bfloat16 '
                             '(MXU-native; fusion path stays fp32)')
    parser.add_argument('--device_data_cache', action='store_true',
                        default=False,
                        help='upload the whole dataset to HBM once and '
                             'gather batches on device (zero per-epoch '
                             'host->device traffic; needs the splits to fit '
                             'in aggregate HBM - MM-IMDB does, video tasks '
                             'do not; composes with --parallel by row-'
                             'sharding the cache over the data mesh)')
    parser.add_argument('--steps_per_dispatch', type=int, default=1,
                        help='fuse k sequential train/eval steps into one '
                             'device dispatch (lax.scan) - identical math, '
                             'amortizes host dispatch latency')
    parser.add_argument('--h2d_streams', type=int, default=1,
                        help='concurrent host->device transfer streams for '
                             'STREAMED batches (data/prefetch.py pooled '
                             'path; order-preserving). >1 multiplies '
                             'aggregate H2D throughput through the '
                             'single-stream-limited TPU relay '
                             '(benchmarks/h2d_probe.py) - the measured wall '
                             'of full-scale video-search epochs; leave at 1 '
                             'on locally-attached TPUs')
    parser.add_argument('--unrolled', action='store_true', default=False,
                        help='second-order DARTS arch updates (exact '
                             'unrolled differentiation through a virtual '
                             'SGD step; the reference ships this flag but '
                             'only dead first-order code)')
    add_data_backend_flags(parser)


def add_data_backend_flags(parser: argparse.ArgumentParser) -> None:
    parser.add_argument('--data_backend', type=str, default='threads',
                        choices=['threads', 'grain'],
                        help='host input pipeline: in-tree thread-pool '
                             'loaders (default, deterministic order shared '
                             'with --device_data_cache) or grain '
                             '(process-parallel, checkpointable iterators; '
                             'its deterministic shuffle order differs)')
    parser.add_argument('--grain_workers', type=int, default=0,
                        help='grain worker processes (0 = in-process)')


def make_batch_iter(args, dataset, batchsize, *, shuffle, seed,
                    seeded_samples=False):
    """One epoch's host-batch iterator via the selected --data_backend."""
    if getattr(args, "data_backend", "threads") == "grain":
        from bmnas_tpu.data.grain_pipeline import grain_batches
        return grain_batches(dataset, batchsize, shuffle=shuffle, seed=seed,
                             epoch=0,
                             worker_count=getattr(args, "grain_workers", 0),
                             seeded_samples=seeded_samples)
    return dataset.batches(batchsize, shuffle=shuffle, seed=seed)


def _stage_seed(stage: str) -> int:
    """Deterministic per-stage seed term. Python's hash() is randomized per
    PROCESS, which would give every multi-process worker a different shuffle
    order and break the shard_batch contract (identical global batches on
    every host)."""
    import zlib
    return zlib.crc32(stage.encode()) % 97


def backbone_dtype_from_args(args):
    """--bf16_backbone -> jnp.bfloat16 compute dtype for frozen conv stacks."""
    import jax.numpy as jnp
    return jnp.bfloat16 if getattr(args, "bf16_backbone", False) else jnp.float32


def model_kwargs_from_args(args) -> dict:
    return dict(C=args.C, L=args.L, steps=args.steps,
                multiplier=args.multiplier, node_steps=args.node_steps,
                node_multiplier=args.node_multiplier,
                num_input_nodes=args.num_input_nodes,
                num_keep_edges=args.num_keep_edges,
                num_outputs=args.num_outputs, drpt=args.drpt)


# ---------------------------------------------------------------------------
# Shared trainer plumbing (used by all three task CLIs).
# ---------------------------------------------------------------------------

def clamp_cache_budget(budget_gb, logger=None, headroom_gb=None):
    """Cap a data-cache HBM budget to what the device can actually spare.

    RESOURCE_EXHAUSTED postmortems (full-scale NTU search, batch 96):
    --device_cache_budget_gb 12 on a 16 GB chip booked 12 GB of resident
    data (8.43 GB dev cache + 3.57 GB train frame pool) and left <4 GB for
    the batch-96 search step itself — the flag silently allowed double-
    booking HBM the step needs. Reserve ``headroom_gb`` out of the
    device's currently-free HBM and cap the budget there. The 6.5 GB
    default is bisected from full-scale runs, not guessed: the round-4 run
    (8.43 GB booked, ~7 GB free) ran; the first R5HYBRID retry (10.5 GB
    booked, 5.0 GB free — the old 5 GB default) still OOMed at the first
    epoch's metric fetch. Override via BMNAS_CACHE_HEADROOM_GB; the
    preflight sync in search/loop.py turns a wrong setting into a
    minutes-in failure instead of an end-of-epoch one.

    memory_stats() is unavailable through some runtimes (the axon TPU
    relay returns no stats — the original clamp silently trusted the flag
    there and the R5HYBRID 12 GB booking OOMed anyway). Fallback: a static
    HBM-size table keyed on device_kind, debiting 0.5 GB for whatever is
    already resident at cache-build time (params only — measured ~0.3 GB
    for the largest search supernet). CPU test meshes match no table entry
    and keep the pre-clamp trust-the-flag behavior."""
    import os

    import jax
    if budget_gb is None:
        return None
    if headroom_gb is None:
        headroom_gb = float(os.environ.get("BMNAS_CACHE_HEADROOM_GB", 6.5))
    dev = jax.local_devices()[0]
    free_gb = None
    try:
        stats = dev.memory_stats()
        free_gb = (int(stats["bytes_limit"])
                   - int(stats["bytes_in_use"])) / 2**30
    except Exception:
        hbm = os.environ.get("BMNAS_TPU_HBM_GB")
        if hbm is None:
            kind = getattr(dev, "device_kind", "").lower()
            for pat, gb in (("v5 lite", 16.0), ("v5e", 16.0), ("v5p", 95.0),
                            ("v6", 32.0), ("v4", 32.0), ("v3", 16.0),
                            ("v2", 8.0)):
                if pat in kind:
                    hbm = gb
                    break
        if hbm is None:
            return budget_gb
        free_gb = float(hbm) - 0.5  # resident params at cache-build time
    safe = max(0.0, free_gb - headroom_gb)
    if budget_gb > safe and logger is not None:
        logger.info(
            "device cache budget clamped: %.1f -> %.1f GB "
            "(%.1f GB free HBM - %.1f GB step headroom)",
            budget_gb, safe, free_gb, headroom_gb)
    return min(budget_gb, safe)


def build_device_cache(args, datasets, batchsize, logger, phases,
                       parallel_ctx=None, *, host_transform=None,
                       cacheable=None, budget_gb=None,
                       shuffles=lambda phase: True):
    """--device_data_cache core: per-split device-resident arrays + the exact
    index order the streaming loader would have used (bit-identical batches,
    gathered on device by ``build_gather_step_functions``).

    Task CLIs wrap this with their policies:
      host_transform(key, arr) -> arr  — optional per-key cast before upload
        (mmimdb caches images in the backbone compute dtype);
      cacheable(phase, ds) -> str | None — non-None skips the split with the
        returned reason logged (NTU/Ego keep augmented train splits
        streaming: their random temporal crops re-randomize every epoch);
      budget_gb — skip any split whose estimated host footprint exceeds this
        (full-scale NTU test split ~26 GB can never fit 16 GB HBM).

    Under --parallel each kept split is row-sharded over the data mesh
    (``NamedSharding(mesh, P('data'))``); splits are zero-padded to a
    device-count multiple (padded rows are never indexed — gather indices
    stay < len(dataset)). Returns None when no split qualifies.
    """
    import jax
    import numpy as np

    budget_gb = clamp_cache_budget(budget_gb, logger)
    caches = {}
    for phase in phases:
        ds = datasets[phase]
        if cacheable is not None:
            reason = cacheable(phase, ds)
            if reason:
                if logger is not None:
                    logger.info("device cache [%s]: skipped (%s)",
                                phase, reason)
                continue
        if budget_gb is not None:
            probe = ds.load_sample(0, 0)
            per = sum(np.asarray(v).nbytes for v in probe.values()) + 4
            est_gb = per * len(ds) / 2**30
            # the cache is row-sharded over the data mesh: what must fit the
            # budget is the PER-DEVICE footprint, 1/P of the split
            ndev = parallel_ctx.num_devices if parallel_ctx is not None else 1
            per_dev_gb = est_gb / ndev
            if per_dev_gb > budget_gb:
                if logger is not None:
                    logger.info(
                        "device cache [%s]: skipped (~%.1f GB / %d devices = "
                        "%.1f GB per device > --device_cache_budget_gb %.1f)"
                        " - split streams",
                        phase, est_gb, ndev, per_dev_gb, budget_gb)
                continue
        cols = None
        for b in ds.batches(256, shuffle=False, pad_to_full=False):
            n = int(b["mask"].sum())
            if cols is None:
                cols = {k: [] for k in b if k != "mask"}
            for k in cols:
                arr = b[k][:n]
                if host_transform is not None:
                    arr = host_transform(k, arr)
                cols[k].append(arr)
        host = {k: np.concatenate(v) for k, v in cols.items()}
        if parallel_ctx is not None:
            nd = parallel_ctx.num_devices
            n_rows = host[next(iter(host))].shape[0]
            n_pad = (-n_rows) % nd
            if n_pad:
                host = {k: np.concatenate(
                    [v, np.zeros((n_pad,) + v.shape[1:], v.dtype)])
                    for k, v in host.items()}
            caches[phase] = parallel_ctx.shard_batch(host)
        else:
            # --h2d_streams > 1: multi-GB split uploads go as concurrent
            # chunk transfers (single relay stream = ~15-17 MB/s wall;
            # benchmarks/h2d_probe.json) — identical result, tested
            from bmnas_tpu.data.prefetch import device_put_chunked
            streams = max(1, int(getattr(args, "h2d_streams", 1)))
            caches[phase] = {k: device_put_chunked(v, streams=streams)
                             for k, v in host.items()}
        if logger is not None:
            nbytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                         for v in caches[phase].values())
            logger.info("device cache [%s]: %d samples, %.2f GB HBM",
                        phase, len(ds), nbytes / 2**30)
    if not caches:
        return None
    resident_gb = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for c in caches.values() for v in c.values()) / 2**30

    def indices(phase, epoch):
        # mirror the streaming loader: same seed stream, same order
        # (``shuffles``: ego evaluates dev/test unshuffled), final batch
        # padded (index -1 -> zero row + mask 0 in the gather)
        n = len(datasets[phase])
        order = np.arange(n)
        seed = (args.seed * 1000003 + epoch * 131 + _stage_seed(phase))
        if shuffles(phase):
            np.random.RandomState(seed % (2**32)).shuffle(order)
        n_b = -(-n // batchsize)
        padded = np.full(n_b * batchsize, -1, np.int32)
        padded[:n] = order
        return padded.reshape(n_b, batchsize)

    # resident_gb: HBM already booked by these split caches — callers that
    # ALSO build a train frame pool (cli/ntu) must pool against the
    # remaining budget or the two allocations double-book the chip
    return {"caches": caches, "indices": indices,
            "resident_gb": resident_gb}


def fail_fast_checks(args):
    """Validate host-side arguments before any (minutes-long) device
    compilation starts. Found via verification probing: a typo'd --resume
    path used to surface only after model init."""
    import os
    resume = getattr(args, "resume", None)
    if resume and not os.path.exists(resume):
        raise SystemExit(f"--resume: checkpoint not found: {resume}")
    datadir = getattr(args, "datadir", None)
    if datadir and not os.path.isdir(datadir):
        raise SystemExit(f"--datadir: directory not found: {datadir}")
    if getattr(args, "data_backend", "threads") == "grain":
        try:
            import grain.python  # noqa: F401
        except ImportError:
            raise SystemExit(
                "--data_backend grain: the grain package is not installed")


def maybe_parallel(args):
    """--parallel => 1-D data mesh over all devices (GSPMD DataParallel).

    Initializes the multi-host runtime first (no-op unless a coordinator is
    configured via JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID),
    so under a multi-process launch the mesh below spans every host's
    devices — the upgrade past the reference's commented-out DDP
    (ntu_darts_searchable.py:52)."""
    import jax

    from bmnas_tpu.parallel.mesh import make_parallel_context
    from bmnas_tpu.parallel.multihost import ensure_multihost
    ensure_multihost()
    if getattr(args, "parallel", False) and len(jax.devices()) > 1:
        return make_parallel_context()
    return None


def make_apply(model):
    def apply_fn(variables, batch, arch, train, rngs, mutable):
        if mutable:
            return model.apply(variables, batch, arch, train,
                               rngs=rngs, mutable=mutable)
        return model.apply(variables, batch, arch, train)
    return apply_fn


def init_train_state(model, arch, batch, args, frozen_prefixes):
    """Init variables + optimizers + TrainState for a task model.

    Weight optimizer masks 'frozen' prefixes (the per-task central_params
    contract); arch optimizer built only when arch params exist (search)."""
    import jax
    import jax.numpy as jnp

    from bmnas_tpu.search.bilevel import (
        TrainState,
        make_arch_optimizer,
        make_param_labels,
        make_weight_optimizer,
    )

    rng = jax.random.PRNGKey(args.seed)
    k_init, k_drop, k_state = jax.random.split(rng, 3)
    variables = model.init({"params": k_init, "dropout": k_drop},
                           batch, arch, True)
    labels = make_param_labels(variables["params"], frozen_prefixes)
    w_tx = make_weight_optimizer(labels, weight_decay=args.weight_decay)
    arch_tx = (make_arch_optimizer(args.arch_learning_rate,
                                   args.arch_weight_decay)
               if arch is not None else None)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        arch=arch, opt_w=w_tx.init(variables["params"]),
        opt_arch=arch_tx.init(arch) if arch_tx is not None else None,
        rng=k_state, step=jnp.asarray(0, jnp.int32))
    return state, w_tx, arch_tx


def apply_resume(state, scheduler, args, logger):
    """--resume <checkpoint.msgpack>: restore full train state + scheduler.

    Returns ``(state, resume_info)``. ``resume_info`` (None without
    --resume) carries ``start_epoch`` (training continues AFTER the
    checkpointed epoch — same data seeds/LR schedule the uninterrupted run
    would have used) plus the best-so-far metrics and, when the checkpoint
    sits in an experiment dir, the best genotypes reloaded from its
    ``best/`` pickles."""
    if not getattr(args, "resume", None):
        return state, None
    import os

    from bmnas_tpu.genotype import load_genotype
    from bmnas_tpu.utils import checkpoint as ckpt
    state, extra = ckpt.restore_state(args.resume, state)
    scheduler.load_state(extra["scheduler"])
    info = {
        "start_epoch": int(extra["epoch"]) + 1,
        "best_metric": float(extra.get("best_metric", 0.0)),
        "best_test_metric": float(extra.get("best_test_metric", 0.0)),
        "best_epoch": int(extra.get("best_epoch", 0)),
        "best_test_epoch": int(extra.get("best_test_epoch", 0)),
        "best_genotype": None,
        "best_test_genotype": None,
    }
    best_dir = os.path.join(os.path.dirname(os.path.abspath(args.resume)),
                            "best")
    for key, fname in (("best_genotype", "best_genotype.pkl"),
                       ("best_test_genotype", "best_test_genotype.pkl")):
        path = os.path.join(best_dir, fname)
        if os.path.exists(path):
            info[key] = load_genotype(path)
    logger.info("Resumed from %s; continuing at epoch %s", args.resume,
                info["start_epoch"])
    return state, info


def run_test_only(fns, state, loader, snapshot_path):
    """Test-only mode: load a best_*_model.pt snapshot, run one eval pass,
    return the summed counts dict (host numpy)."""
    import jax
    import numpy as np

    from bmnas_tpu.utils import checkpoint as ckpt
    snap = ckpt.load_model(snapshot_path)
    state = state.replace(params=snap["params"],
                          batch_stats=snap["batch_stats"])
    counts_total = None
    for b in loader(0):
        c = fns.eval_step(state, b)
        counts_total = c if counts_total is None else jax.tree_util.tree_map(
            lambda a, x: a + x, counts_total, c)
    return {k: np.asarray(v) for k, v in counts_total.items()}
