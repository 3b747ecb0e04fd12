"""NTU RGB+D entry points: bilevel search and found-net retraining/test.

Rebuild of ``main_darts_searchable_ntu.py`` / ``main_darts_found_ntu.py`` and
``models/search/ntu_darts_searchable.py:22-69`` +
``main_darts_found_ntu.py:90-151``. Reference-default divergences preserved
and documented: found defaults steps=4/epochs=50/eta_max=3e-4/Ti=5 vs search
steps=2/epochs=30/eta_max=1e-3/Ti=1 (SURVEY.md §5.6) — pass matching flags.

Search splits: train_exp / dev / test via the searcher facade
(models/darts_searchable.py:46-64); found: train_val / test
(main_darts_found_ntu.py:90-108). Pretrained backbone checkpoints are
imported through the torch->JAX converter when present.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from bmnas_tpu.cli.common import (
    _stage_seed,
    apply_resume,
    init_train_state,
    make_apply,
    maybe_parallel,
    model_kwargs_from_args,
    run_test_only,
)
from bmnas_tpu.data.ntu import NTUDataset
from bmnas_tpu.data.prefetch import device_prefetch
from bmnas_tpu.genotype import load_genotype
from bmnas_tpu.models.ntu import (
    NTU_SEARCH_FROZEN_PREFIXES,
    FoundSkeletonImageNet,
    SearchableSkeletonImageNet,
)
from bmnas_tpu.models.supernet import derive_genotype_from_arch, init_arch_params
from bmnas_tpu.parallel.mesh import pad_batch_to_multiple
from bmnas_tpu.search import loop as train_loop
from bmnas_tpu.search.bilevel import (
    TrainState,
    build_step_functions,
    cross_entropy,
    make_arch_optimizer,
    make_param_labels,
    make_weight_optimizer,
)
from bmnas_tpu.search.scheduler import LRCosineAnnealingScheduler
from bmnas_tpu.utils.experiment import create_exp_dir, setup_logger
from bmnas_tpu.utils.metrics import accuracy_counts
from bmnas_tpu.visualize import Plotter


def _add_ntu_flags(parser, *, search: bool):
    parser.add_argument('--seed', type=int, default=2)
    parser.add_argument('--checkpointdir', type=str, default='checkpoints/ntu')
    parser.add_argument('--datadir', type=str, default='BM-NAS_dataset/NTU/')
    parser.add_argument('--ske_cp', type=str,
                        default='skeleton_32frames_85.24.checkpoint')
    parser.add_argument('--rgb_cp', type=str,
                        default='rgb_8frames_83.91.checkpoint')
    parser.add_argument('--imagenet_cp', type=str,
                        default='resnet50_imagenet.pth',
                        help='torchvision ResNet-50 state dict used to build '
                             'Visual by 2D->3D center inflation when --rgb_cp '
                             'is absent (imagenet_pretraining.py:26-67)')
    parser.add_argument('--arch_learning_rate', type=float, default=3e-4)
    parser.add_argument('--arch_weight_decay', type=float, default=1e-3)
    parser.add_argument('--weight_decay', type=float, default=3e-4)
    parser.add_argument('--num_input_nodes', type=int, default=8)
    parser.add_argument('--num_keep_edges', type=int, default=2)
    parser.add_argument('--multiplier', type=int, default=2)
    parser.add_argument('--steps', type=int, default=2 if search else 4)
    parser.add_argument('--node_multiplier', type=int, default=2)
    parser.add_argument('--node_steps', type=int, default=2)
    parser.add_argument('--C', type=int, default=128)
    parser.add_argument('--L', type=int, default=8)
    parser.add_argument('--batchsize', type=int, default=96)
    parser.add_argument('--use_dataparallel', dest='parallel',
                        action='store_true', default=False)
    parser.add_argument('--parallel', dest='parallel', action='store_true')
    parser.add_argument('--modality', type=str, default='both')
    parser.add_argument('--small_dataset', action='store_true', default=False)
    parser.add_argument('--num_outputs', type=int, default=60)
    parser.add_argument('--epochs', type=int, default=30 if search else 50)
    parser.add_argument('--eta_max', type=float,
                        default=1e-3 if search else 3e-4)
    parser.add_argument('--eta_min', type=float, default=1e-6)
    parser.add_argument('--Ti', type=int, default=1 if search else 5)
    parser.add_argument('--Tm', type=int, default=2)
    parser.add_argument('--num_workers', type=int, default=16)
    parser.add_argument('--j', dest='num_workers', type=int)
    parser.add_argument('--drpt', action='store', default=0.2, type=float)
    parser.add_argument('--save', type=str, default='EXP')
    parser.add_argument('--vid_dim', action='store', default=256, type=int)
    parser.add_argument('--vid_fr', action='store', default=30, type=int)
    parser.add_argument('--vid_len', action='store', default=(8, 32),
                        type=int, nargs='+')
    parser.add_argument('--resume', type=str, default=None)
    parser.add_argument('--profile_dir', type=str, default=None)
    parser.add_argument('--steps_per_dispatch', type=int, default=1,
                        help='fuse k sequential steps into one device dispatch')
    parser.add_argument('--unrolled', action='store_true', default=False,
                        help='second-order DARTS arch updates (exact '
                             'unrolled differentiation)')
    parser.add_argument('--bf16_backbone', action='store_true', default=False,
                        help='run the frozen 3D conv backbones in bfloat16 '
                             '(MXU-native; fusion path stays fp32)')
    parser.add_argument('--remat', action='store_true', default=False,
                        help='rematerialize backbone activations in the '
                             'backward pass (jax.checkpoint) - for found-'
                             'phase training at large batch on one chip')
    parser.add_argument('--device_data_cache', action='store_true',
                        default=False,
                        help='keep the deterministic splits (dev during '
                             'search, test during found retraining) resident '
                             'in HBM as raw uint8 pixels and gather batches '
                             'on device - removes their host->device '
                             'streaming entirely (the dominant cost through '
                             'a bandwidth-limited link). The augmented train '
                             'split always streams (its random temporal crop '
                             're-randomizes every epoch); splits over '
                             '--device_cache_budget_gb stream too')
    parser.add_argument('--device_cache_budget_gb', type=float, default=10.0,
                        help='per-split HBM budget for --device_data_cache')
    from bmnas_tpu.cli.common import add_data_backend_flags
    add_data_backend_flags(parser)
    if not search:
        parser.add_argument('--search_exp_dir', type=str, default=None)
        parser.add_argument('--fused_kernels', action='store_true',
                            help='fused Pallas whole-cell kernel for eval forwards (found phase)')
        parser.add_argument('--node_variant', type=str, default='bmnas',
                            choices=['bmnas', 'darts', 'mfas', 'aoa',
                                     'two_head_attn'])
        parser.add_argument('--task_variant', type=str, default='bmnas',
                            choices=['bmnas', 'simple_concat',
                                     'ensemble_concat', 'ensemble',
                                     'simple_concat_attn'],
                            help='whole-net ablation baselines '
                                 '(ntu_darts_searchable.py:275-680; dead '
                                 'code in the reference, reachable here)')
        parser.add_argument('--eval_exp_dir', type=str, default=None)
        parser.add_argument('--momentum', type=float, default=0.9)


def parse_search_args(argv=None):
    parser = argparse.ArgumentParser(description='Modality optimization.')
    _add_ntu_flags(parser, search=True)
    return parser.parse_args(argv)


def parse_found_args(argv=None):
    parser = argparse.ArgumentParser(description='Modality optimization.')
    _add_ntu_flags(parser, search=False)
    return parser.parse_args(argv)


def counts_fn(logits, labels, mask):
    return accuracy_counts(logits, labels, mask)


def _setup_data(args, parallel_ctx, stages):
    batchsize = args.batchsize
    if parallel_ctx is not None:
        batchsize = pad_batch_to_multiple(batchsize, parallel_ctx.num_devices)
    vid_len = tuple(args.vid_len)
    datasets = {
        phase: NTUDataset(args.datadir, stage,
                          small_dataset=args.small_dataset, vid_len=vid_len,
                          vid_dim=args.vid_dim, num_workers=args.num_workers,
                          train_transform=(phase == "train"))
        for phase, stage in stages.items()
    }
    dataset_sizes = {p: len(d) for p, d in datasets.items()}
    place = parallel_ctx.shard_batch if parallel_ctx else None

    from bmnas_tpu.cli.common import make_batch_iter

    def loader(phase):
        def make(epoch):
            it = make_batch_iter(
                args, datasets[phase], batchsize, shuffle=True,
                seed=(args.seed * 1000003 + epoch * 131 + _stage_seed(phase)),
                seeded_samples=True)
            return device_prefetch(it, size=2, place=place,
                                   put_threads=getattr(
                                       args, 'h2d_streams', 1))
        return make

    return datasets, dataset_sizes, {p: loader(p) for p in stages}, batchsize


def _build_device_cache(args, datasets, batchsize, logger, phases,
                        parallel_ctx=None):
    """--device_data_cache for NTU: the deterministic splits (dev / test —
    their host pipeline is pure frame selection + interpolation, no random
    augmentation) live in HBM as raw uint8 pixels; batches are gathered on
    device and normalized there, so their per-epoch host->device traffic is
    zero. The train split streams (aug_crop re-randomizes every epoch), and
    anything over --device_cache_budget_gb streams too (the full-scale NTU
    test split ~26 GB can never fit). Reference workload being scaled:
    main_darts_searchable_ntu.py:38-59."""
    from bmnas_tpu.cli.common import build_device_cache, clamp_cache_budget
    # clamp ONCE and share: the split caches and the frame pool below must
    # split the same HBM-feasible budget (clamp_cache_budget reserves step
    # headroom — a 12 GB budget on a 16 GB chip OOMed the batch-96 step)
    budget = clamp_cache_budget(args.device_cache_budget_gb, logger)
    cache = build_device_cache(
        args, datasets, batchsize, logger, phases, parallel_ctx,
        cacheable=lambda phase, ds: (
            "augmented split: cached as a frame POOL instead (see below)"
            if ds.train_transform else None),
        budget_gb=budget)
    # the frame pool must fit in what the split caches left of the budget
    # (per device) — two independent full-budget allocations would
    # double-book the chip (e.g. full-scale: 8.9 GB dev cache + a
    # full-budget train pool > 16 GB HBM)
    used_gb = (cache or {}).get("resident_gb", 0.0)
    ndev_ = parallel_ctx.num_devices if parallel_ctx is not None else 1
    pool_budget = max(0.0, (budget or 0.0) - used_gb / ndev_)
    pool_info = _build_train_frame_pool(args, datasets, batchsize, logger,
                                        parallel_ctx, pool_budget)
    if pool_info is not None:
        if cache is None:
            cache = {"caches": {}, "indices": None}
        cache.update(pool_info)
    return cache


def _build_train_frame_pool(args, datasets, batchsize, logger, parallel_ctx,
                            budget_gb=None):
    """--device_data_cache for the AUGMENTED train split: the random temporal
    crop re-randomizes every epoch, but its video half is pure frame
    selection (data/ntu.aug_crop_select), so the decoded frames live in HBM
    once — (N, F_pool, H, W, 3), row-sharded over the data mesh — and each
    epoch ships only per-sample frame-index arrays plus the small skeletons.
    Kills the dominant H2D stream of a full-scale NTU search (4.5 GB/epoch
    of uint8 video at reference scale, main_darts_searchable_ntu.py:38-59);
    splits whose per-device pool exceeds --device_cache_budget_gb keep
    streaming (the 17.9 GB full-scale pool needs the multi-chip mesh)."""
    ds = datasets.get("train")
    if ds is None or not ds.train_transform:
        return None
    try:
        probe = ds.pool_frame_count()
    except Exception as e:
        logger.info("device frame pool [train]: skipped (%s)", e)
        return None
    if probe is None:
        logger.info("device frame pool [train]: skipped (non-4D decode)")
        return None
    from bmnas_tpu.data.ntu import load_video
    sample = load_video(ds.rgb_list[0])
    itemsize = 4 if (sample.dtype != np.uint8 or ds.host_image_norm) else 1
    bytes_per_sample = int(np.prod(sample.shape)) * itemsize
    est_gb = (bytes_per_sample * len(ds)) / 2**30
    ndev = parallel_ctx.num_devices if parallel_ctx is not None else 1
    # HYBRID pool+stream (VERDICT r04 #2): when the full split exceeds the
    # budget, pool as many rows as fit (the first pool_n dataset rows —
    # sample_idx IS the pool row) and stream the remainder each epoch
    # (data/ntu.hybrid_batches). At full NTU scale (11,376 x 8 x 256^2
    # uint8 ~ 16.7 GB vs one 16 GB chip) a 12 GB budget pools ~8.2k rows
    # and cuts per-epoch H2D from 4.5 GB to ~1.3 GB. The reference gets the
    # same effect by spreading batch-96 across ~128 GB of aggregate GPU
    # memory (README.md:66).
    budget = (budget_gb if budget_gb is not None
              else args.device_cache_budget_gb)
    capacity = int(budget * 2**30 * ndev // max(1, bytes_per_sample))
    pool_n = min(len(ds), capacity)
    # partial pooling below ~2 batches is churn for no H2D win; a split
    # that fits WHOLE always pools, however small (tiny corpora/tests)
    if pool_n < len(ds) and pool_n < 2 * batchsize:
        logger.info(
            "device frame pool [train]: skipped (remaining budget %.1f GB x "
            "%d devices fits only %d of %d samples; < 2 batches) - split "
            "streams", budget, ndev, pool_n, len(ds))
        return None
    try:
        pool_host = ds.build_frame_pool(limit=pool_n)
    except ValueError as e:
        logger.info("device frame pool [train]: skipped (%s)", e)
        return None
    if pool_n < len(ds):
        logger.info(
            "device frame pool [train]: HYBRID - pooling %d of %d samples "
            "(~%.1f of ~%.1f GB, remaining budget %.1f GB x %d devices); "
            "the remaining %d stream each epoch", pool_n, len(ds),
            bytes_per_sample * pool_n / 2**30, est_gb,
            budget, ndev, len(ds) - pool_n)
    if parallel_ctx is not None:
        n_pad = (-pool_host.shape[0]) % ndev
        if n_pad:
            pool_host = np.concatenate(
                [pool_host, np.zeros((n_pad,) + pool_host.shape[1:],
                                     pool_host.dtype)])
        pool_dev = parallel_ctx.shard_batch({"image": pool_host})["image"]
    else:
        from bmnas_tpu.data.prefetch import device_put_chunked
        pool_dev = device_put_chunked(
            pool_host, streams=max(1, int(getattr(args, "h2d_streams", 1))))
    logger.info("device frame pool [train]: %d of %d samples x %d frames, "
                "%.2f GB HBM (%.2f GB per device)", pool_n, len(ds),
                pool_host.shape[1], pool_host.nbytes / 2**30,
                pool_host.nbytes / 2**30 / ndev)

    spd = max(1, int(getattr(args, "steps_per_dispatch", 1)))

    def pool_batches(phase, epoch):
        # identical order/seed stream to the streaming threads loader;
        # hybrid_batches == pool_batches when pool_n covers the split
        seed = (args.seed * 1000003 + epoch * 131 + _stage_seed(phase))
        it = datasets[phase].hybrid_batches(batchsize, shuffle=True,
                                            seed=seed, pool_n=pool_n,
                                            spd=spd)
        if parallel_ctx is None:
            # background host-assembly + H2D staging (single-process only:
            # under multi-process --parallel the host batches must stay
            # numpy/replicated — see loop.py's pool-path note). Without
            # this the hybrid path consumed the generator RAW, so every
            # streamed chunk serialized host decode -> 1.2 GB H2D ->
            # compute; measured 19.9 min/epoch at full NTU scale where the
            # link-bound floor is ~7 min (ntu_fullscale_search.json).
            return device_prefetch(
                it, size=2,
                put_threads=getattr(args, 'h2d_streams', 1))
        return it

    return {"pools": {"train": pool_dev}, "pool_batches": pool_batches}


def _maybe_load_backbones(state, args, logger):
    """Import pretrained torch checkpoints when available
    (ntu_darts_searchable.py:32-36). When the NTU rgb checkpoint is absent
    but a torchvision ResNet-50 ImageNet state dict is, the Visual backbone
    is built by 2D->3D center inflation — the reference's ImageNet
    initialization path (imagenet_pretraining.py:26-67). Random init only
    as a last resort."""
    from bmnas_tpu.utils.torch_convert import (
        convert_hcn,
        convert_resnet50_inflated,
        load_ntu_backbones,
        load_torch_state_dict,
    )
    ske_path = os.path.join(args.checkpointdir, args.ske_cp)
    rgb_path = os.path.join(args.checkpointdir, args.rgb_cp)
    imagenet_path = os.path.join(args.checkpointdir,
                                 getattr(args, 'imagenet_cp',
                                         'resnet50_imagenet.pth'))
    if os.path.exists(ske_path) and os.path.exists(rgb_path):
        params, stats = load_ntu_backbones(state.params, state.batch_stats,
                                           ske_path, rgb_path)
        logger.info("Loaded backbone checkpoints: %s, %s", ske_path, rgb_path)
        return state.replace(params=params, batch_stats=stats)
    if os.path.exists(ske_path) and os.path.exists(imagenet_path):
        params = dict(state.params)
        stats = dict(state.batch_stats)
        params["skenet"] = convert_hcn(load_torch_state_dict(ske_path),
                                       params["skenet"])
        params["rgbnet"], stats["rgbnet"] = convert_resnet50_inflated(
            load_torch_state_dict(imagenet_path),
            params["rgbnet"], stats["rgbnet"])
        logger.info("Loaded skeleton checkpoint %s; Visual built from "
                    "ImageNet ResNet-50 by center inflation (%s)",
                    ske_path, imagenet_path)
        return state.replace(params=params, batch_stats=stats)
    logger.info("Backbone checkpoints not found under %s - using random init",
                args.checkpointdir)
    return state






def run_search(args, logger):
    parallel_ctx = maybe_parallel(args)
    stages = {"train": "train_exp", "dev": "dev", "test": "test"}
    datasets, dataset_sizes, loaders, batchsize = _setup_data(
        args, parallel_ctx, stages)
    nbpe = -(-dataset_sizes["train"] // batchsize)  # ceil(N/B) = len(dataloader) semantics (mmimdb_darts_searchable.py:29-30); batchsize is the padded loader batch under --parallel

    from bmnas_tpu.cli.common import backbone_dtype_from_args
    bdt = backbone_dtype_from_args(args)
    model = SearchableSkeletonImageNet(backbone_dtype=bdt,
                                       remat=getattr(args, 'remat', False),
                                       **model_kwargs_from_args(args))
    arch = init_arch_params(jax.random.PRNGKey(args.seed + 1), args.steps,
                            args.num_input_nodes, args.node_steps)
    batch = next(iter(datasets["train"].batches(batchsize, shuffle=False)))
    state, w_tx, arch_tx = init_train_state(model, arch, batch, args,
                                       NTU_SEARCH_FROZEN_PREFIXES)
    state = _maybe_load_backbones(state, args, logger)
    if parallel_ctx is not None:
        state = parallel_ctx.replicate(state)
    fns = build_step_functions(make_apply(model), cross_entropy, counts_fn,
                               w_tx, arch_tx,
                               frozen_prefixes=NTU_SEARCH_FROZEN_PREFIXES)
    scheduler = LRCosineAnnealingScheduler(args.eta_max, args.eta_min,
                                           args.Ti, args.Tm, nbpe)

    def genotype_fn(st):
        return derive_genotype_from_arch(
            st.arch, args.steps, args.multiplier, args.num_input_nodes,
            args.node_steps, args.node_multiplier)

    state, resume_info = apply_resume(state, scheduler, args, logger)

    device_cache = gather_fns = None
    if getattr(args, "device_data_cache", False):
        from bmnas_tpu.search.bilevel import build_gather_step_functions
        device_cache = _build_device_cache(args, datasets, batchsize, logger,
                                           ("train", "dev"), parallel_ctx)
        if device_cache is not None:
            gather_fns = build_gather_step_functions(
                fns, parallel_ctx.batch_sharding if parallel_ctx else None)
            if "pools" in device_cache:
                from bmnas_tpu.search.bilevel import build_pool_step_functions
                device_cache["pool_fns"] = build_pool_step_functions(
                    fns, "image",
                    parallel_ctx.batch_sharding if parallel_ctx else None)

    best_acc, best_genotype, state = train_loop.run_training(
        task="ntu", status="search", fns=fns, state=state,
        scheduler=scheduler, loaders=loaders, dataset_sizes=dataset_sizes,
        num_epochs=args.epochs, metric="acc", f1_type="weighted",
        args=args, logger=logger, plotter=Plotter(args),
        genotype_fn=genotype_fn, device_cache=device_cache,
        gather_fns=gather_fns, resume_info=resume_info)
    return best_acc, best_genotype


def run_found(args, logger, genotype, test_model_path=None):
    parallel_ctx = maybe_parallel(args)
    stages = {"train": "train_val", "test": "test"}
    datasets, dataset_sizes, loaders, batchsize = _setup_data(
        args, parallel_ctx, stages)
    nbpe = -(-dataset_sizes["train"] // batchsize)  # ceil(N/B) = len(dataloader) semantics (mmimdb_darts_searchable.py:29-30); batchsize is the padded loader batch under --parallel

    from bmnas_tpu.cli.common import backbone_dtype_from_args
    bdt = backbone_dtype_from_args(args)
    task_variant = getattr(args, 'task_variant', 'bmnas')
    if task_variant != 'bmnas':
        from bmnas_tpu.models.ntu import NTUAblationNet
        model = NTUAblationNet(C=args.C, L=args.L,
                               num_outputs=args.num_outputs, drpt=args.drpt,
                               variant=task_variant, backbone_dtype=bdt,
                               remat=getattr(args, 'remat', False))
        genotype = None  # the ablation nets ignore it (self._genotype=None)
    else:
        model = FoundSkeletonImageNet.from_genotype(
            genotype, backbone_dtype=bdt, remat=getattr(args, 'remat', False),
            node_variant=getattr(args, 'node_variant', 'bmnas'),
            fused_eval=getattr(args, 'fused_kernels', False),
            **model_kwargs_from_args(args))
    batch = next(iter(datasets["train"].batches(batchsize, shuffle=False)))
    # eval optimizer covers the whole net (main_darts_found_ntu.py:122-139)
    state, w_tx, _ = init_train_state(model, None, batch, args, frozen_prefixes=())
    state = _maybe_load_backbones(state, args, logger)
    if parallel_ctx is not None:
        state = parallel_ctx.replicate(state)
    fns = build_step_functions(make_apply(model), cross_entropy, counts_fn,
                               w_tx, None)
    scheduler = LRCosineAnnealingScheduler(args.eta_max, args.eta_min,
                                           args.Ti, args.Tm, nbpe)

    if test_model_path is not None:
        host = run_test_only(fns, state, loaders["test"], test_model_path)
        acc = float(host["correct"]) / dataset_sizes["test"]
        loss = float(host["loss_sum"]) / dataset_sizes["test"]
        logger.info(str(genotype))
        logger.info('test Loss: {:.4f} Acc: {:.4f}'.format(loss, acc))
        return acc

    state, resume_info = apply_resume(state, scheduler, args, logger)

    device_cache = gather_fns = None
    if getattr(args, "device_data_cache", False):
        from bmnas_tpu.search.bilevel import build_gather_step_functions
        device_cache = _build_device_cache(args, datasets, batchsize, logger,
                                           ("train", "test"), parallel_ctx)
        if device_cache is not None:
            gather_fns = build_gather_step_functions(
                fns, parallel_ctx.batch_sharding if parallel_ctx else None)
            if "pools" in device_cache:
                from bmnas_tpu.search.bilevel import build_pool_step_functions
                device_cache["pool_fns"] = build_pool_step_functions(
                    fns, "image",
                    parallel_ctx.batch_sharding if parallel_ctx else None)

    best_acc, _, state = train_loop.run_training(
        task="ntu", status="eval", fns=fns, state=state,
        scheduler=scheduler, loaders=loaders, dataset_sizes=dataset_sizes,
        num_epochs=args.epochs, metric="acc", f1_type="weighted",
        args=args, logger=logger, plotter=Plotter(args),
        genotype_fn=lambda st: genotype, device_cache=device_cache,
        gather_fns=gather_fns, resume_info=resume_info)
    return best_acc


def main_search(argv=None):
    args = parse_search_args(argv)
    from bmnas_tpu.cli.common import fail_fast_checks
    fail_fast_checks(args)
    np.random.seed(args.seed)
    args.save = 'search-{}-{}'.format(args.save, time.strftime("%Y%m%d-%H%M%S"))
    args.save = os.path.join('final_exp/ntu', args.save)
    args.save = create_exp_dir(args.save)
    logger = setup_logger(args.save)
    logger.info("args = %s", args)
    logger.info("BM-NAS for NTU Started.")
    start_time = time.time()
    best_acc, best_genotype = run_search(args, logger)
    time_elapsed = time.time() - start_time
    logger.info("*" * 50)
    logger.info('Searching complete in {:.0f}m {:.0f}s'.format(
        time_elapsed // 60, time_elapsed % 60))
    logger.info('Now listing best fusion_net genotype:')
    logger.info(best_genotype)
    return best_acc, best_genotype


def main_found(argv=None):
    args = parse_found_args(argv)
    test_only = False
    test_model_path = None
    if args.eval_exp_dir is not None:
        test_only = True
        args.save = 'test-{}-{}'.format(args.save, time.strftime("%Y%m%d-%H%M%S"))
        args.save = os.path.join(args.eval_exp_dir, args.save)
        test_model_path = os.path.join(args.eval_exp_dir, 'best',
                                       'best_test_model.pt')
        best_genotype_path = os.path.join(args.eval_exp_dir, 'best',
                                          'best_test_genotype.pkl')
    elif args.search_exp_dir is not None:
        best_genotype_path = os.path.join(args.search_exp_dir, 'best',
                                          'best_genotype.pkl')
        args.save = 'eval-{}-{}'.format(args.save, time.strftime("%Y%m%d-%H%M%S"))
        args.save = os.path.join(args.search_exp_dir, args.save)
    else:
        raise SystemExit("one of --search_exp_dir / --eval_exp_dir is required")

    from bmnas_tpu.cli.common import fail_fast_checks
    fail_fast_checks(args)
    np.random.seed(args.seed)
    args.save = create_exp_dir(args.save)
    logger = setup_logger(args.save)
    logger.info("args = %s", args)

    genotype = load_genotype(best_genotype_path)
    start_time = time.time()
    acc = run_found(args, logger, genotype,
                    test_model_path if test_only else None)
    time_elapsed = time.time() - start_time
    logger.info("*" * 50)
    logger.info('Total duration {:.0f}m {:.0f}s'.format(
        time_elapsed // 60, time_elapsed % 60))
    logger.info('Final model Acc: {}'.format(acc))
    return acc
