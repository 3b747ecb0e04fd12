"""EgoGesture entry points: bilevel search and found-net retraining/test.

Rebuild of ``main_darts_searchable_ego.py`` / ``main_darts_found_ego.py`` and
``models/search/ego_darts_searchable.py:20-70``. Search splits:
training / validation / testing (models/darts_searchable.py:70-90); found:
train_dev (training+validation) / testing (main_darts_found_ego.py:88-91).
Backbones are frozen in both phases (permanent eval(), params excluded /
requires_grad=False — ego_darts_searchable.py:122-128,165-170,194-198).
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
from bmnas_tpu.data.ego import EgoDataset
from bmnas_tpu.data.prefetch import device_prefetch
from bmnas_tpu.genotype import load_genotype
from bmnas_tpu.models.ego import (
    EGO_FROZEN_PREFIXES,
    FoundRGBDepthNet,
    SearchableRGBDepthNet,
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


def _add_ego_flags(parser, *, search: bool):
    parser.add_argument('--seed', type=int, default=2)
    parser.add_argument('--save', type=str, default='EXP')
    parser.add_argument('--checkpointdir', type=str, default='checkpoints/ego')
    parser.add_argument('--annotation', type=str,
                        default='egogestureall_but_None.json')
    parser.add_argument('--rgb_cp', type=str,
                        default='egogesture_resnext_1.0x_RGB_32_acc_94.01245.pth')
    parser.add_argument('--depth_cp', type=str,
                        default='egogesture_resnext_1.0x_Depth_32_acc_93.61060.pth')
    parser.add_argument('--datadir', type=str, default='EgoGesture')
    parser.add_argument('--small_dataset', action='store_true', default=False)
    parser.add_argument('--parallel', action='store_true', dest='parallel',
                        default=False)
    parser.add_argument('--use_dataparallel', dest='parallel',
                        action='store_true')
    parser.add_argument('--j', dest='num_workers', type=int, default=32)
    parser.add_argument('--num_workers', dest='num_workers', type=int)
    parser.add_argument('--batchsize', type=int, default=96)
    parser.add_argument('--epochs', type=int, default=30)
    parser.add_argument('--drpt', action='store', default=0.0, type=float)
    parser.add_argument('--num_input_nodes', type=int, default=8)
    parser.add_argument('--num_keep_edges', type=int, default=2)
    parser.add_argument('--C', type=int, default=128)
    parser.add_argument('--L', type=int, default=8)
    parser.add_argument('--multiplier', type=int, default=2)
    parser.add_argument('--steps', type=int, default=2)
    parser.add_argument('--node_multiplier', type=int, default=3)
    parser.add_argument('--node_steps', type=int, default=3)
    parser.add_argument('--num_outputs', type=int, default=83)
    parser.add_argument('--arch_learning_rate', type=float, default=3e-4)
    parser.add_argument('--arch_weight_decay', type=float, default=1e-3)
    parser.add_argument('--weight_decay', type=float, default=1e-4)
    parser.add_argument('--eta_max', type=float, default=0.003)
    parser.add_argument('--eta_min', type=float, default=1e-6)
    parser.add_argument('--Ti', type=int, default=5)
    parser.add_argument('--Tm', type=int, default=2)
    parser.add_argument('--sample_size', type=int, default=112)
    parser.add_argument('--sample_duration', type=int, default=32)
    parser.add_argument('--downsample', type=int, default=1)
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
    parser.add_argument('--dense_grouped_convs', action='store_true',
                        default=False,
                        help='execute the ResNeXt cardinality-32 grouped '
                             'convs as block-diagonal DENSE convs: identical '
                             'math, full MXU tiles instead of 32 tiny '
                             'per-group matmuls; the expansion constant-'
                             'folds (backbones are frozen), so steps pay '
                             'nothing (measure: benchmarks/'
                             'grouped_conv_probe.py)')
    parser.add_argument('--device_data_cache', action='store_true',
                        default=False,
                        help='keep the deterministic splits (dev/test: '
                             'center crops only) resident in HBM and gather '
                             'batches on device; the train split always '
                             'streams (random multiscale crop re-randomizes '
                             'every epoch), as does any split over '
                             '--device_cache_budget_gb')
    parser.add_argument('--device_cache_budget_gb', type=float, default=10.0,
                        help='per-split HBM budget for --device_data_cache')
    parser.add_argument('--host_decode_cache_gb', type=float, default=0.0,
                        help='host RAM budget for the decode-once JPEG '
                             'frame cache (data/ego._DecodeCache). The ego '
                             'host path is decode-bound (~75%% of sample '
                             'cost, benchmarks/ego_host_profile.json) and '
                             'gestures share video frames ~4x per epoch, '
                             '100%% across epochs; full-scale working set '
                             '~47 GB. 0 disables.')
    from bmnas_tpu.cli.common import add_data_backend_flags
    add_data_backend_flags(parser)
    if not search:
        parser.add_argument('--search_exp_dir', type=str, default=None)
        parser.add_argument('--fused_kernels', action='store_true',
                            help='fused Pallas whole-cell kernel for eval forwards (found phase)')
        parser.add_argument('--node_variant', type=str, default='bmnas',
                            choices=['bmnas', 'darts', 'mfas', 'aoa',
                                     'two_head_attn'])
        parser.add_argument('--eval_exp_dir', type=str, default=None)


def parse_search_args(argv=None):
    parser = argparse.ArgumentParser(description='Modality optimization.')
    _add_ego_flags(parser, search=True)
    return parser.parse_args(argv)


def parse_found_args(argv=None):
    parser = argparse.ArgumentParser(description='Modality optimization.')
    _add_ego_flags(parser, search=False)
    return parser.parse_args(argv)


def counts_fn(logits, labels, mask):
    return accuracy_counts(logits, labels, mask)


def _setup_data(args, parallel_ctx, stages):
    batchsize = args.batchsize
    if parallel_ctx is not None:
        batchsize = pad_batch_to_multiple(batchsize, parallel_ctx.num_devices)
    annotation = os.path.join(args.checkpointdir, args.annotation)
    datasets = {
        phase: EgoDataset(args.datadir, annotation, subset,
                          small_dataset=args.small_dataset,
                          sample_size=args.sample_size,
                          sample_duration=args.sample_duration,
                          downsample=args.downsample,
                          train_transform=(phase == "train"),
                          num_workers=args.num_workers,
                          host_decode_cache_gb=(
                              # decode-once cache pays off only for splits
                              # re-read every epoch; cached-in-HBM splits
                              # (--device_data_cache dev/test) decode once
                              # anyway
                              args.host_decode_cache_gb
                              if phase == "train" or not args.device_data_cache
                              else 0.0))
        for phase, subset in stages.items()
    }
    dataset_sizes = {p: len(d) for p, d in datasets.items()}
    place = parallel_ctx.shard_batch if parallel_ctx else None

    from bmnas_tpu.cli.common import make_batch_iter

    def loader(phase, shuffle):
        def make(epoch):
            it = make_batch_iter(
                args, datasets[phase], batchsize, shuffle=shuffle,
                seed=(args.seed * 1000003 + epoch * 131 + _stage_seed(phase)),
                seeded_samples=True)
            return device_prefetch(it, size=2, place=place,
                                   put_threads=getattr(
                                       args, 'h2d_streams', 1))
        return make

    loaders = {p: loader(p, shuffle=(p == "train")) for p in stages}
    return datasets, dataset_sizes, loaders, batchsize


def _maybe_load_backbones(state, args, logger):
    from bmnas_tpu.utils.torch_convert import convert_resnext, load_torch_state_dict
    rgb_path = os.path.join(args.checkpointdir, args.rgb_cp)
    depth_path = os.path.join(args.checkpointdir, args.depth_cp)
    if not (os.path.exists(rgb_path) and os.path.exists(depth_path)):
        logger.info("Backbone checkpoints not found under %s - random init",
                    args.checkpointdir)
        return state
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, path in (("rgb_net", rgb_path), ("depth_net", depth_path)):
        sd = load_torch_state_dict(path)
        p, s = convert_resnext(sd, params[name], stats[name])
        params[name] = p
        stats[name] = s
        logger.info("Loading %s checkpoint: %s", name, path)
    return state.replace(params=params, batch_stats=stats)






def _build_device_cache(args, datasets, batchsize, logger, phases,
                        parallel_ctx=None):
    """--device_data_cache for Ego: dev/test splits (deterministic
    center-crop pipeline) live in HBM; the randomly-augmented train split and
    anything over --device_cache_budget_gb keep streaming. Ego evaluates
    dev/test UNSHUFFLED (cli loaders pass shuffle only for train), and the
    gather indices mirror that."""
    from bmnas_tpu.cli.common import build_device_cache
    return build_device_cache(
        args, datasets, batchsize, logger, phases, parallel_ctx,
        cacheable=lambda phase, ds: (
            "random multiscale augmentation re-randomizes every epoch"
            if ds.train_transform else None),
        budget_gb=args.device_cache_budget_gb,
        shuffles=lambda phase: phase == "train")


def run_search(args, logger):
    parallel_ctx = maybe_parallel(args)
    stages = {"train": "training", "dev": "validation", "test": "testing"}
    datasets, dataset_sizes, loaders, batchsize = _setup_data(
        args, parallel_ctx, stages)
    nbpe = -(-dataset_sizes["train"] // batchsize)  # ceil(N/B) = len(dataloader) semantics (mmimdb_darts_searchable.py:29-30); batchsize is the padded loader batch under --parallel

    from bmnas_tpu.cli.common import backbone_dtype_from_args
    bdt = backbone_dtype_from_args(args)
    model = SearchableRGBDepthNet(backbone_dtype=bdt,
                                  dense_grouped=args.dense_grouped_convs,
                                  **model_kwargs_from_args(args))
    arch = init_arch_params(jax.random.PRNGKey(args.seed + 1), args.steps,
                            args.num_input_nodes, args.node_steps)
    batch = next(iter(datasets["train"].batches(batchsize, shuffle=False)))
    state, w_tx, arch_tx = init_train_state(model, arch, batch, args,
                                       EGO_FROZEN_PREFIXES)
    state = _maybe_load_backbones(state, args, logger)
    if parallel_ctx is not None:
        state = parallel_ctx.replicate(state)
    fns = build_step_functions(make_apply(model), cross_entropy, counts_fn,
                               w_tx, arch_tx,
                               frozen_prefixes=EGO_FROZEN_PREFIXES)
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

    best_acc, best_genotype, state = train_loop.run_training(
        task="ego", status="search", fns=fns, state=state,
        scheduler=scheduler, loaders=loaders, dataset_sizes=dataset_sizes,
        num_epochs=args.epochs, metric="acc", f1_type="weighted",
        args=args, logger=logger, plotter=Plotter(args),
        genotype_fn=genotype_fn, device_cache=device_cache,
        gather_fns=gather_fns, resume_info=resume_info)
    return best_acc, best_genotype


def run_found(args, logger, genotype, test_model_path=None):
    parallel_ctx = maybe_parallel(args)
    stages = {"train": "train_dev", "test": "testing"}
    datasets, dataset_sizes, loaders, batchsize = _setup_data(
        args, parallel_ctx, stages)
    nbpe = -(-dataset_sizes["train"] // batchsize)  # ceil(N/B) = len(dataloader) semantics (mmimdb_darts_searchable.py:29-30); batchsize is the padded loader batch under --parallel

    from bmnas_tpu.cli.common import backbone_dtype_from_args
    bdt = backbone_dtype_from_args(args)
    model = FoundRGBDepthNet.from_genotype(
        genotype, backbone_dtype=bdt,
        dense_grouped=getattr(args, 'dense_grouped_convs', False),
        node_variant=getattr(args, 'node_variant', 'bmnas'),
        fused_eval=getattr(args, 'fused_kernels', False),
        **model_kwargs_from_args(args))
    batch = next(iter(datasets["train"].batches(batchsize, shuffle=False)))
    # found ego keeps backbones frozen (requires_grad=False,
    # ego_darts_searchable.py:194-198)
    state, w_tx, _ = init_train_state(model, None, batch, args,
                                 EGO_FROZEN_PREFIXES)
    state = _maybe_load_backbones(state, args, logger)
    if parallel_ctx is not None:
        state = parallel_ctx.replicate(state)
    fns = build_step_functions(make_apply(model), cross_entropy, counts_fn,
                               w_tx, None,
                               frozen_prefixes=EGO_FROZEN_PREFIXES)
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

    best_acc, _, state = train_loop.run_training(
        task="ego", status="eval", fns=fns, state=state,
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
    args.save = os.path.join('final_exp/ego', args.save)
    args.save = create_exp_dir(args.save)
    logger = setup_logger(args.save)
    logger.info("args = %s", args)
    logger.info("BM-NAS for EgoGesture Started.")
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
