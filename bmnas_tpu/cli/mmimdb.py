"""MM-IMDB entry points: bilevel search and found-net retraining/test.

Rebuild of ``main_darts_searchable_mmimdb.py`` and
``main_darts_found_mmimdb.py`` plus the trainer glue in
``models/search/mmimdb_darts_searchable.py:19-55`` and
``main_darts_found_mmimdb.py:96-153``. CLI flags, experiment-dir naming
('search-EXP-<ts>' under final_exp/mmimdb; 'eval-...'/'test-...' nested in
the search/eval dir), and the best/ + architectures/ layout match the
reference.
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
    add_common_flags,
    apply_resume,
    init_train_state,
    make_apply,
    maybe_parallel,
    model_kwargs_from_args,
    run_test_only,
)
from bmnas_tpu.data.mmimdb import MMIMDBDataset
from bmnas_tpu.data.prefetch import device_prefetch
from bmnas_tpu.genotype import load_genotype
from bmnas_tpu.models.mmimdb import (
    MMIMDB_FROZEN_PREFIXES,
    FoundImageTextNet,
    SearchableImageTextNet,
)
from bmnas_tpu.models.supernet import derive_genotype_from_arch, init_arch_params
from bmnas_tpu.parallel.mesh import pad_batch_to_multiple
from bmnas_tpu.search import loop as train_loop
from bmnas_tpu.search.bilevel import (
    TrainState,
    bce_with_logits,
    build_step_functions,
    make_arch_optimizer,
    make_param_labels,
    make_weight_optimizer,
)
from bmnas_tpu.search.scheduler import LRCosineAnnealingScheduler
from bmnas_tpu.utils.experiment import create_exp_dir, setup_logger
from bmnas_tpu.utils.metrics import f1_from_counts, multilabel_counts
from bmnas_tpu.visualize import Plotter

TH_FSCORE = 0.3  # sigmoid threshold (mmimdb_darts_searchable.py:53)


def parse_search_args(argv=None):
    parser = argparse.ArgumentParser(description='BM-NAS Configuration')
    add_common_flags(parser, datadir_default='BM-NAS_dataset/mmimdb/dataset/',
                     batchsize=8, C=192, L=16, num_input_nodes=6,
                     num_outputs=23)
    parser.add_argument('--f1_type', type=str, default='weighted',
                        help="use 'weighted' or 'macro' F1 Score")
    return parser.parse_args(argv)


def parse_found_args(argv=None):
    parser = argparse.ArgumentParser(description='BM-NAS Configuration')
    add_common_flags(parser, datadir_default='BM-NAS_dataset/mmimdb/dataset/',
                     batchsize=8, C=192, L=16, num_input_nodes=6,
                     num_outputs=23)
    parser.add_argument('--f1_type', type=str, default='weighted')
    parser.add_argument('--search_exp_dir', type=str, default=None,
                        help='evaluate which search exp')
    parser.add_argument('--fused_kernels', action='store_true',
                        help='fused Pallas whole-cell kernel for eval forwards (found phase)')
    parser.add_argument('--node_variant', type=str, default='bmnas',
                        choices=['bmnas', 'darts', 'mfas', 'aoa',
                                 'two_head_attn'],
                        help='fusion-node ablation variant (node.py:94-184)')
    parser.add_argument('--eval_exp_dir', type=str, default=None,
                        help='test which eval exp')
    return parser.parse_args(argv)


def counts_fn(logits, labels, mask):
    preds = (jax.nn.sigmoid(logits) > TH_FSCORE).astype(jnp.float32)
    return multilabel_counts(preds, labels, mask)


def _setup_data(args, parallel_ctx):
    batchsize = args.batchsize
    if parallel_ctx is not None:
        batchsize = pad_batch_to_multiple(batchsize, parallel_ctx.num_devices)
    datasets = {
        s: MMIMDBDataset(args.datadir, s, small_dataset=args.small_dataset,
                         num_workers=args.num_workers)
        for s in ("train", "dev", "test")
    }
    dataset_sizes = {s: len(d) for s, d in datasets.items()}
    place = parallel_ctx.shard_batch if parallel_ctx else None

    from bmnas_tpu.cli.common import make_batch_iter

    def loader(stage):
        def make(epoch):
            it = make_batch_iter(
                args, datasets[stage], batchsize, shuffle=True,
                seed=(args.seed * 1000003 + epoch * 131 + _stage_seed(stage)))
            return device_prefetch(it, size=2, place=place,
                                   put_threads=getattr(
                                       args, 'h2d_streams', 1))
        return make

    loaders = {s: loader(s) for s in ("train", "dev", "test")}
    return datasets, dataset_sizes, loaders, batchsize


def _first_batch(datasets, batchsize):
    return next(iter(datasets["train"].batches(batchsize, shuffle=False)))










def _build_device_cache(args, datasets, batchsize, logger, phases,
                        parallel_ctx=None):
    """--device_data_cache: per-split device-resident arrays + the exact
    index order the streaming loader would have used (bit-identical batches).

    Images are cached in the backbone compute dtype — with --bf16_backbone
    that is bf16 (the model casts them there anyway), halving HBM footprint
    (full MM-IMDB train split: 3.8 GB bf16).

    Under --parallel the cache is row-sharded over the data mesh
    (``NamedSharding(mesh, P('data'))``) so each chip holds 1/P of the split;
    splits are zero-padded to a device-count multiple (padded rows are never
    indexed — the gather indices stay < len(dataset))."""
    import ml_dtypes

    from bmnas_tpu.cli.common import build_device_cache

    img_dtype = (ml_dtypes.bfloat16 if getattr(args, "bf16_backbone", False)
                 else np.float32)
    return build_device_cache(
        args, datasets, batchsize, logger, phases, parallel_ctx,
        host_transform=lambda k, a: a.astype(img_dtype) if k == "image" else a)


def run_search(args, logger):
    """Bilevel search (mmimdb_darts_searchable.py:19-55)."""
    parallel_ctx = maybe_parallel(args)
    datasets, dataset_sizes, loaders, batchsize = _setup_data(args, parallel_ctx)
    nbpe = -(-dataset_sizes["train"] // batchsize)  # ceil(N/B) = len(dataloader) semantics (mmimdb_darts_searchable.py:29-30); batchsize is the padded loader batch under --parallel

    from bmnas_tpu.cli.common import backbone_dtype_from_args
    bdt = backbone_dtype_from_args(args)
    model = SearchableImageTextNet(backbone_dtype=bdt,
                                   **model_kwargs_from_args(args))
    arch = init_arch_params(jax.random.PRNGKey(args.seed + 1), args.steps,
                            args.num_input_nodes, args.node_steps)
    batch = _first_batch(datasets, batchsize)
    state, w_tx, arch_tx = init_train_state(model, arch, batch, args,
                                            MMIMDB_FROZEN_PREFIXES)
    if parallel_ctx is not None:
        state = parallel_ctx.replicate(state)

    fns = build_step_functions(make_apply(model), bce_with_logits, counts_fn,
                               w_tx, arch_tx,
                               frozen_prefixes=MMIMDB_FROZEN_PREFIXES)
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
        gather_fns = build_gather_step_functions(
            fns, parallel_ctx.batch_sharding if parallel_ctx else None)

    best_f1, best_genotype, state = train_loop.run_training(
        task="mmimdb", status="search", fns=fns, state=state,
        scheduler=scheduler, loaders=loaders, dataset_sizes=dataset_sizes,
        num_epochs=args.epochs, metric="f1", f1_type=args.f1_type,
        args=args, logger=logger, plotter=Plotter(args),
        genotype_fn=genotype_fn, device_cache=device_cache,
        gather_fns=gather_fns, resume_info=resume_info)
    return best_f1, best_genotype


def run_found(args, logger, genotype, test_model_path=None):
    """Found-net retraining, or test-only when ``test_model_path`` is given
    (main_darts_found_mmimdb.py:96-153)."""
    parallel_ctx = maybe_parallel(args)
    datasets, dataset_sizes, loaders, batchsize = _setup_data(args, parallel_ctx)
    nbpe = -(-dataset_sizes["train"] // batchsize)  # ceil(N/B) = len(dataloader) semantics (mmimdb_darts_searchable.py:29-30); batchsize is the padded loader batch under --parallel

    from bmnas_tpu.cli.common import backbone_dtype_from_args
    bdt = backbone_dtype_from_args(args)
    model = FoundImageTextNet.from_genotype(
        genotype, backbone_dtype=bdt,
        node_variant=getattr(args, 'node_variant', 'bmnas'),
        fused_eval=getattr(args, 'fused_kernels', False),
        **model_kwargs_from_args(args))
    batch = _first_batch(datasets, batchsize)
    # eval-phase optimizer covers ALL params incl. backbones, Adam(eta_max,
    # wd=1e-4 hardcoded) (main_darts_found_mmimdb.py:114-121)
    state, w_tx, _ = init_train_state(model, None, batch, args,
                                      frozen_prefixes=())
    if parallel_ctx is not None:
        state = parallel_ctx.replicate(state)
    fns = build_step_functions(make_apply(model), bce_with_logits, counts_fn,
                               w_tx, None)
    scheduler = LRCosineAnnealingScheduler(args.eta_max, args.eta_min,
                                           args.Ti, args.Tm, nbpe)

    if test_model_path is not None:
        host = run_test_only(fns, state, loaders["test"], test_model_path)
        loss = float(host["loss_sum"]) / dataset_sizes["test"]
        f1 = f1_from_counts(host, average=args.f1_type, zero_division=1.0)
        logger.info(str(genotype))
        logger.info('test Loss: {:.4f}, {} F1: {:.4f}'.format(
            loss, args.f1_type, f1))
        return f1

    state, resume_info = apply_resume(state, scheduler, args, logger)

    device_cache = gather_fns = None
    if getattr(args, "device_data_cache", False):
        from bmnas_tpu.search.bilevel import build_gather_step_functions
        device_cache = _build_device_cache(args, datasets, batchsize, logger,
                                           ("train", "dev", "test"),
                                           parallel_ctx)
        gather_fns = build_gather_step_functions(
            fns, parallel_ctx.batch_sharding if parallel_ctx else None)

    best_f1, _, state = train_loop.run_training(
        task="mmimdb", status="eval", fns=fns, state=state,
        scheduler=scheduler, loaders=loaders, dataset_sizes=dataset_sizes,
        num_epochs=args.epochs, metric="f1", f1_type=args.f1_type,
        args=args, logger=logger, plotter=Plotter(args),
        genotype_fn=lambda st: genotype, device_cache=device_cache,
        gather_fns=gather_fns, resume_info=resume_info)
    return best_f1


def main_search(argv=None):
    args = parse_search_args(argv)
    from bmnas_tpu.cli.common import fail_fast_checks
    fail_fast_checks(args)
    np.random.seed(args.seed)
    args.save = 'search-{}-{}'.format(args.save, time.strftime("%Y%m%d-%H%M%S"))
    args.save = os.path.join('final_exp/mmimdb', args.save)
    args.save = create_exp_dir(args.save)
    logger = setup_logger(args.save)
    logger.info("args = %s", args)
    logger.info("BM-NAS for MM-IMDB Started.")
    start_time = time.time()
    best_f1, best_genotype = run_search(args, logger)
    time_elapsed = time.time() - start_time
    logger.info("*" * 50)
    logger.info('Searching complete in {:.0f}m {:.0f}s'.format(
        time_elapsed // 60, time_elapsed % 60))
    logger.info('Now listing best fusion_net genotype:')
    logger.info(best_genotype)
    return best_f1, best_genotype


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
    model_f1 = run_found(args, logger, genotype, test_model_path if test_only else None)
    time_elapsed = time.time() - start_time
    logger.info("*" * 50)
    logger.info('Total duration {:.0f}m {:.0f}s'.format(
        time_elapsed // 60, time_elapsed % 60))
    logger.info('Final model {} F1: {}'.format(args.f1_type, model_f1))
    return model_f1
