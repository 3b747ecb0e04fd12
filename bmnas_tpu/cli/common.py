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


def model_kwargs_from_args(args) -> dict:
    return dict(C=args.C, L=args.L, steps=args.steps,
                multiplier=args.multiplier, node_steps=args.node_steps,
                node_multiplier=args.node_multiplier,
                num_input_nodes=args.num_input_nodes,
                num_keep_edges=args.num_keep_edges,
                num_outputs=args.num_outputs, drpt=args.drpt)
