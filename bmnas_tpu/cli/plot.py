"""Standalone genotype visualization CLI.

Equivalent of the reference's ``structure_vis.ipynb`` workflow: load a
``best_genotype.pkl`` (ours or the reference's) and render the architecture.

    python -m bmnas_tpu.cli.plot <genotype.pkl> <out_prefix> \
        --task mmimdb --node_steps 1 --node_multiplier 1
"""
from __future__ import annotations

import argparse

from bmnas_tpu.genotype import load_genotype
from bmnas_tpu.visualize import plot_genotype


def main(argv=None):
    p = argparse.ArgumentParser(description="Plot a BM-NAS genotype")
    p.add_argument("genotype", help="path to a genotype .pkl")
    p.add_argument("out", help="output file prefix (renders <out>.pdf)")
    p.add_argument("--task", default="ntu",
                   choices=["mmimdb", "ntu", "ego", "nvgesture"])
    p.add_argument("--num_input_nodes", type=int, default=None,
                   help="default: 6 for mmimdb, 8 otherwise")
    p.add_argument("--num_keep_edges", type=int, default=2)
    p.add_argument("--node_steps", type=int, default=None,
                   help="default: inferred from the genotype")
    p.add_argument("--node_multiplier", type=int, default=None)
    p.add_argument("--fmt", default="pdf")
    args = p.parse_args(argv)

    g = load_genotype(args.genotype)
    num_inputs = args.num_input_nodes or (6 if args.task == "mmimdb" else 8)
    node_steps = args.node_steps or len(g.steps[0].inner_steps)
    node_multiplier = args.node_multiplier or len(g.steps[0].inner_concat)
    plot_genotype(g, args.out, task=args.task, num_input_nodes=num_inputs,
                  num_keep_edges=args.num_keep_edges, node_steps=node_steps,
                  node_multiplier=node_multiplier, fmt=args.fmt)
    print(args.out)


if __name__ == "__main__":
    main()
