"""Compiled ("found") fusion network built from a discrete Genotype.

Rebuild of ``models/search/darts/model.py`` (Found_FusionCell /
Found_Random_FusionCell :16-160 — byte-identical twins in the reference;
one class here — and Found_FusionNetwork :162-190) and ``node.py``
(Found_NodeCell :8-76, Found_FusionNode :78-91).

The genotype is a *static* Python value: the module graph is compiled
per-genotype, so XLA sees a fixed DAG with no interpretation overhead —
changing the genotype triggers a fresh jit specialization (SURVEY.md §7).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bmnas_tpu import genotype as G
from bmnas_tpu.ops.fusion_ops import STEP_OPS, EdgeOp
from bmnas_tpu.ops.layers import BatchNorm, LayerNorm2D


def _freeze(genotype: G.Genotype) -> Tuple:
    """Convert a genotype to nested tuples (hashable, safe as a module attr)."""
    steps = tuple(
        (tuple(map(tuple, s.inner_edges)), tuple(s.inner_steps), tuple(s.inner_concat))
        for s in genotype.steps
    )
    return (tuple(map(tuple, genotype.edges)), steps, tuple(genotype.concat))


class FoundNodeCell(nn.Module):
    """Fixed inner DAG from a StepGenotype (node.py:8-76).

    With ``fused_eval=True`` an eval-mode forward executes as ONE Pallas
    kernel (ops/kernels/node_mixed.found_node_cell_multi_fused): all
    node_steps chained inner ops, the node_multiplier out_conv, the residual
    and the output LayerNorm in a single VMEM residency, BNs folded. Covers
    every reference found config (mmimdb node_steps=1, NTU 2/multiplier 2,
    ego 3). Training and init always take the composite path (same
    parameters either way). When the genotype falls outside the fusable set
    (an inner op or edge kind the kernel doesn't host), a log line says so
    instead of silently no-oping."""
    inner_edges: Tuple[Tuple[str, int], ...]
    inner_steps: Tuple[str, ...]
    node_steps: int
    node_multiplier: int
    C: int
    L: int
    drpt: float
    fused_eval: bool = False

    def _fuse_blocker(self) -> str:
        """'' when the genotype shape is kernel-hostable, else the reason."""
        from bmnas_tpu.ops.kernels.node_mixed import FUSABLE_STEP_OPS
        bad_ops = [o for o in self.inner_steps if o not in FUSABLE_STEP_OPS]
        if bad_ops:
            return f"inner op(s) {bad_ops} not in the fusable set"
        bad_edges = [k for k, _ in self.inner_edges
                     if k not in ("skip", "none")]
        if bad_edges:
            return f"inner edge op(s) {bad_edges} not in (skip, none)"
        return ""

    def _can_fuse(self, train: bool) -> bool:
        if not (self.fused_eval and not train and not self.is_initializing()):
            return False
        blocker = self._fuse_blocker()
        if blocker:
            import logging
            logging.getLogger("bmnas_tpu").info(
                "--fused_kernels: composite fallback for %s (%s)",
                self.name, blocker)
            return False
        return True

    def _fused_forward(self, x, y):
        import jax

        from bmnas_tpu.ops.kernels.node_mixed import (
            found_cell_params_from_flax,
            found_cell_steps_cfg,
            found_node_cell_multi_fused,
        )

        p = found_cell_params_from_flax(self.variables, self.inner_steps,
                                        self.C, self.L, self.node_multiplier)
        cfg = found_cell_steps_cfg(self.inner_edges, self.inner_steps)
        interpret = jax.default_backend() != "tpu"
        # tile_b=32 measured best on v5e at reference shapes (grid overhead
        # amortizes; see ops/kernels/node_mixed.py measurement notes)
        return found_node_cell_multi_fused(x, y, p, cfg,
                                           multiplier=self.node_multiplier,
                                           interpret=interpret, tile_b=32)

    @nn.compact
    def __call__(self, x, y, train: bool):
        if self._can_fuse(train):
            return self._fused_forward(x, y)
        states = [x, y]
        for i in range(self.node_steps):
            name_x, idx_x = self.inner_edges[2 * i]
            name_y, idx_y = self.inner_edges[2 * i + 1]
            input_x = EdgeOp(kind=name_x, C=self.C, drpt=self.drpt)(
                states[idx_x], train
            )
            input_y = EdgeOp(kind=name_y, C=self.C, drpt=self.drpt)(
                states[idx_y], train
            )
            s = STEP_OPS[self.inner_steps[i]](self.C, self.L, self.drpt)(
                input_x, input_y, train
            )
            states.append(s)

        out = jnp.concatenate(states[-self.node_multiplier :], axis=-1)
        if self.node_multiplier != 1:
            out = nn.Dense(self.C)(out)
            out = BatchNorm()(out, train)
            out = nn.relu(out)
            out = nn.Dropout(self.drpt, deterministic=not train)(out)
        # "skip v4" residual + LayerNorm (node.py:73-74).
        out = out + x
        out = LayerNorm2D()(out)
        return out


# ---------------------------------------------------------------------------
# Ablation fusion-node variants (node.py:94-184). The reference selects these
# only by editing source comments (model.py:52-59); here they are a proper
# option: FoundFusionNetwork(..., node_variant=...).
# ---------------------------------------------------------------------------

class DartsFusionNode(nn.Module):
    """x + y (node.py:94-105)."""

    @nn.compact
    def __call__(self, x, y, train: bool):
        return x + y


class MfasFusionNode(nn.Module):
    """cat -> 1x1 conv -> BN -> ReLU -> dropout (node.py:107-129)."""
    C: int
    drpt: float

    @nn.compact
    def __call__(self, x, y, train: bool):
        out = jnp.concatenate([x, y], axis=-1)
        out = nn.Dense(self.C)(out)
        out = BatchNorm()(out, train)
        out = nn.relu(out)
        out = nn.Dropout(self.drpt, deterministic=not train)(out)
        return out


class AoaFusionNode(nn.Module):
    """attention then GLU over (x, attn_out) (node.py:132-151)."""
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, x, y, train: bool):
        from bmnas_tpu.ops.fusion_ops import LinearGLU, ScaledDotAttn
        out1 = ScaledDotAttn(C=self.C, L=self.L)(x, y, train)
        return LinearGLU(C=self.C, drpt=self.drpt)(x, out1, train)


class TwoHeadAttnFusionNode(nn.Module):
    """two attention heads, concat, 1x1 conv (node.py:154-184)."""
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, x, y, train: bool):
        from bmnas_tpu.ops.fusion_ops import ScaledDotAttn
        out1 = ScaledDotAttn(C=self.C, L=self.L)(x, y, train)
        out2 = ScaledDotAttn(C=self.C, L=self.L)(x, y, train)
        out = jnp.concatenate([out1, out2], axis=-1)
        out = nn.Dense(self.C)(out)
        out = BatchNorm()(out, train)
        out = nn.relu(out)
        out = nn.Dropout(self.drpt, deterministic=not train)(out)
        return out


NODE_VARIANTS = ("bmnas", "darts", "mfas", "aoa", "two_head_attn")


class FoundFusionCell(nn.Module):
    """Fixed outer cell compiled from genotype.edges (model.py:16-89)."""
    edges: Tuple[Tuple[str, int], ...]
    steps_genes: Tuple
    concat: Tuple[int, ...]
    node_steps: int
    node_multiplier: int
    C: int
    L: int
    drpt: float
    node_variant: str = "bmnas"
    fused_eval: bool = False

    def _make_step_node(self, i: int):
        if self.node_variant == "bmnas":
            inner_edges, inner_steps, _ = self.steps_genes[i]
            return FoundNodeCell(
                inner_edges=inner_edges, inner_steps=inner_steps,
                node_steps=self.node_steps,
                node_multiplier=self.node_multiplier,
                C=self.C, L=self.L, drpt=self.drpt,
                fused_eval=self.fused_eval, name=f"step_node_{i}")
        if self.node_variant == "darts":
            return DartsFusionNode(name=f"step_node_{i}")
        if self.node_variant == "mfas":
            return MfasFusionNode(C=self.C, drpt=self.drpt,
                                  name=f"step_node_{i}")
        if self.node_variant == "aoa":
            return AoaFusionNode(C=self.C, L=self.L, drpt=self.drpt,
                                 name=f"step_node_{i}")
        if self.node_variant == "two_head_attn":
            return TwoHeadAttnFusionNode(C=self.C, L=self.L, drpt=self.drpt,
                                         name=f"step_node_{i}")
        raise ValueError(f"unknown node_variant {self.node_variant!r}")

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray], train: bool):
        n_steps = len(self.edges) // 2
        multiplier = len(self.concat)
        states = list(input_features)
        for i in range(n_steps):
            name1, idx1 = self.edges[2 * i]
            name2, idx2 = self.edges[2 * i + 1]
            h1 = EdgeOp(kind=name1, C=self.C, drpt=self.drpt)(states[idx1], train)
            h2 = EdgeOp(kind=name2, C=self.C, drpt=self.drpt)(states[idx2], train)
            s = self._make_step_node(i)(h1, h2, train)
            states.append(s)

        out = jnp.concatenate(states[-multiplier:], axis=-1)
        out = LayerNorm2D()(out)
        out = nn.relu(out)
        return out.reshape(out.shape[0], -1)


class FoundFusionNetwork(nn.Module):
    """Found-net wrapper (model.py:162-190)."""
    steps: int
    multiplier: int
    num_input_nodes: int
    num_keep_edges: int
    node_steps: int
    node_multiplier: int
    C: int
    L: int
    drpt: float
    genotype: Tuple  # frozen via from_genotype()
    node_variant: str = "bmnas"
    fused_eval: bool = False

    @classmethod
    def from_genotype(cls, genotype: G.Genotype, **kwargs) -> "FoundFusionNetwork":
        return cls(genotype=_freeze(genotype), **kwargs)

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray], train: bool):
        assert self.num_input_nodes == len(input_features)
        edges, steps_genes, concat = self.genotype
        return FoundFusionCell(
            edges=edges,
            steps_genes=steps_genes,
            concat=concat,
            node_steps=self.node_steps,
            node_multiplier=self.node_multiplier,
            C=self.C,
            L=self.L,
            drpt=self.drpt,
            node_variant=self.node_variant,
            fused_eval=self.fused_eval,
            name="cell",
        )(input_features, train)

    def get_genotype(self) -> G.Genotype:
        edges, steps_genes, concat = self.genotype
        steps = [
            G.StepGenotype(
                inner_edges=[tuple(e) for e in ie],
                inner_steps=list(isteps),
                inner_concat=list(ic),
            )
            for (ie, isteps, ic) in steps_genes
        ]
        return G.Genotype(edges=[tuple(e) for e in edges], steps=steps,
                          concat=list(concat))

    def referenced_input_nodes(self) -> Tuple[int, ...]:
        """Input indices actually consumed by the genotype edges — used by the
        found task nets to skip building unused reshape layers
        (mmimdb_darts_searchable.py:164-180)."""
        edges, _, _ = self.genotype
        return tuple(sorted({idx for _, idx in edges if idx < self.num_input_nodes}))
