"""DARTS-style fusion supernet (search phase).

Rebuild of ``models/search/darts/model_search.py`` (FusionCell :13-68,
FusionNetwork :70-109) and ``node_search.py`` (NodeCell :12-70, FusionNode
:72-108), channels-last (B, L, C).

Architecture parameters (alpha/beta/gamma) are NOT flax params: they form a
separate pytree created by :func:`init_arch_params` and are passed into
``__call__``. This mirrors the reference's split — arch params live outside
the module and are optimized by a second Adam (model_search.py:99-109,
mmimdb_darts_searchable.py:32-33) — and makes the bilevel step natural in JAX:
the weight step differentiates w.r.t. flax params only, the arch step w.r.t.
this pytree only.

The per-step mixed-op fan-out of the reference (a Python loop of
``w_none*0 + w_skip*x`` per state, model_search.py:58) is collapsed into a
single stacked einsum contraction per step (see ops.fusion_ops.edge_weighted_sum).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bmnas_tpu import genotype as G
from bmnas_tpu.ops.fusion_ops import NodeMixedOp, edge_weighted_sum
from bmnas_tpu.ops.layers import BatchNorm, LayerNorm2D

ArchParams = Dict[str, jnp.ndarray]


def outer_num_edges(steps: int, num_input_nodes: int) -> int:
    return sum(num_input_nodes + i for i in range(steps))


def inner_num_edges(node_steps: int, num_input_nodes: int = 2) -> int:
    return sum(num_input_nodes + i for i in range(node_steps))


def init_arch_params(
    rng: jax.Array,
    steps: int,
    num_input_nodes: int,
    node_steps: int,
    dtype=jnp.float32,
) -> ArchParams:
    """1e-3 * N(0,1) init, matching model_search.py:99-102 and
    node_search.py:89-99. Shapes:
      alphas: (sum_i (num_input_nodes+i), |PRIMITIVES|)
      betas:  (steps, sum_i (2+i), |STEP_EDGE_PRIMITIVES|)
      gammas: (steps, node_steps, |STEP_STEP_PRIMITIVES|)
    """
    ka, kb, kg = jax.random.split(rng, 3)
    k_outer = outer_num_edges(steps, num_input_nodes)
    k_inner = inner_num_edges(node_steps)
    return {
        "alphas": 1e-3 * jax.random.normal(ka, (k_outer, len(G.PRIMITIVES)), dtype),
        "betas": 1e-3
        * jax.random.normal(kb, (steps, k_inner, len(G.STEP_EDGE_PRIMITIVES)), dtype),
        "gammas": 1e-3
        * jax.random.normal(kg, (steps, node_steps, len(G.STEP_STEP_PRIMITIVES)), dtype),
    }


def derive_genotype_from_arch(
    arch: ArchParams,
    steps: int,
    multiplier: int,
    num_input_nodes: int,
    node_steps: int,
    node_multiplier: int,
) -> G.Genotype:
    """Host-side genotype derivation from the arch pytree (once per epoch)."""
    alphas = np.asarray(arch["alphas"])
    betas = [np.asarray(arch["betas"][i]) for i in range(steps)]
    gammas = [np.asarray(arch["gammas"][i]) for i in range(steps)]
    return G.derive_genotype(
        alphas, betas, gammas, steps, multiplier, num_input_nodes,
        node_steps, node_multiplier,
    )


class SearchNodeCell(nn.Module):
    """Inner searchable mini-DAG (node_search.py:12-70)."""
    node_steps: int
    node_multiplier: int
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, x, y, beta_w, gamma_w, train: bool):
        # beta_w: (k_inner, 2) softmaxed; gamma_w: (node_steps, 4) softmaxed.
        states = [x, y]
        offset = 0
        for i in range(self.node_steps):
            stacked = jnp.stack(states, axis=0)
            step_input = edge_weighted_sum(
                stacked, beta_w[offset : offset + len(states), 1]
            )
            # Reference passes the same tensor as both inputs of the mixed op
            # (node_search.py:55).
            s = NodeMixedOp(C=self.C, L=self.L, drpt=self.drpt)(
                step_input, step_input, gamma_w[i], train
            )
            offset += len(states)
            states.append(s)

        out = jnp.concatenate(states[-self.node_multiplier :], axis=-1)
        if self.node_multiplier != 1:
            out = nn.Dense(self.C)(out)
            out = BatchNorm()(out, train)
            out = nn.relu(out)
            out = nn.Dropout(self.drpt, deterministic=not train)(out)
        # "skip v4" residual + LayerNorm (node_search.py:67-68).
        out = out + x
        out = LayerNorm2D()(out)
        return out


class FusionCell(nn.Module):
    """Outer searchable cell (model_search.py:13-68)."""
    steps: int
    multiplier: int
    num_input_nodes: int
    node_steps: int
    node_multiplier: int
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray], arch_w, train: bool):
        alpha_w = arch_w["alphas"]  # (k_outer, 2) softmaxed
        states: List[jnp.ndarray] = list(input_features)
        offset = 0
        for i in range(self.steps):
            stacked = jnp.stack(states, axis=0)
            step_input = edge_weighted_sum(
                stacked, alpha_w[offset : offset + len(states), 1]
            )
            s = SearchNodeCell(
                node_steps=self.node_steps,
                node_multiplier=self.node_multiplier,
                C=self.C,
                L=self.L,
                drpt=self.drpt,
                name=f"step_node_{i}",
            )(step_input, step_input, arch_w["betas"][i], arch_w["gammas"][i], train)
            offset += len(states)
            states.append(s)

        out = jnp.concatenate(states[-self.multiplier :], axis=-1)  # (B, L, C*m)
        out = LayerNorm2D()(out)
        out = nn.relu(out)
        # Flatten. NOTE: channels-last flatten order (L-major) differs from the
        # reference's channel-major view (model_search.py:67); the permutation
        # is absorbed by the downstream classifier weights (converter permutes
        # when importing torch checkpoints).
        return out.reshape(out.shape[0], -1)


class FusionNetwork(nn.Module):
    """Supernet wrapper (model_search.py:70-109): softmaxes arch params and
    runs the single cell."""
    steps: int
    multiplier: int
    num_input_nodes: int
    num_keep_edges: int
    node_steps: int
    node_multiplier: int
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray], arch: ArchParams,
                 train: bool):
        assert self.num_input_nodes == len(input_features)
        arch_w = {
            "alphas": jax.nn.softmax(arch["alphas"], axis=-1),
            "betas": jax.nn.softmax(arch["betas"], axis=-1),
            "gammas": jax.nn.softmax(arch["gammas"], axis=-1),
        }
        return FusionCell(
            steps=self.steps,
            multiplier=self.multiplier,
            num_input_nodes=self.num_input_nodes,
            node_steps=self.node_steps,
            node_multiplier=self.node_multiplier,
            C=self.C,
            L=self.L,
            drpt=self.drpt,
            name="cell",
        )(input_features, arch_w, train)

    def genotype(self, arch: ArchParams) -> G.Genotype:
        return derive_genotype_from_arch(
            arch, self.steps, self.multiplier, self.num_input_nodes,
            self.node_steps, self.node_multiplier,
        )
