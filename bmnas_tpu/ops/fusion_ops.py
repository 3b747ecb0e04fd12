"""Fusion primitives: outer edge ops and inner two-input fusion ops.

Channels-last ``(B, L, C)`` rebuilds of the reference op library:
  * edge OPS (none/skip/fc_relu/fc_mish): ``models/search/darts/operations.py:7-93``
  * inner STEP_STEP_OPS (Sum/ScaleDotAttn/LinearGLU/ConcatFC):
    ``models/search/darts/node_operations.py:9-108``
  * mixed ops (continuous relaxation): ``operations.py:95-106``,
    ``node_operations.py:110-120``

TPU notes: every 1x1 Conv1d becomes a Dense over the lane (C) axis (MXU);
the four inner ops of ``NodeMixedOp`` are evaluated together so XLA fuses
their elementwise tails into the shared weighted sum; the attention score
matmul is (L x C)(C x L) with L<=16 — small, but kept in one dot_general so it
lands on the MXU. A hand-fused Pallas kernel for the full mixed op lives in
``bmnas_tpu/ops/kernels`` (used on TPU for the found-net hot path).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from bmnas_tpu.genotype import STEP_STEP_PRIMITIVES
from bmnas_tpu.ops.layers import BatchNorm, LayerNorm2D


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x * tanh(softplus(x)) — operations.py:40-46."""
    return x * jnp.tanh(jax.nn.softplus(x))


# ---------------------------------------------------------------------------
# Outer edge ops (single input). operations.py:7-93.
# ---------------------------------------------------------------------------

class EdgeOp(nn.Module):
    """One named edge op. 'none' -> zeros, 'skip' -> identity,
    'fc_relu'/'fc_mish' -> Dense + act + BN + dropout (registered in the
    reference OPS dict but outside PRIMITIVES; supported for found-net parity).
    """
    kind: str
    C: int
    drpt: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.kind == "none":
            return jnp.zeros_like(x)
        if self.kind == "skip":
            return x
        if self.kind in ("fc_relu", "fc_mish"):
            # FC over channel dim; reference transposes to do Linear(C, C)
            # (operations.py:29-37) — channels-last needs no transpose.
            out = nn.Dense(self.C)(x)
            out = nn.relu(out) if self.kind == "fc_relu" else mish(out)
            out = BatchNorm()(out, train)
            out = nn.Dropout(self.drpt, deterministic=not train)(out)
            return out
        raise ValueError(f"unknown edge op {self.kind!r}")


EDGE_OPS: List[str] = ["none", "fc_relu", "fc_mish", "skip"]


def edge_weighted_sum(states: jnp.ndarray, skip_weights: jnp.ndarray) -> jnp.ndarray:
    """Fused mixed-op edge sum over a stack of states.

    With PRIMITIVES = [none, skip], each FusionMixedOp contributes
    ``w_none * 0 + w_skip * x`` (operations.py:104-106), so the per-step
    aggregation ``sum_j mixedop_j(state_j, w_j)`` (model_search.py:58)
    collapses to one contraction over the stacked states:
    ``einsum('n,nblc->blc', w[:, skip], states)``. This replaces the
    reference's Python-loop op fan-out with a single XLA reduction.

    Args:
      states: (N, B, L, C) stacked input states.
      skip_weights: (N,) softmaxed 'skip' column of the alpha/beta rows.
    """
    return jnp.einsum("n,nblc->blc", skip_weights, states)


# ---------------------------------------------------------------------------
# Inner fusion ops (two inputs, (B,L,C) x (B,L,C) -> (B,L,C)).
# node_operations.py:16-108.
# ---------------------------------------------------------------------------

class SumOp(nn.Module):
    """x + y. node_operations.py:16-20."""

    @nn.compact
    def __call__(self, x, y, train: bool):
        return x + y


class ScaledDotAttn(nn.Module):
    """Scaled dot-product attention over the L axis. node_operations.py:84-108.

    Reference (B,C,L) math: q = x^T (B,L,C), k = y, v = y^T; scores = q k /
    sqrt(C) of shape (B,L,L); out = softmax(scores) v, transposed back. In
    channels-last this is scores = x y^T with no transposes. Dropout rate is
    fixed 0.1 in the reference regardless of args.drpt.
    """
    C: int
    L: int

    @nn.compact
    def __call__(self, x, y, train: bool):
        d_k = x.shape[-1]
        scores = jnp.einsum("blc,bmc->blm", x, y) / math.sqrt(d_k)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("blm,bmc->blc", attn, y)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        out = LayerNorm2D()(out)
        return out


class LinearGLU(nn.Module):
    """concat channels -> 1x1 conv (2C->2C) -> BN -> GLU -> dropout.
    node_operations.py:22-39. GLU over the channel axis: first half gates
    second half (torch F.glu(dim=1) on (B,2C,L) == split last axis here).
    """
    C: int
    drpt: float

    @nn.compact
    def __call__(self, x, y, train: bool):
        out = jnp.concatenate([x, y], axis=-1)       # (B, L, 2C)
        out = nn.Dense(2 * self.C)(out)
        out = BatchNorm()(out, train)
        a, b = jnp.split(out, 2, axis=-1)
        out = a * jax.nn.sigmoid(b)
        out = nn.Dropout(self.drpt, deterministic=not train)(out)
        return out


class ConcatFC(nn.Module):
    """concat channels -> 1x1 conv (2C->C) -> BN -> ReLU -> dropout.
    node_operations.py:41-56."""
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


STEP_OPS: Dict[str, Callable[..., nn.Module]] = {
    "Sum": lambda C, L, drpt: SumOp(),
    "ScaleDotAttn": lambda C, L, drpt: ScaledDotAttn(C=C, L=L),
    "LinearGLU": lambda C, L, drpt: LinearGLU(C=C, drpt=drpt),
    "ConcatFC": lambda C, L, drpt: ConcatFC(C=C, drpt=drpt),
    # legacy vocabulary: old reference genotypes name this op
    # 'cat_conv_relu' (main_darts_found_ntu.py:243); semantically it is
    # ConcatFC (cat -> 1x1 conv -> BN -> ReLU -> dropout). The reference's
    # own STEP_STEP_OPS would KeyError on it; we accept it for compatibility.
    "cat_conv_relu": lambda C, L, drpt: ConcatFC(C=C, drpt=drpt),
}


class NodeMixedOp(nn.Module):
    """gamma-weighted sum of all four inner ops. node_operations.py:110-120.

    All four branches are computed on every call (continuous relaxation);
    x and y are loaded once and shared across branches, and the weighted sum
    is a single fused elementwise combine.
    """
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, x, y, weights, train: bool):
        outs = [
            STEP_OPS[p](self.C, self.L, self.drpt)(x, y, train)
            for p in STEP_STEP_PRIMITIVES
        ]
        stacked = jnp.stack(outs, axis=0)            # (4, B, L, C)
        return jnp.einsum("k,kblc->blc", weights, stacked)


class FusionMixedEdgeSum(nn.Module):
    """Module wrapper over :func:`edge_weighted_sum` (kept for symmetry)."""

    @nn.compact
    def __call__(self, states: jnp.ndarray, skip_weights: jnp.ndarray):
        return edge_weighted_sum(states, skip_weights)
