"""Fused Pallas TPU kernel for the inner fusion mixed-op (inference path).

The hot inner loop of BM-NAS fusion is the gamma-weighted sum of the four
two-input ops (node_operations.py:110-120):

    out = g0*(x+y) + g1*Attn(x,y) + g2*GLU(x,y) + g3*ConcatFC(x,y)

Executed as separate modules (reference) or separate XLA ops, x and y are
read from memory once per branch and three intermediates round-trip through
HBM. This kernel computes all four branches in one VMEM residency per batch
row: x, y are loaded once, the three matmuls (attention scores L x L,
GLU (L,2C)@(2C,2C), ConcatFC (L,2C)@(2C,C)) run back-to-back on the MXU, and
the weighted combine happens in registers.

Inference-mode semantics: BatchNorms are FOLDED into the dense weights
(`fuse_bn_into_dense`) and dropout is identity — this is the found-net
serving path. Training keeps the jnp composite (XLA already fuses the
elementwise tails there, and train-mode BN needs cross-batch reductions).

Measurement verdict (recorded honestly; slope method = chained-op jits of
two lengths, scalar-fetch sync, v5e via the axon relay):

  * 4-branch mixed op (search semantics, all branches live): fused ~3.6
    us/op vs ~7.2 us/op composite (round-1 chains, N=40 vs N=400).
  * whole FoundNodeCell (found semantics, ONE static branch + residual +
    LayerNorm; B=96, L=16, C=192, branch=ScaleDotAttn; N=200 vs N=2000):
    XLA composite 11.4 us/op; fused kernel 16.1 us/op at tile_b=8,
    12.9 us/op at tile_b=32 (grid overhead amortizes; tile_b=4 is 29.5).
    With ``static_branch`` only the selected branch's GEMMs are emitted.

Conclusion: the fused kernel wins when all four branches are needed (the
supernet's NodeMixedOp — but search runs train-mode BN, which this
eval-mode kernel cannot host), and reaches near-parity for single-op found
cells, where XLA already fuses the composite well at these tiny shapes. The
composite therefore remains the DEFAULT; the kernel is user-reachable via
``--fused_kernels`` on the found CLIs and ``FoundNetServer(fused=True)``,
equivalence-tested against the composite (1e-7 fp32 on CPU; bf16-MXU
tolerance on TPU, where XLA's default-precision einsum rounds differently).

A train-mode-BN variant for the SEARCH hot loop (two-pass grid: batch-stat
reduction pass + apply pass, so the kernel could host the supernet's
cross-batch BN) was sized and rejected: the search forward holds 2
NodeMixedOps (steps=2 x node_steps=1 at the reference mmimdb config), so
even the full 2x per-op win bounds the saving at ~2 x 3.6 us x fwd+bwd
~= 20-30 us of a measured ~2.3 ms bf16 weight step (<2%) — the step is
dominated by the frozen VGG forward, not the fusion cell. The two-pass
structure would also re-run or spill the GLU/ConcatFC GEMMs, eating most
of the margin.

Shapes: x, y (B, L, C); one grid program per batch row; block (L, C) and the
(2C, 2C) weights sit in VMEM (L<=16, C<=192 in all reference configs ->
< 1 MB). The layout is blockwise-extensible over L: scores are computed for
the full (L, L) tile, which holds to L = 128 per tile before a second-level
grid would be needed (SURVEY.md §5.7).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import flax.struct


class NodeMixedParams(flax.struct.PyTreeNode):
    """Folded inference parameters of one NodeMixedOp (a jax pytree)."""
    ln_scale: jnp.ndarray   # (L, C)  attention LayerNorm
    ln_bias: jnp.ndarray    # (L, C)
    glu_kernel: jnp.ndarray  # (2C, 2C) BN-folded
    glu_bias: jnp.ndarray    # (2C,)
    cfc_kernel: jnp.ndarray  # (2C, C) BN-folded
    cfc_bias: jnp.ndarray    # (C,)


def fuse_bn_into_dense(kernel: jnp.ndarray, bias: jnp.ndarray,
                       scale: jnp.ndarray, bn_bias: jnp.ndarray,
                       mean: jnp.ndarray, var: jnp.ndarray,
                       eps: float = 1e-5):
    """Fold an eval-mode BatchNorm following a Dense into the Dense weights:
    y = scale * (xW + b - mean) / sqrt(var + eps) + bn_bias."""
    inv = scale / jnp.sqrt(var + eps)
    return kernel * inv[None, :], (bias - mean) * inv + bn_bias


def node_mixed_op_reference(x, y, gammas, p: NodeMixedParams,
                            eps: float = 1e-5):
    """Pure-jnp reference with identical semantics (eval mode)."""
    d_k = x.shape[-1]
    s = x + y
    scores = jnp.einsum("blc,bmc->blm", x, y) / math.sqrt(d_k)
    attn = jax.nn.softmax(scores, axis=-1)
    a = jnp.einsum("blm,bmc->blc", attn, y)
    mean = jnp.mean(a, axis=(-2, -1), keepdims=True)
    var = jnp.var(a, axis=(-2, -1), keepdims=True)
    a = (a - mean) * jax.lax.rsqrt(var + eps) * p.ln_scale + p.ln_bias

    cat = jnp.concatenate([x, y], axis=-1)
    h = cat @ p.glu_kernel + p.glu_bias
    g1, g2 = jnp.split(h, 2, axis=-1)
    g = g1 * jax.nn.sigmoid(g2)

    c = jax.nn.relu(cat @ p.cfc_kernel + p.cfc_bias)
    return gammas[0] * s + gammas[1] * a + gammas[2] * g + gammas[3] * c


def _block_layernorm(o, same_blk, scale, bias, *, L, C, eps):
    """Per-sample LayerNorm over a (R, C) tile whose rows are grouped into
    L-row sample blocks: statistics via a block-averaging matmul (strictly
    2D; no in-kernel reshapes, which Mosaic lowers poorly)."""
    bavg = jnp.where(same_blk, jnp.float32(1.0 / (L * C)), jnp.float32(0.0))
    s1 = jnp.sum(o, axis=1, keepdims=True)                        # (R, 1)
    s2 = jnp.sum(o * o, axis=1, keepdims=True)
    mean = jnp.dot(bavg, s1, preferred_element_type=jnp.float32)  # (R, 1)
    ex2 = jnp.dot(bavg, s2, preferred_element_type=jnp.float32)
    var = ex2 - mean * mean
    return (o - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _mixed_body(gamma_ref, x2, y2, ln_s, ln_b, gw, gb_, cw, cb_,
                *, eps: float, L: int, static_branch: int = None):
    """The four-branch weighted combine on a 2D (R, C) tile; returns
    (out2, same_blk).

    MXU utilization is the design driver: with L=16 a per-sample GEMM has 16
    rows (12.5% of a 128-row MXU pass). Tiling 8 samples gives 128-row GEMMs
    for the GLU/ConcatFC branches, the attention scores for the whole tile
    are ONE (tile_b*L, tile_b*L) GEMM masked to its block diagonal (rows of
    the softmax only attend within their own sample), and the per-sample
    LayerNorm statistics come from a block-averaging matmul.

    ``static_branch`` specializes the trace to ONE branch (found nets know
    their inner op at compile time): the other branches' GEMMs are never
    emitted, and the gamma weight is skipped (found semantics are the bare
    op, weight exactly 1).
    """
    R, C = x2.shape

    def want(i):
        return static_branch is None or static_branch == i

    row_blk = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // L
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // L
    same_blk = row_blk == col_blk

    out2 = jnp.zeros_like(x2)

    # branch 0: sum
    if want(0):
        s = x2 + y2
        out2 = s if static_branch == 0 else gamma_ref[0, 0] * s

    # branch 1: block-diagonal attention + per-sample LayerNorm
    if want(1):
        scores = jax.lax.dot_general(
            x2, y2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / math.sqrt(C))
        scores = jnp.where(same_blk, scores, jnp.float32(-1e30))
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        a2 = jnp.dot(attn, y2, preferred_element_type=jnp.float32)  # (R, C)
        a2 = _block_layernorm(a2, same_blk, ln_s, ln_b, L=L, C=C, eps=eps)
        out2 = a2 if static_branch == 1 else out2 + gamma_ref[0, 1] * a2

    if want(2) or want(3):
        # shared concat for branches 2 and 3: (R, 2C)
        cat = jnp.concatenate([x2, y2], axis=-1)

    # branch 2: GLU (BN folded into gw/gb)
    if want(2):
        h = jnp.dot(cat, gw, preferred_element_type=jnp.float32) + gb_
        ga = h[:, :C]
        gb = h[:, C:]
        g = ga * (1.0 / (1.0 + jnp.exp(-gb)))
        out2 = g if static_branch == 2 else out2 + gamma_ref[0, 2] * g

    # branch 3: ConcatFC (BN folded into cw/cb)
    if want(3):
        c = jnp.dot(cat, cw, preferred_element_type=jnp.float32) + cb_
        c = jnp.maximum(c, 0.0)
        out2 = c if static_branch == 3 else out2 + gamma_ref[0, 3] * c
    return out2, same_blk


def _kernel(gamma_ref, x_ref, y_ref, ln_s_ref, ln_b_ref, gw_ref, gb_ref,
            cw_ref, cb_ref, out_ref, *, eps: float, L: int, tile_b: int):
    """One program handles a tile of ``tile_b`` samples, laid out 2D."""
    out2, _ = _mixed_body(gamma_ref, x_ref[:], y_ref[:], ln_s_ref[:],
                          ln_b_ref[:], gw_ref[:], gb_ref[:], cw_ref[:],
                          cb_ref[:], eps=eps, L=L)
    out_ref[:] = out2.astype(out_ref.dtype)  # f32 accum -> output dtype (bf16 serving)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "tile_b"))
def node_mixed_op_fused(x: jnp.ndarray, y: jnp.ndarray, gammas: jnp.ndarray,
                        p: NodeMixedParams, eps: float = 1e-5,
                        interpret: bool = False,
                        tile_b: int = 8) -> jnp.ndarray:
    """Fused eval-mode NodeMixedOp. x, y: (B, L, C); gammas: (4,).

    The batch is padded to a multiple of ``tile_b`` (pad rows are dropped on
    return; their softmax is well-defined thanks to the block-diagonal mask).
    """
    B, L, C = x.shape
    tile_b = min(tile_b, max(1, B))
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    if Bp != B:
        pad = [(0, Bp - B), (0, 0), (0, 0)]
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
    R = tile_b * L
    x2 = x.reshape(Bp * L, C)
    y2 = y.reshape(Bp * L, C)
    ln_s = jnp.tile(p.ln_scale, (tile_b, 1))          # (R, C)
    ln_b = jnp.tile(p.ln_bias, (tile_b, 1))
    gb2 = p.glu_bias.reshape(1, 2 * C)
    cb2 = p.cfc_bias.reshape(1, C)
    gammas2d = jnp.reshape(gammas.astype(jnp.float32), (1, 4))
    grid = (Bp // tile_b,)
    tile = lambda i: (i, 0)
    full = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, L=L, tile_b=tile_b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C, 2 * C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C, C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * L, C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(Bp // tile_b) * (2 * R * R * C * 2
                                    + 2 * R * 2 * C * 2 * C
                                    + 2 * R * 2 * C * C),
            bytes_accessed=Bp * L * C * 4 * 3 + (2 * C) * (3 * C) * 4,
            transcendentals=(Bp // tile_b) * R * (R + C),
        ),
    )(gammas2d, x2, y2, ln_s, ln_b, p.glu_kernel, gb2, p.cfc_kernel, cb2)
    return out.reshape(Bp, L, C)[:B]


def params_from_flax(node_mixed_params: dict, eps: float = 1e-5
                     ) -> NodeMixedParams:
    """Extract + fold a trained NodeMixedOp's flax param/batch_stats subtree.

    Expects the variables of ops.fusion_ops.NodeMixedOp:
      ScaledDotAttn_0/LayerNorm2D_0/{scale,bias}
      LinearGLU_0/Dense_0/{kernel,bias} + BatchNorm_0(+stats)
      ConcatFC_0/Dense_0/{kernel,bias} + BatchNorm_0(+stats)
    ``node_mixed_params`` = {"params": ..., "batch_stats": ...} subtrees.
    """
    params = node_mixed_params["params"]
    stats = node_mixed_params["batch_stats"]
    ln = params["ScaledDotAttn_0"]["LayerNorm2D_0"]
    glu_p = params["LinearGLU_0"]
    cfc_p = params["ConcatFC_0"]
    glu_k, glu_b = fuse_bn_into_dense(
        glu_p["Dense_0"]["kernel"], glu_p["Dense_0"]["bias"],
        glu_p["BatchNorm_0"]["BatchNorm_0"]["scale"],
        glu_p["BatchNorm_0"]["BatchNorm_0"]["bias"],
        stats["LinearGLU_0"]["BatchNorm_0"]["BatchNorm_0"]["mean"],
        stats["LinearGLU_0"]["BatchNorm_0"]["BatchNorm_0"]["var"], eps)
    cfc_k, cfc_b = fuse_bn_into_dense(
        cfc_p["Dense_0"]["kernel"], cfc_p["Dense_0"]["bias"],
        cfc_p["BatchNorm_0"]["BatchNorm_0"]["scale"],
        cfc_p["BatchNorm_0"]["BatchNorm_0"]["bias"],
        stats["ConcatFC_0"]["BatchNorm_0"]["BatchNorm_0"]["mean"],
        stats["ConcatFC_0"]["BatchNorm_0"]["BatchNorm_0"]["var"], eps)
    return NodeMixedParams(
        ln_scale=ln["scale"], ln_bias=ln["bias"],
        glu_kernel=glu_k, glu_bias=glu_b,
        cfc_kernel=cfc_k, cfc_bias=cfc_b)


# one-hot branch index per inner-op name (STEP_STEP_PRIMITIVES order;
# 'cat_conv_relu' is the legacy spelling of ConcatFC, see ops/fusion_ops.py)
FUSABLE_STEP_OPS = {"Sum": 0, "ScaleDotAttn": 1, "LinearGLU": 2,
                    "ConcatFC": 3, "cat_conv_relu": 3}


# ---------------------------------------------------------------------------
# Whole-cell kernel, general shape: node_steps >= 1 chained inner steps
# (each with static branch + static skip/none edge selection over the
# accumulated state list) and node_multiplier >= 1 (concat of the last m
# states -> BN-folded out_conv -> ReLU). Covers NTU's found default
# (node_steps=2, node_multiplier=2, cli/ntu.py) and ego's node_steps=3 —
# the single-step kernel above only served node_steps=1.
# ---------------------------------------------------------------------------

def _cell_multi_kernel(*refs, eps: float, L: int, steps_cfg, multiplier: int):
    """One tile: S chained mixed-op steps + concat/out_conv + residual + LN.

    ``steps_cfg``: tuple of (branch_idx, (skip_x, idx_x), (skip_y, idx_y))
    per step — all static, so each step emits exactly one branch's GEMMs and
    the state-list indexing unrolls at trace time.

    refs layout: x, y, r, ln1_s_all (S*R, C), ln1_b_all (S*R, C),
    gw_all (S*2C, 2C), gb_all (S, 2C), cw_all (S*2C, C), cb_all (S, C),
    [oc_w (m*C, C), oc_b (1, C)]?, ln2_s (R, C), ln2_b (R, C), out.
    """
    S = len(steps_cfg)
    it = iter(refs)
    x_ref, y_ref, r_ref = next(it), next(it), next(it)
    ln1_s_all, ln1_b_all, gw_all, gb_all, cw_all, cb_all = (
        next(it) for _ in range(6))
    if multiplier != 1:
        oc_w_ref, oc_b_ref = next(it), next(it)
    ln2_s_ref, ln2_b_ref, out_ref = next(it), next(it), next(it)

    x2, y2, r2 = x_ref[:], y_ref[:], r_ref[:]
    R, C = x2.shape
    zeros = jnp.zeros_like(x2)
    states = [x2, y2]
    same_blk = None
    for i, (branch, (skip_x, idx_x), (skip_y, idx_y)) in enumerate(steps_cfg):
        in_x = states[idx_x] if skip_x else zeros
        in_y = states[idx_y] if skip_y else zeros
        out2, same_blk = _mixed_body(
            None, in_x, in_y,
            ln1_s_all[i * R:(i + 1) * R], ln1_b_all[i * R:(i + 1) * R],
            gw_all[i * 2 * C:(i + 1) * 2 * C], gb_all[i:i + 1],
            cw_all[i * 2 * C:(i + 1) * 2 * C], cb_all[i:i + 1],
            eps=eps, L=L, static_branch=branch)
        states.append(out2)

    if multiplier == 1:
        o = states[-1]
    else:
        cat = jnp.concatenate(states[-multiplier:], axis=-1)   # (R, m*C)
        o = jnp.dot(cat, oc_w_ref[:],
                    preferred_element_type=jnp.float32) + oc_b_ref[:]
        o = jnp.maximum(o, 0.0)
    o = o + r2
    out_ref[:] = _block_layernorm(o, same_blk, ln2_s_ref[:], ln2_b_ref[:],
                                  L=L, C=C, eps=eps).astype(out_ref.dtype)


class FoundCellParams(flax.struct.PyTreeNode):
    """Stacked folded parameters for the multi-step found cell."""
    ln1_scale: jnp.ndarray   # (S, L, C) attention LN per step (zeros if unused)
    ln1_bias: jnp.ndarray    # (S, L, C)
    glu_kernel: jnp.ndarray  # (S, 2C, 2C) BN-folded
    glu_bias: jnp.ndarray    # (S, 2C)
    cfc_kernel: jnp.ndarray  # (S, 2C, C) BN-folded
    cfc_bias: jnp.ndarray    # (S, C)
    oc_kernel: jnp.ndarray   # (m*C, C) BN-folded out_conv, or None (m=1)
    oc_bias: jnp.ndarray     # (C,) or None
    ln2_scale: jnp.ndarray   # (L, C) output LayerNorm
    ln2_bias: jnp.ndarray    # (L, C)


@functools.partial(jax.jit, static_argnames=("steps_cfg", "multiplier", "eps",
                                             "interpret", "tile_b"))
def found_node_cell_multi_fused(x: jnp.ndarray, y: jnp.ndarray,
                                p: FoundCellParams, steps_cfg,
                                multiplier: int = 1, eps: float = 1e-5,
                                interpret: bool = False,
                                tile_b: int = 32) -> jnp.ndarray:
    """Fused eval-mode FoundNodeCell for any node_steps/node_multiplier.

    ``steps_cfg`` per step: (branch_idx, (skip_x, idx_x), (skip_y, idx_y)).
    Residual is ``x`` (node.py:73-74: out += x where x is the node's first
    input). All S steps' GEMMs, the out_conv and the output LayerNorm run in
    one VMEM residency per tile.
    """
    B, L, C = x.shape
    S = len(steps_cfg)
    tile_b = min(tile_b, max(1, B))
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    if Bp != B:
        pad = [(0, Bp - B), (0, 0), (0, 0)]
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
    R = tile_b * L
    x2 = x.reshape(Bp * L, C)
    y2 = y.reshape(Bp * L, C)
    ln1_s = jnp.concatenate([jnp.tile(p.ln1_scale[i], (tile_b, 1))
                             for i in range(S)])        # (S*R, C)
    ln1_b = jnp.concatenate([jnp.tile(p.ln1_bias[i], (tile_b, 1))
                             for i in range(S)])        # (S*R, C)
    gw_all = p.glu_kernel.reshape(S * 2 * C, 2 * C)
    cw_all = p.cfc_kernel.reshape(S * 2 * C, C)
    ln2_s = jnp.tile(p.ln2_scale, (tile_b, 1))
    ln2_b = jnp.tile(p.ln2_bias, (tile_b, 1))

    grid = (Bp // tile_b,)
    tile = lambda i: (i, 0)
    full = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((R, C), tile, memory_space=pltpu.VMEM),       # x
        pl.BlockSpec((R, C), tile, memory_space=pltpu.VMEM),       # y
        pl.BlockSpec((R, C), tile, memory_space=pltpu.VMEM),       # residual
        pl.BlockSpec((S * R, C), full, memory_space=pltpu.VMEM),   # ln1 scale
        pl.BlockSpec((S * R, C), full, memory_space=pltpu.VMEM),   # ln1 bias
        pl.BlockSpec((S * 2 * C, 2 * C), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 2 * C), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((S * 2 * C, C), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, C), full, memory_space=pltpu.VMEM),
    ]
    operands = [x2, y2, x2, ln1_s, ln1_b, gw_all, p.glu_bias, cw_all,
                p.cfc_bias]
    if multiplier != 1:
        in_specs += [
            pl.BlockSpec((multiplier * C, C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), full, memory_space=pltpu.VMEM),
        ]
        operands += [p.oc_kernel, p.oc_bias.reshape(1, C)]
    in_specs += [
        pl.BlockSpec((R, C), full, memory_space=pltpu.VMEM),       # ln2 scale
        pl.BlockSpec((R, C), full, memory_space=pltpu.VMEM),       # ln2 bias
    ]
    operands += [ln2_s, ln2_b]

    kernel = functools.partial(_cell_multi_kernel, eps=eps, L=L,
                               steps_cfg=tuple(steps_cfg),
                               multiplier=multiplier)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, C), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * L, C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(Bp // tile_b) * S * (2 * R * R * C + 2 * R * 2 * C * 2 * C
                                        + 2 * R * 2 * C * C),
            bytes_accessed=Bp * L * C * 4 * 4,
            transcendentals=(Bp // tile_b) * S * R * (R + C),
        ),
    )(*operands)
    return out.reshape(Bp, L, C)[:B]


_OP_CLASS = {"Sum": "SumOp", "ScaleDotAttn": "ScaledDotAttn",
             "LinearGLU": "LinearGLU", "ConcatFC": "ConcatFC",
             "cat_conv_relu": "ConcatFC"}


def found_cell_steps_cfg(inner_edges, inner_steps):
    """Static per-step kernel config from a StepGenotype:
    (branch_idx, (skip_x, idx_x), (skip_y, idx_y)) per step."""
    cfg = []
    for i, op in enumerate(inner_steps):
        (kx, ix), (ky, iy) = inner_edges[2 * i], inner_edges[2 * i + 1]
        cfg.append((FUSABLE_STEP_OPS[op],
                    (kx == "skip", ix), (ky == "skip", iy)))
    return tuple(cfg)


def found_cell_params_from_flax(cell_variables: dict, inner_steps,
                                C: int, L: int, node_multiplier: int,
                                eps: float = 1e-5) -> "FoundCellParams":
    """Stacked folded parameters for found_node_cell_multi_fused from a
    FoundNodeCell's variables.

    Flax auto-names count per module CLASS across the unrolled steps (two
    ConcatFC steps -> ConcatFC_0, ConcatFC_1), so the step->name mapping
    tracks a per-class counter. Unused branch slots stay zero — the static
    branch config means they are never read.
    """
    # built with jnp (stack of per-step slices), never numpy assignment —
    # the serving path traces this under jit with tracer-valued params
    params = cell_variables["params"]
    stats = cell_variables.get("batch_stats", {})
    ln1_s, ln1_b, glu_k, glu_b, cfc_k, cfc_b = [], [], [], [], [], []

    counters = {}
    for op in inner_steps:
        cls = _OP_CLASS[op]
        k = counters.get(cls, 0)
        counters[cls] = k + 1
        name = f"{cls}_{k}"
        idx = FUSABLE_STEP_OPS[op]
        ls, lb = jnp.zeros((L, C), jnp.float32), jnp.zeros((L, C), jnp.float32)
        gk, gb = (jnp.zeros((2 * C, 2 * C), jnp.float32),
                  jnp.zeros((2 * C,), jnp.float32))
        ck, cb = (jnp.zeros((2 * C, C), jnp.float32),
                  jnp.zeros((C,), jnp.float32))
        if idx == 1:
            ln = params[name]["LayerNorm2D_0"]
            ls, lb = ln["scale"], ln["bias"]
        elif idx in (2, 3):
            pD = params[name]
            sD = stats[name]
            fk, fb = fuse_bn_into_dense(
                pD["Dense_0"]["kernel"], pD["Dense_0"]["bias"],
                pD["BatchNorm_0"]["BatchNorm_0"]["scale"],
                pD["BatchNorm_0"]["BatchNorm_0"]["bias"],
                sD["BatchNorm_0"]["BatchNorm_0"]["mean"],
                sD["BatchNorm_0"]["BatchNorm_0"]["var"], eps)
            if idx == 2:
                gk, gb = fk, fb
            else:
                ck, cb = fk, fb
        ln1_s.append(ls)
        ln1_b.append(lb)
        glu_k.append(gk)
        glu_b.append(gb)
        cfc_k.append(ck)
        cfc_b.append(cb)

    oc_k = oc_b = None
    if node_multiplier != 1:
        oc_k, oc_b = fuse_bn_into_dense(
            params["Dense_0"]["kernel"], params["Dense_0"]["bias"],
            params["BatchNorm_0"]["BatchNorm_0"]["scale"],
            params["BatchNorm_0"]["BatchNorm_0"]["bias"],
            stats["BatchNorm_0"]["BatchNorm_0"]["mean"],
            stats["BatchNorm_0"]["BatchNorm_0"]["var"], eps)

    ln2 = params["LayerNorm2D_0"]
    return FoundCellParams(
        ln1_scale=jnp.stack(ln1_s), ln1_bias=jnp.stack(ln1_b),
        glu_kernel=jnp.stack(glu_k), glu_bias=jnp.stack(glu_b),
        cfc_kernel=jnp.stack(cfc_k), cfc_bias=jnp.stack(cfc_b),
        oc_kernel=oc_k, oc_bias=oc_b,
        ln2_scale=ln2["scale"], ln2_bias=ln2["bias"])
