"""Blockwise scaled-dot attention kernel (tiled over L, online softmax).

SURVEY.md §5.7: the reference's ScaledDotAttn works on tiny L (8/16) where a
dense (L, L) score matrix is trivial, but the fusion-op contract should stay
efficient if L is raised. This kernel is that scaling path: queries are
tiled over a grid, keys/values are consumed in fixed-size blocks with an
online (running max / running denominator) softmax — the (Lq, Lk) score
matrix is never materialized, so memory is O(block^2) regardless of L.

Semantics match ops.fusion_ops.ScaledDotAttn's core (node_operations.py:92-102
in channels-last form): scores = x @ y^T / sqrt(C), softmax over the second
L axis, output = attn @ y. (The surrounding dropout/LayerNorm stay outside —
they are elementwise/cheap and train-mode-dependent.)

Padding: L is padded up to the block size; padded KEY columns are masked to
-inf before the softmax (pad QUERY rows produce garbage rows that the
wrapper slices off).

Role: MEMORY scaling, not raw speed — at sizes where the dense (Lq, Lk)
score matrix still fits comfortably (everything the reference ships, and
well beyond), XLA's dense batched attention is at least as fast (slope-method
measurement at B=8, L=512, C=192: dense ~17 us/op vs blockwise ~67 us/op on
v5e through the dev relay). The blockwise kernel is the path that keeps the
fusion-op contract viable when L grows past VMEM-score-matrix scale.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(x_ref, y_ref, out_ref, *, lk_valid: int, block_k: int):
    q = x_ref[:]                       # (BQ, C)
    BQ, C = q.shape
    Lk = y_ref.shape[0]
    num_kb = Lk // block_k
    scale = 1.0 / math.sqrt(C)

    m = jnp.full((BQ, 1), NEG_INF, jnp.float32)     # running max
    l = jnp.zeros((BQ, 1), jnp.float32)             # running denominator
    acc = jnp.zeros((BQ, C), jnp.float32)           # running numerator

    def body(kb, carry):
        m, l, acc = carry
        k = y_ref[pl.ds(kb * block_k, block_k), :]  # (BK, C)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)
        # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < lk_valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                       # (BQ, BK)
        correction = jnp.exp(m - m_new)
        l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * correction + jnp.dot(
            p, k, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    out_ref[:] = acc / l


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def blockwise_scaled_dot_attention(x: jnp.ndarray, y: jnp.ndarray,
                                   block_q: int = 128, block_k: int = 128,
                                   interpret: bool = False) -> jnp.ndarray:
    """softmax(x y^T / sqrt(C)) y with O(block^2) score memory.

    x: (B, Lq, C) queries; y: (B, Lk, C) keys==values (the reference op uses
    the same tensor for both, node_operations.py:95-102).
    """
    B, Lq, C = x.shape
    Lk = y.shape[1]
    bq = min(block_q, max(8, Lq))
    bk = min(block_k, max(8, Lk))
    Lq_p = -(-Lq // bq) * bq
    Lk_p = -(-Lk // bk) * bk
    if Lq_p != Lq:
        x = jnp.pad(x, [(0, 0), (0, Lq_p - Lq), (0, 0)])
    if Lk_p != Lk:
        y = jnp.pad(y, [(0, 0), (0, Lk_p - Lk), (0, 0)])

    # fold batch into the grid; strictly-2D blocks (see axon-tpu-env notes)
    x2 = x.reshape(B * Lq_p, C)
    y2 = y.reshape(B * Lk_p, C)
    grid = (B, Lq_p // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, lk_valid=Lk, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, C), lambda b, i: (b * (Lq_p // bq) + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk_p, C), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, C), lambda b, i: (b * (Lq_p // bq) + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * Lq_p, C), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Lq_p * Lk_p * C,
            bytes_accessed=4 * (B * Lq_p * C * 2 + B * Lk_p * C),
            transcendentals=B * Lq_p * Lk_p,
        ),
    )(x2, y2)
    return out.reshape(B, Lq_p, C)[:, :Lq]


def reference_attention(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Dense jnp reference (matches ScaledDotAttn core)."""
    C = x.shape[-1]
    scores = jnp.einsum("blc,bmc->blm", x, y) / math.sqrt(C)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("blm,bmc->blc", attn, y)
