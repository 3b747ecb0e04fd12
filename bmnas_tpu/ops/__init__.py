"""Fusion-op library (L1).

Layout convention
-----------------
All fusion-path tensors are **channels-last** ``(B, L, C)`` — the transpose of
the reference's ``(B, C, L)`` (reference ``models/search/darts/operations.py``,
``node_operations.py``). Rationale (TPU-first):

* ``C`` (128-192) sits in the lane dimension (128 lanes), so every 1x1
  ``Conv1d`` of the reference becomes a plain ``(B*L, C_in) @ (C_in, C_out)``
  MXU matmul with no relayout;
* ``L`` (8-16) sits in sublanes; batch and L fuse into the matmul M dimension;
* the reference's ubiquitous ``transpose(1, 2)`` pairs (e.g. FC_Relu,
  ScaledDotAttn) vanish entirely.

Semantics are verified against the reference layout op-by-op in
``tests/test_ops.py``.
"""
from bmnas_tpu.ops.fusion_ops import (  # noqa: F401
    EDGE_OPS,
    STEP_OPS,
    ConcatFC,
    EdgeOp,
    FusionMixedEdgeSum,
    LinearGLU,
    NodeMixedOp,
    ScaledDotAttn,
    SumOp,
    edge_weighted_sum,
)
from bmnas_tpu.ops.layers import (  # noqa: F401
    GlobalPooling1D,
    GlobalPooling2D,
    LayerNorm2D,
    Maxout,
    ReshapeInputLayer,
    ReshapeInputLayerMMIMDB,
    adaptive_max_pool_1d,
    adaptive_max_pool_2d,
)
