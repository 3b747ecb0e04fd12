"""Auxiliary layers: reshape-input projections, poolings, norms.

Reference: ``models/auxiliary/aux_models.py`` (ReshapeInputLayer :51-76,
ReshapeInputLayer_MMIMDB :87-115, GlobalPooling2D :40-48, GlobalPooling1D
:117-124, Maxout :126-139). Rebuilt channels-last for TPU (see ops/__init__).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _adaptive_bins(in_size: int, out_size: int) -> Sequence[Tuple[int, int]]:
    """PyTorch AdaptiveMaxPool bin boundaries: [floor(i*I/O), ceil((i+1)*I/O))."""
    return [
        (math.floor(i * in_size / out_size), math.ceil((i + 1) * in_size / out_size))
        for i in range(out_size)
    ]


def adaptive_max_pool_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Adaptive max pool along one axis (static shapes, unrolled bins).

    Matches torch.nn.AdaptiveMaxPool semantics including the repeat behaviour
    when ``out_size`` exceeds the input size. Bin count is small and static
    (L <= 16 in all reference configs) so an unrolled slice-max per bin
    compiles to a handful of fused VPU reductions.
    """
    in_size = x.shape[axis]
    bins = _adaptive_bins(in_size, out_size)
    slices = [
        jnp.max(jax.lax.slice_in_dim(x, s, e, axis=axis), axis=axis)
        for (s, e) in bins
    ]
    return jnp.stack(slices, axis=axis if axis >= 0 else x.ndim + axis)


def adaptive_max_pool_2d(x: jnp.ndarray, out_hw: Tuple[int, int],
                         axes: Tuple[int, int] = (1, 2)) -> jnp.ndarray:
    """Adaptive max pool over two axes (default NHWC spatial axes)."""
    x = adaptive_max_pool_1d(x, out_hw[0], axes[0])
    return adaptive_max_pool_1d(x, out_hw[1], axes[1])


def interpolate_nearest_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') along one axis: idx = floor(i*I/O)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx = (jnp.arange(out_size) * in_size) // out_size
    return jnp.take(x, idx, axis=axis)


class LayerNorm2D(nn.Module):
    """LayerNorm over the last two dims with elementwise affine.

    Equivalent of torch ``nn.LayerNorm([C, L])`` applied to our ``(B, L, C)``
    layout: normalizes each sample over all (L, C) positions with per-position
    scale/bias of shape (L, C). Reference usage: model_search.py:27,
    node_search.py:45, node_operations.py:90.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat_shape = x.shape[-2:]
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, feat_shape)
        bias = self.param("bias", nn.initializers.zeros, feat_shape)
        return y * scale + bias


class BatchNorm(nn.Module):
    """BatchNorm over the last (channel) axis, torch-default hyperparams.

    torch BatchNorm1d(momentum=0.1) == flax momentum 0.9; eps 1e-5. Running
    stats live in the ``batch_stats`` collection; ``train`` toggles
    batch-stat updates exactly like torch ``module.train()/.eval()`` — the
    reference keeps BN in train mode even on dev batches during search
    (train_searchable/mmimdb.py:50-56), which callers replicate by passing
    ``train=True`` there.

    ``dtype``: computation/output dtype. The default (None) promotes with
    the fp32 scale/bias — i.e. a bf16 conv output comes back fp32, and
    every BN+relu between backbone convs then moves 2x the HBM bytes. The
    bf16 backbones pass their dtype so activations STAY bf16 end-to-end
    (flax still reduces the batch statistics in fp32 internally, and the
    running stats / scale / bias params remain fp32) — the NTU found step
    is bandwidth-gapped exactly here (benchmarks/ROOFLINE.md #4).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis=-1,
            dtype=self.dtype,
        )(x)


class GlobalPooling2D(nn.Module):
    """Mean over spatial dims: (B, H, W, C) -> (B, C). aux_models.py:40-48."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(x.reshape(x.shape[0], -1, x.shape[-1]), axis=1)


class GlobalPooling1D(nn.Module):
    """Mean over the length dim: (B, L, C) -> (B, C). aux_models.py:117-124."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(x, axis=1)


class Maxout(nn.Module):
    """Maxout layer: Linear(d -> m*k) then max over k. central/mmimdb.py:58-71."""
    features: int
    pool_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Dense(self.features * self.pool_size)(x)
        out = out.reshape(*out.shape[:-1], self.features, self.pool_size)
        return jnp.max(out, axis=-1)


class ReshapeInputLayer(nn.Module):
    """Project a backbone feature map to the common (B, L, C) fusion shape.

    Channels-last rebuild of aux_models.py:51-76. Input is ``(B, T, ..., C_in)``
    (any number of spatial dims between T and C, possibly none). Pipeline:
    max over flattened spatial -> adaptive max pool T -> L -> nearest
    interpolate (identity after the pool, kept for parity) -> 1x1 projection
    (Dense over C) -> BN -> ReLU -> dropout.
    """
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B = x.shape[0]
        C_in = x.shape[-1]
        if x.ndim == 2:  # (B, C_in): treat as T=1
            x = x[:, None, :]
        T = x.shape[1]
        x = x.reshape(B, T, -1, C_in)
        x = jnp.max(x, axis=2)                      # max over spatial S
        x = adaptive_max_pool_1d(x, self.L, axis=1)  # T -> L
        x = interpolate_nearest_1d(x, self.L, axis=1)
        x = nn.Dense(self.C)(x)
        x = BatchNorm()(x, train)
        x = nn.relu(x)
        x = nn.Dropout(self.drpt, deterministic=not train)(x)
        return x


class ReshapeInputLayerMMIMDB(nn.Module):
    """MM-IMDB variant (aux_models.py:87-115): pool spatial to sqrt(L)^2 bins.

    Input ``(B, C_in)`` vectors or ``(B, H, W, C_in)`` maps. Vectors are
    treated as 1x1 maps — adaptive pooling then replicates the value into all
    L bins, exactly like the reference's AdaptiveMaxPool2d on a (C,1,1) map.
    """
    C: int
    L: int
    drpt: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        pool_size = int(math.sqrt(self.L * 1.0))
        assert pool_size * pool_size == self.L, "L must be a perfect square"
        B = x.shape[0]
        C_in = x.shape[-1]
        if x.ndim == 2:
            x = x[:, None, None, :]                  # (B, 1, 1, C_in)
        elif x.ndim == 3:
            x = x[:, :, None, :]
        x = adaptive_max_pool_2d(x, (pool_size, pool_size), axes=(1, 2))
        x = x.reshape(B, self.L, C_in)
        x = nn.Dense(self.C)(x)
        x = BatchNorm()(x, train)
        x = nn.relu(x)
        x = nn.Dropout(self.drpt, deterministic=not train)(x)
        return x
