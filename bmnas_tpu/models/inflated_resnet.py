"""Inflated 3D ResNet-50 (NTU RGB backbone).

Rebuild of ``models/auxiliary/{inflated_resnet.py,resnet/resnet.py,
resnet/bottleneck.py}``: a 2D 7x7/s2 stem applied per frame, then four
stages of Bottleneck3D blocks (1x1x1 -> 3x3x3 -> 1x1x1, spatial-only stride),
feature maps tapped after every stage (``get_feature_maps``,
resnet/resnet.py:73-122).

Layout: (B, T, H, W, C) channels-last throughout — the reference's 5D<->4D
``transform_input`` reshuffles (resnet.py:125-138) reduce to a single
fold/unfold of T into the batch dim for the 2D stem.

ImageNet 2D->3D weight inflation (repeat along T, zero all but the center
slice — imagenet_pretraining.py:6-23) is implemented in
``bmnas_tpu/utils/torch_convert.py`` and applied when importing a torch
ResNet-50 checkpoint; random init otherwise.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bmnas_tpu.ops.layers import BatchNorm


class Bottleneck3D(nn.Module):
    """resnet/bottleneck.py:4-42. Spatial-only stride (1, s, s).

    ``dtype=jnp.bfloat16`` runs the convs on the MXU in bf16 (params fp32;
    flax BatchNorm always reduces its statistics in fp32)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        residual = x
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(name="bn1", dtype=self.dtype)(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3, 3),
                      strides=(1, self.stride, self.stride), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(name="bn2", dtype=self.dtype)(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(name="bn3", dtype=self.dtype)(out, train)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1, 1),
                               strides=(1, self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn",
                                 dtype=self.dtype)(residual, train)
        return nn.relu(out + residual.astype(out.dtype))


class InflatedResNet50(nn.Module):
    """Stem (2D per-frame) + layers [3, 4, 6, 3]; returns 4 stage taps.

    ``remat=True`` rematerializes each bottleneck in the backward pass
    (jax.checkpoint): found-phase NTU training backprops through this
    backbone at batch 96 x 8 x 256 x 256 where stored activations would
    exceed a single chip's HBM — remat trades ~30% extra FLOPs for O(stage)
    activation memory.
    """
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        B, T, H, W, C = x.shape
        # 2D stem per frame: fold T into batch (transform_input equivalent).
        h = x.astype(self.dtype).reshape(B * T, H, W, C)
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = BatchNorm(name="bn1", dtype=self.dtype)(h, train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = h.reshape(B, T, h.shape[1], h.shape[2], h.shape[3])

        block_cls = (nn.remat(Bottleneck3D, static_argnums=(2,))
                     if self.remat else Bottleneck3D)
        taps = []
        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip(self.channels, self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes * 4)
                h = block_cls(planes=planes, stride=s, downsample=need_ds,
                              dtype=self.dtype,
                              name=f"layer{stage+1}_{b}")(h, train)
            inplanes = planes * 4
            taps.append(h.astype(jnp.float32))  # fusion path stays fp32
        return tuple(taps)  # fm1 (256c), fm2 (512c), fm3 (1024c), fm4 (2048c)
