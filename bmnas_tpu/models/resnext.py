"""3D ResNeXt-101 (EgoGesture RGB/Depth backbones).

Rebuild of ``models/central/ego.py:35-216`` (ResNeXtBottleneck :35-80, ResNeXt
:82-175): cardinality-32 grouped 3x3x3 convs, expansion 2, stem 7^3 stride
(1,2,2). First-conv surgery (modify_kernels, :296-312):
  * RGB: 3-channel (3,7,7) stem, stride (1,2,2), pad (1,3,3), no bias (:282-294)
  * Depth: 1-channel stem, original kernel size; pretrained weights
    mean-inflated by the torch converter (:228-254)
  * RGB-D: 4-channel stem (:256-280)

Layout: (B, T, H, W, C) channels-last. Grouped convs map to
``feature_group_count`` (XLA lowers these straight onto the MXU).
Forward returns (x2, x3, x4, pooled, logits) — layer2/3/4 maps + avg-pooled
vector (ego.py:158-175; the reference returns the un-flattened 5D pool
tensor, consumed identically by the reshape layers).
"""
from __future__ import annotations

from typing import Tuple

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bmnas_tpu.ops.layers import BatchNorm


class BlockDiagGroupedConv(nn.Module):
    """The grouped 3x3x3 conv executed as a DENSE conv with a block-diagonal
    kernel — identical math (off-block weights are exactly zero), but full
    128x128 MXU tiles instead of 32 tiny per-group matmuls (cardinality-32
    grouped convs give the MXU 4-32 channels per group, its worst case).

    Parameter tree is identical to the grouped ``nn.Conv`` (same "kernel"
    name, same (3,3,3,cpg,F) shape, same lecun-normal fan-in), so torch
    conversion and checkpoints are unaffected. For the ego nets — the
    intended user — the backbones are frozen constants of the step, so XLA
    constant-folds the block-diagonal expansion at compile time and the step
    never pays for it. Opt-in via ``dense_grouped`` (measure first:
    benchmarks/grouped_conv_probe.py)."""
    features: int
    groups: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        cpg = c_in // self.groups
        opg = self.features // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cpg, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        # (27, cpg, G, opg): out channels are group-major (o = g*opg + j)
        k3 = k.reshape(27, cpg, self.groups, opg)
        eye = jnp.eye(self.groups, dtype=self.dtype)
        dense = jnp.einsum("hg,scgo->shcgo", eye, k3).reshape(
            3, 3, 3, c_in, self.features)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, dense.shape, ("NTHWC", "THWIO", "NTHWC"))
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), dense, (self.stride,) * 3,
            [(1, 1)] * 3, dimension_numbers=dn)


class ResNeXtBottleneck(nn.Module):
    planes: int
    cardinality: int = 32
    stride: int = 1
    downsample: bool = False
    expansion: int = 2
    dtype: Any = jnp.float32
    dense_grouped: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.cardinality * (self.planes // 32)
        residual = x
        out = nn.Conv(mid, (1, 1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = BatchNorm(name="bn1", dtype=self.dtype)(out, train)
        out = nn.relu(out)
        if self.dense_grouped:
            out = BlockDiagGroupedConv(
                features=mid, groups=self.cardinality, stride=self.stride,
                dtype=self.dtype, name="conv2")(out)
        else:
            out = nn.Conv(mid, (3, 3, 3), strides=self.stride, padding=1,
                          feature_group_count=self.cardinality,
                          use_bias=False, dtype=self.dtype,
                          name="conv2")(out)
        out = BatchNorm(name="bn2", dtype=self.dtype)(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(name="bn3", dtype=self.dtype)(out, train)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn",
                                 dtype=self.dtype)(residual, train)
        return nn.relu(out + residual.astype(out.dtype))


class ResNeXt3D(nn.Module):
    """ResNeXt-101: layers (3, 4, 23, 3), planes (128, 256, 512, 1024)."""
    num_outputs: int
    layers: Tuple[int, ...] = (3, 4, 23, 3)
    planes: Tuple[int, ...] = (128, 256, 512, 1024)
    cardinality: int = 32
    in_channels: int = 3       # 3 RGB / 1 Depth / 4 RGB-D
    stem_kernel_t: int = 3     # RGB surgery uses (3,7,7); original is (7,7,7)
    dtype: Any = jnp.float32   # bf16 => MXU conv stack, fp32 taps/params
    dense_grouped: bool = False  # grouped convs as block-diag dense (MXU)

    @nn.compact
    def __call__(self, x, train: bool):
        pad_t = self.stem_kernel_t // 2
        h = nn.Conv(64, (self.stem_kernel_t, 7, 7), strides=(1, 2, 2),
                    padding=((pad_t, pad_t), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        h = BatchNorm(name="bn1", dtype=self.dtype)(h, train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1),) * 3)

        taps = []
        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip(self.planes, self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes * 2)
                h = ResNeXtBottleneck(
                    planes=planes, cardinality=self.cardinality, stride=s,
                    downsample=need_ds, dtype=self.dtype,
                    dense_grouped=self.dense_grouped,
                    name=f"layer{stage+1}_{b}")(h, train)
            inplanes = planes * 2
            taps.append(h.astype(jnp.float32))  # fusion path stays fp32

        _x1, x2, x3, x4 = taps
        pooled = jnp.mean(x4, axis=(1, 2, 3))      # (B, 2048)
        logits = nn.Dense(self.num_outputs, name="fc")(pooled)
        return x2, x3, x4, pooled, logits


def get_rgb_model(num_outputs: int, dtype: Any = jnp.float32,
                  dense_grouped: bool = False) -> ResNeXt3D:
    """ego.py:218-221 + _modify_first_conv_layer(model, 3, 3)."""
    return ResNeXt3D(num_outputs=num_outputs, in_channels=3, stem_kernel_t=3,
                     dtype=dtype, dense_grouped=dense_grouped)


def get_depth_model(num_outputs: int, dtype: Any = jnp.float32,
                    dense_grouped: bool = False) -> ResNeXt3D:
    """ego.py:223-226 + _construct_depth_model (1-channel, original 7^3 stem)."""
    return ResNeXt3D(num_outputs=num_outputs, in_channels=1, stem_kernel_t=7,
                     dtype=dtype, dense_grouped=dense_grouped)


def get_rgbd_model(num_outputs: int, dtype: Any = jnp.float32,
                   dense_grouped: bool = False) -> ResNeXt3D:
    """ego.py:256-280 (4-channel stem)."""
    return ResNeXt3D(num_outputs=num_outputs, in_channels=4, stem_kernel_t=7,
                     dtype=dtype, dense_grouped=dense_grouped)
