"""EgoGesture task nets (RGB + Depth ResNeXt-101 fusion).

Rebuild of ``models/search/ego_darts_searchable.py`` (Searchable_RGB_Depth_Net
:72-180, Found_RGB_Depth_Net :183-285). Fusion inputs (8): rgb x2/x3/x4/pool +
depth x2/x3/x4/pool, C_ins [512, 1024, 2048, 2048] x 2 (:104).

Ego BN quirk preserved: the backbones are forced into eval() on EVERY forward
(:122-128) — backbone BN uses running stats and never updates, even during
training. Implemented by calling the backbones with ``train=False``
unconditionally. Backbone params are likewise excluded from the optimizer
(central_params :165-170; found-net also sets requires_grad=False :194-198).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bmnas_tpu import genotype as G
from bmnas_tpu.models.foundnet import FoundFusionNetwork, _freeze
from bmnas_tpu.models.resnext import get_depth_model, get_rgb_model
from bmnas_tpu.models.supernet import FusionNetwork
from bmnas_tpu.ops.layers import ReshapeInputLayer

EGO_C_INS = (512, 1024, 2048, 2048, 512, 1024, 2048, 2048)
EGO_FROZEN_PREFIXES = ("rgb_net", "depth_net")

# NV-transform mean, same constants as data/ego.EGO_MEAN — the loader ships
# raw uint8 pixels (4x less H2D) and the model normalizes here.
_EGO_MEAN = (114.7748, 107.7354, 99.475)


def normalize_uint8_ego(rgb: jnp.ndarray, depth: jnp.ndarray,
                        mask: jnp.ndarray = None):
    """uint8 (B,T,S,S,{3,1}) -> the reference's ToTensor(norm_value=1) space:
    fp32 0-255 with the RGB mean subtracted, depth untouched (Normalize zips
    3 means against 4 channels in the reference, datasets/ego.py:330-374).
    Bit-identical to the host path (data/ego.load_sample host_image_norm).
    No-op on float inputs (already normalized on host).

    ``mask`` (B,) row validity: padded rows are zero BYTES, which would
    mean-subtract to -mean; multiplying by the mask keeps them zero, exactly
    like host-normalized padded batches (identical BN batch statistics)."""
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) - jnp.asarray(_EGO_MEAN, jnp.float32)
        if mask is not None:
            rgb = rgb * mask.reshape((-1,) + (1,) * (rgb.ndim - 1))
    if depth.dtype == jnp.uint8:
        depth = depth.astype(jnp.float32)
        if mask is not None:
            depth = depth * mask.reshape((-1,) + (1,) * (depth.ndim - 1))
    return rgb, depth


class SearchableRGBDepthNet(nn.Module):
    C: int
    L: int
    steps: int
    multiplier: int
    node_steps: int
    node_multiplier: int
    num_input_nodes: int
    num_keep_edges: int
    num_outputs: int
    drpt: float
    backbone_dtype: Any = jnp.float32
    dense_grouped: bool = False  # ResNeXt grouped convs as block-diag dense

    @nn.compact
    def __call__(self, batch, arch, train: bool):
        rgb, depth = normalize_uint8_ego(batch["rgb"], batch["depth"],
                                         batch.get("mask"))
        # backbones in permanent eval mode (ego_darts_searchable.py:122-128)
        rgb_out = get_rgb_model(self.num_outputs,
                                dtype=self.backbone_dtype,
                                dense_grouped=self.dense_grouped).copy(
            name="rgb_net")(rgb, False)
        depth_out = get_depth_model(self.num_outputs,
                                    dtype=self.backbone_dtype,
                                    dense_grouped=self.dense_grouped).copy(
            name="depth_net")(depth, False)
        feats = list(rgb_out[0:-1]) + list(depth_out[0:-1])
        reshaped = [
            ReshapeInputLayer(C=self.C, L=self.L, drpt=self.drpt,
                              name=f"reshape_{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        out = FusionNetwork(
            steps=self.steps, multiplier=self.multiplier,
            num_input_nodes=self.num_input_nodes,
            num_keep_edges=self.num_keep_edges,
            node_steps=self.node_steps, node_multiplier=self.node_multiplier,
            C=self.C, L=self.L, drpt=self.drpt, name="fusion_net",
        )(reshaped, arch, train)
        return nn.Dense(self.num_outputs, name="central_classifier")(out)


class FoundRGBDepthNet(nn.Module):
    C: int
    L: int
    steps: int
    multiplier: int
    node_steps: int
    node_multiplier: int
    num_input_nodes: int
    num_keep_edges: int
    num_outputs: int
    drpt: float
    genotype: Tuple
    node_variant: str = "bmnas"
    fused_eval: bool = False  # Pallas whole-cell kernel on eval forwards
    backbone_dtype: Any = jnp.float32
    dense_grouped: bool = False

    @classmethod
    def from_genotype(cls, genotype: G.Genotype, **kwargs):
        return cls(genotype=_freeze(genotype), **kwargs)

    def _referenced_inputs(self):
        edges, _, _ = self.genotype
        return tuple(sorted({idx for _, idx in edges}))

    @nn.compact
    def __call__(self, batch, arch, train: bool):
        del arch
        rgb, depth = normalize_uint8_ego(batch["rgb"], batch["depth"],
                                         batch.get("mask"))
        rgb_out = get_rgb_model(self.num_outputs,
                                dtype=self.backbone_dtype,
                                dense_grouped=self.dense_grouped).copy(
            name="rgb_net")(rgb, False)
        depth_out = get_depth_model(self.num_outputs,
                                    dtype=self.backbone_dtype,
                                    dense_grouped=self.dense_grouped).copy(
            name="depth_net")(depth, False)
        feats = list(rgb_out[0:-1]) + list(depth_out[0:-1])
        used = self._referenced_inputs()
        reshaped = []
        for i, f in enumerate(feats):
            if i in used:
                reshaped.append(ReshapeInputLayer(
                    C=self.C, L=self.L, drpt=self.drpt,
                    name=f"reshape_{i}")(f, train))
            else:
                reshaped.append(nn.relu(jnp.zeros((f.shape[0], self.L, self.C))))
        out = FoundFusionNetwork(
            steps=self.steps, multiplier=self.multiplier,
            num_input_nodes=self.num_input_nodes,
            num_keep_edges=self.num_keep_edges,
            node_steps=self.node_steps, node_multiplier=self.node_multiplier,
            C=self.C, L=self.L, drpt=self.drpt,
            node_variant=self.node_variant,
            fused_eval=self.fused_eval,
            genotype=self.genotype, name="fusion_net",
        )(reshaped, train)
        return nn.Dense(self.num_outputs, name="central_classifier")(out)
