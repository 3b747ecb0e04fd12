"""NTU RGB+D backbones and task nets.

Rebuild of ``models/central/ntu.py`` (Visual :7-40, Skeleton=HCN :43-173) and
``models/search/ntu_darts_searchable.py`` (Searchable_Skeleton_Image_Net
:71-178, Found_Skeleton_Image_Net :181-273).

Layouts: video clips are (B, T, H, W, 3); skeletons (B, T, V=25, M=2, 3).
Fusion inputs (8): inflated-ResNet stages fm2/fm3/fm4 + temporal-pooled
vector, then HCN hidden[-4:] (out5/out6/out7/out8) — C_ins
[512, 1024, 2048, 2048, 128, 256, 1024, 512]
(ntu_darts_searchable.py:104, :122-128).

Search-phase optimizer quirk preserved: NTU's ``central_params()`` covers
ONLY fusion_net + central_classifier — the reshape layers are excluded (in
contrast to mmimdb/ego; ntu_darts_searchable.py:160-166) — hence
NTU_SEARCH_FROZEN_PREFIXES includes the reshape layers.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bmnas_tpu import genotype as G
from bmnas_tpu.models.foundnet import FoundFusionNetwork, _freeze
from bmnas_tpu.models.hcn import HCN
from bmnas_tpu.models.inflated_resnet import InflatedResNet50
from bmnas_tpu.models.supernet import FusionNetwork
from bmnas_tpu.ops.layers import ReshapeInputLayer

NTU_C_INS = (512, 1024, 2048, 2048, 128, 256, 1024, 512)

# ImageNet stats for on-device uint8 normalization (same constants as
# data/ntu.py — the loader ships raw uint8 pixels, 4x less H2D traffic, and
# the model applies the identical fp32 normalization here).
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_uint8_clip(x: jnp.ndarray, mask: jnp.ndarray = None
                         ) -> jnp.ndarray:
    """uint8 (B, T, H, W, 3) -> fp32 ImageNet-normalized. Bit-identical to
    the host path (data/ntu.normalize_sample): /255 then (x - mean) / std in
    fp32. No-op on float inputs (already normalized on host).

    ``mask`` (B,) row validity: padded rows are zero BYTES, which would
    normalize to -mean/std (normalized black); multiplying by the mask keeps
    them zero in normalized space, exactly like the host-normalized padded
    batches (so BN batch statistics see identical content)."""
    if x.dtype != jnp.uint8:
        return x
    x = x.astype(jnp.float32) / 255.0
    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    if mask is not None:
        x = x * mask.reshape((-1,) + (1,) * (x.ndim - 1))
    return x

# Search: only fusion_net + central_classifier are optimized
# (ntu_darts_searchable.py:160-166).
NTU_SEARCH_FROZEN_PREFIXES = ("rgbnet", "skenet") + tuple(
    f"reshape_{i}" for i in range(len(NTU_C_INS)))
# Found/eval: the whole net is optimized (main_darts_found_ntu.py:122-139).
NTU_EVAL_FROZEN_PREFIXES = ()


class Visual(nn.Module):
    """Inflated ResNet-50 + temporal pooling + classifier
    (central/ntu.py:7-40). Returns (fm1, fm2, fm3, fm4, pooled, logits).

    ``dtype=jnp.bfloat16`` runs the 3D conv stack in bf16 on the MXU
    (params/BN stats fp32; stage taps cast back to fp32)."""
    num_outputs: int
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        x = normalize_uint8_clip(x)
        fm1, fm2, fm3, fm4 = InflatedResNet50(remat=self.remat,
                                              dtype=self.dtype,
                                              name="cnn")(x, train)
        # avgpool over (T=8, 7, 7) -> (B, 2048) (central/ntu.py:12,16-21)
        pooled = jnp.mean(fm4, axis=(1, 2, 3))
        logits = nn.Dense(self.num_outputs, name="classifier")(pooled)
        return fm1, fm2, fm3, fm4, pooled, logits


def _ntu_features(rgbnet_out, ske_out):
    visual_features = list(rgbnet_out[-5:-1])   # fm2, fm3, fm4, pooled
    skel_features = list(ske_out[0][-4:])       # out5, out6, out7, out8
    return visual_features + skel_features


class SearchableSkeletonImageNet(nn.Module):
    """Supernet task model (ntu_darts_searchable.py:71-178)."""
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
    remat: bool = False
    backbone_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, arch, train: bool):
        image, skeleton = batch["image"], batch["skeleton"]
        image = normalize_uint8_clip(image, batch.get("mask"))
        rgb_out = Visual(self.num_outputs, remat=self.remat,
                         dtype=self.backbone_dtype,
                         name="rgbnet")(image, train)
        ske_out = HCN(self.num_outputs, self.drpt, name="skenet")(skeleton, train)
        feats = _ntu_features(rgb_out, ske_out)
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


class _AblationClassifier(nn.Module):
    """Linear(C*L*k -> C) -> ReLU -> BN -> Linear(C -> num_outputs)
    (ntu_darts_searchable.py:303-309 and twins)."""
    C: int
    num_outputs: int

    @nn.compact
    def __call__(self, x, train: bool):
        from bmnas_tpu.ops.layers import BatchNorm
        x = nn.Dense(self.C)(x)
        x = nn.relu(x)
        x = BatchNorm()(x, train)
        return nn.Dense(self.num_outputs)(x)


class NTUAblationNet(nn.Module):
    """The reference's whole-net NTU ablation baselines
    (ntu_darts_searchable.py:275-680), rebuilt as one module with a
    ``variant`` switch instead of four near-identical classes:

      simple_concat      — concat reshaped v3 + s3 -> MLP head (:275-368)
      ensemble_concat    — + reshaped unimodal logits, concat 5 feats (:369-473)
      ensemble           — reshaped unimodal logits only (:474-580)
      simple_concat_attn — cross attention v3<->s3, concat (:582-680)

    These are dead code in the reference (no CLI reaches them) and three of
    the four CRASH on construction as shipped (`ReshapeInputLayer(C_in, C,
    L)` missing the args param, :556-558; `ScaledDotAttn()` missing (C, L),
    :611-612); rebuilt here to their evident intent and actually reachable
    via ``--task_variant`` on the found NTU CLI. Reshape layers follow the
    reference in being constructed for all inputs; the found-phase optimizer
    covers the whole net (main_darts_found_ntu.py:122-139 semantics)."""
    C: int
    L: int
    num_outputs: int
    drpt: float
    variant: str = "simple_concat"
    remat: bool = False
    backbone_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, arch, train: bool):
        del arch
        from bmnas_tpu.ops.fusion_ops import ScaledDotAttn
        image, skeleton = batch["image"], batch["skeleton"]
        image = normalize_uint8_clip(image, batch.get("mask"))
        rgb_out = Visual(self.num_outputs, remat=self.remat,
                         dtype=self.backbone_dtype,
                         name="rgbnet")(image, train)
        ske_out = HCN(self.num_outputs, self.drpt, name="skenet")(skeleton,
                                                                  train)
        feats = _ntu_features(rgb_out, ske_out)
        if self.variant in ("ensemble_concat", "ensemble"):
            feats = feats + [rgb_out[-1], ske_out[1]]  # unimodal logits
        reshaped = [
            ReshapeInputLayer(C=self.C, L=self.L, drpt=self.drpt,
                              name=f"reshape_{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        v2, v3, s3 = reshaped[2], reshaped[3], reshaped[7]
        if self.variant == "simple_concat":
            picked = [v3, s3]
        elif self.variant == "ensemble_concat":
            picked = [v2, v3, s3, reshaped[8], reshaped[9]]
        elif self.variant == "ensemble":
            picked = [reshaped[8], reshaped[9]]
        elif self.variant == "simple_concat_attn":
            out1 = ScaledDotAttn(C=self.C, L=self.L, name="attn1")(v3, s3,
                                                                   train)
            out2 = ScaledDotAttn(C=self.C, L=self.L, name="attn2")(s3, v3,
                                                                   train)
            picked = [out1, out2]
        else:
            raise ValueError(f"unknown NTU task variant {self.variant!r}")
        out = jnp.concatenate(picked, axis=-1)
        out = out.reshape(out.shape[0], -1)
        return _AblationClassifier(C=self.C, num_outputs=self.num_outputs,
                                   name="central_classifier")(out, train)


NTU_TASK_VARIANTS = ("bmnas", "simple_concat", "ensemble_concat", "ensemble",
                     "simple_concat_attn")


class FoundSkeletonImageNet(nn.Module):
    """Genotype-compiled task model (ntu_darts_searchable.py:181-273)."""
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
    remat: bool = False
    node_variant: str = "bmnas"
    fused_eval: bool = False  # Pallas whole-cell kernel on eval forwards
    backbone_dtype: Any = jnp.float32

    @classmethod
    def from_genotype(cls, genotype: G.Genotype, **kwargs):
        return cls(genotype=_freeze(genotype), **kwargs)

    def _referenced_inputs(self):
        edges, _, _ = self.genotype
        return tuple(sorted({idx for _, idx in edges}))

    @nn.compact
    def __call__(self, batch, arch, train: bool):
        del arch
        image, skeleton = batch["image"], batch["skeleton"]
        image = normalize_uint8_clip(image, batch.get("mask"))
        rgb_out = Visual(self.num_outputs, remat=self.remat,
                         dtype=self.backbone_dtype,
                         name="rgbnet")(image, train)
        ske_out = HCN(self.num_outputs, self.drpt, name="skenet")(skeleton, train)
        feats = _ntu_features(rgb_out, ske_out)
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
