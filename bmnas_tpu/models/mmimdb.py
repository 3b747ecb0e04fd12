"""MM-IMDB backbones and task nets (search + found).

Rebuild of ``models/central/mmimdb.py`` (GP_VGG :10-54, Maxout :58-71,
MaxOut_MLP :74-94) and ``models/search/mmimdb_darts_searchable.py``
(Searchable_Image_Text_Net :57-133, Found_Image_Text_Net :135-221).

Layout: images are NHWC; backbone feature maps stay NHWC and the reshape
layers consume them channels-last directly (no NCHW round-trips anywhere).
Pretrained torchvision VGG-19 weights are imported with
``bmnas_tpu.utils.torch_convert`` (OIHW->HWIO transpose); training from
scratch also works (the reference never trains the backbones anyway:
``central_params()`` excludes them).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bmnas_tpu import genotype as G
from bmnas_tpu.models.foundnet import FoundFusionNetwork
from bmnas_tpu.models.supernet import FusionNetwork
from bmnas_tpu.ops.layers import BatchNorm, GlobalPooling2D, Maxout, ReshapeInputLayerMMIMDB

# VGG-19 feature config (torchvision): conv channel counts, 'M' = 2x2 maxpool.
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# Tap points by torch features-list index (central/mmimdb.py:32-47):
# 20/26/33 are ReLU outputs in blocks 4/4/5, 36 is the final maxpool.
VGG19_TAPS = (20, 26, 33, 36)

# Reshape-layer input channel counts (mmimdb_darts_searchable.py:86).
MMIMDB_C_INS = (512, 512, 512, 512, 64, 128)


class GPVGG(nn.Module):
    """VGG-19 feature stack with 4 intermediate taps + classifier head.

    ``dtype=jnp.bfloat16`` runs the conv stack in bf16 on the MXU (params
    stay fp32; taps are cast back to fp32 before the fusion path). The
    backbone is frozen during search, so bf16 here changes only the feature
    values (~1e-2 rel), not training stability.
    """
    num_outputs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> Tuple[jnp.ndarray, ...]:
        taps = []
        idx = 0
        conv_i = 0
        x = x.astype(self.dtype)
        for v in VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if idx in VGG19_TAPS:
                    taps.append(x.astype(jnp.float32))
                idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                conv_i += 1
                idx += 1  # conv module
                x = nn.relu(x)
                if idx in VGG19_TAPS:
                    taps.append(x.astype(jnp.float32))
                idx += 1  # relu module
        out_1, out_2, out_3, out_4 = taps
        pooled = GlobalPooling2D()(out_4)
        pooled = BatchNorm(name="bn4")(pooled, train)
        logits = nn.Dense(self.num_outputs, name="classifier")(pooled)
        return out_1, out_2, out_3, out_4, logits


class MaxOutMLP(nn.Module):
    """Two-stage maxout MLP over 300-d text features (central/mmimdb.py:74-94)."""
    num_outputs: int
    first_hidden: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        o1 = Maxout(features=self.first_hidden, pool_size=5, name="op1")(x)
        o2 = BatchNorm(name="bn1")(o1, train)
        o2 = nn.Dropout(0.5, deterministic=not train)(o2)
        o3 = Maxout(features=self.first_hidden * 2, pool_size=5, name="op3")(o2)
        o4 = BatchNorm(name="bn2")(o3, train)
        o4 = nn.Dropout(0.5, deterministic=not train)(o4)
        o5 = nn.Dense(self.num_outputs, name="hid2val")(o4)
        return o1, o3, o5


# Backbone param subtrees excluded from the weight optimizer during search
# (mmimdb_darts_searchable.py:120-126: central_params = reshape + fusion +
# classifier only).
MMIMDB_FROZEN_PREFIXES = ("imagenet", "textnet")


class SearchableImageTextNet(nn.Module):
    """Supernet task model (mmimdb_darts_searchable.py:57-133)."""
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

    @nn.compact
    def __call__(self, batch, arch, train: bool):
        text, image = batch["text"], batch["image"]
        image_feats = GPVGG(self.num_outputs, dtype=self.backbone_dtype,
                            name="imagenet")(image, train)
        text_feats = MaxOutMLP(self.num_outputs, name="textnet")(text, train)
        feats = list(image_feats[0:-1]) + list(text_feats[0:-1])
        reshaped = [
            ReshapeInputLayerMMIMDB(
                C=self.C, L=self.L, drpt=self.drpt, name=f"reshape_{i}"
            )(f, train)
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


class FoundImageTextNet(nn.Module):
    """Compiled task model from a genotype (mmimdb_darts_searchable.py:135-221).

    Reshape layers are built only for genotype-referenced input indices;
    the rest become parameterless ReLUs, matching :164-180.
    """
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
    genotype: Tuple  # frozen; build with from_genotype()
    backbone_dtype: Any = jnp.float32
    node_variant: str = "bmnas"
    fused_eval: bool = False  # Pallas whole-cell kernel on eval forwards

    @classmethod
    def from_genotype(cls, genotype: G.Genotype, **kwargs) -> "FoundImageTextNet":
        from bmnas_tpu.models.foundnet import _freeze
        return cls(genotype=_freeze(genotype), **kwargs)

    def _referenced_inputs(self) -> Tuple[int, ...]:
        edges, _, _ = self.genotype
        return tuple(sorted({idx for _, idx in edges}))

    @nn.compact
    def __call__(self, batch, arch, train: bool):
        # ``arch`` is ignored (kept for a uniform apply signature).
        del arch
        text, image = batch["text"], batch["image"]
        image_feats = GPVGG(self.num_outputs, dtype=self.backbone_dtype,
                            name="imagenet")(image, train)
        text_feats = MaxOutMLP(self.num_outputs, name="textnet")(text, train)
        feats = list(image_feats[0:-1]) + list(text_feats[0:-1])
        used = self._referenced_inputs()
        reshaped = []
        for i, f in enumerate(feats):
            if i in used:
                reshaped.append(
                    ReshapeInputLayerMMIMDB(
                        C=self.C, L=self.L, drpt=self.drpt, name=f"reshape_{i}"
                    )(f, train)
                )
            else:
                # parameterless stand-in (reference uses nn.ReLU()); output
                # is never consumed by the cell.
                reshaped.append(nn.relu(jnp.zeros((f.shape[0], self.L, self.C))))
        fusion = FoundFusionNetwork(
            steps=self.steps, multiplier=self.multiplier,
            num_input_nodes=self.num_input_nodes,
            num_keep_edges=self.num_keep_edges,
            node_steps=self.node_steps, node_multiplier=self.node_multiplier,
            C=self.C, L=self.L, drpt=self.drpt,
            node_variant=self.node_variant,
            fused_eval=self.fused_eval,
            genotype=self.genotype, name="fusion_net",
        )
        out = fusion(reshaped, train)
        return nn.Dense(self.num_outputs, name="central_classifier")(out)
