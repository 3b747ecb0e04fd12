"""PyTorch checkpoint -> flax params converters.

Covers the reference's pretrained-weight inputs (SURVEY.md §5.4):
  * torchvision VGG-19 (MM-IMDB image backbone, central/mmimdb.py:15)
  * NTU skeleton HCN checkpoint (``skeleton_32frames_85.24.checkpoint``)
  * NTU Visual inflated-ResNet-50 checkpoint (``rgb_8frames_83.91.checkpoint``)
  * torchvision ResNet-50 2D->3D center inflation
    (imagenet_pretraining.py:6-23) for building Visual from ImageNet weights
  * EgoGesture ResNeXt-101 RGB/Depth checkpoints (``egogesture_resnext_*.pth``)

Layout rules (torch -> flax):
  Conv2d  (O, I, H, W)      -> (H, W, I, O)
  Conv3d  (O, I, D, H, W)   -> (D, H, W, I, O)
  Linear  (O, I)            -> (I, O)
  BatchNorm weight/bias     -> params scale/bias;
  running_mean/var          -> batch_stats mean/var

Flatten-order fixups: wherever the torch model flattens a (N, C, H, W) map
channel-major into a Linear (HCN fc7), the kernel rows are permuted to match
our channels-last flatten.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # strip DataParallel 'module.' prefixes
    return {k[7:] if k.startswith("module.") else k: _np(v)
            for k, v in sd.items()}


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def bn_params(sd: Dict[str, np.ndarray], prefix: str):
    p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    s = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return p, s


def inflate_2d_to_3d(w2d: np.ndarray, time_dim: int,
                     inflation: str = "center") -> np.ndarray:
    """2D conv kernel (O, I, H, W) -> 3D (O, I, T, H, W).

    'center': zeros except the middle temporal slice (exactly preserves the
    2D response on temporally-constant input; imagenet_pretraining.py:6-23).
    'mean': repeat / time_dim.
    """
    O, I, H, W = w2d.shape
    w3d = np.zeros((O, I, time_dim, H, W), w2d.dtype)
    if inflation == "center":
        w3d[:, :, time_dim // 2] = w2d
    elif inflation == "mean":
        w3d[:] = w2d[:, :, None] / time_dim
    else:
        raise ValueError(inflation)
    return w3d


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    leaf = node[parts[-1]]
    assert tuple(leaf.shape) == tuple(value.shape), (
        f"{path}: shape {tuple(value.shape)} != expected {tuple(leaf.shape)}")
    node[parts[-1]] = value.astype(np.asarray(leaf).dtype)


def _to_mutable(tree):
    import jax
    return jax.tree_util.tree_map(np.asarray, dict(tree))


# ---------------------------------------------------------------------------
# VGG-19 (GPVGG)
# ---------------------------------------------------------------------------

def convert_vgg19(sd: Dict[str, np.ndarray], gpvgg_params: Dict,
                  gpvgg_stats: Dict = None) -> Dict:
    """torchvision vgg19 ``features.{i}.weight/bias`` -> GPVGG conv_{j}.

    Accepts either a bare torchvision vgg19 state dict or a GP_VGG module
    state dict (keys ``vgg.{i}.*``, central/mmimdb.py:15-24).
    """
    params = _to_mutable(gpvgg_params)
    prefix = "features" if any(k.startswith("features") for k in sd) else "vgg"
    conv_idx = [i for i in range(37)
                if f"{prefix}.{i}.weight" in sd and sd[f"{prefix}.{i}.weight"].ndim == 4]
    for j, i in enumerate(conv_idx):
        _set(params, f"conv_{j}/kernel", conv2d_kernel(sd[f"{prefix}.{i}.weight"]))
        _set(params, f"conv_{j}/bias", sd[f"{prefix}.{i}.bias"])
    return params


# ---------------------------------------------------------------------------
# HCN skeleton checkpoint
# ---------------------------------------------------------------------------

def hcn_out7_perm(C: int = 256, H: int = 2, W: int = 2) -> np.ndarray:
    """Input-dim permutation for consumers of HCN's flattened out7: torch
    flattens (N, C, H, W) channel-major, our channels-last HCN flattens
    (N, H, W, C) L-major. perm[ours] = torch index; use as ``w[:, perm]``."""
    perm = np.zeros(C * H * W, np.int64)
    for h in range(H):
        for w in range(W):
            for c in range(C):
                perm[h * W * C + w * C + c] = c * H * W + h * W + w
    return perm

def convert_hcn(sd: Dict[str, np.ndarray], hcn_params: Dict) -> Dict:
    """NTU Skeleton state dict -> HCN flax params.

    torch names (central/ntu.py:56-115): conv1.0, conv2, conv3.0, conv4.0,
    conv{1m,2m,3m,4m}(.0), conv5.0, conv6.0, fc7.0, fc8.
    """
    params = _to_mutable(hcn_params)

    def conv(torch_name, flax_name):
        _set(params, f"{flax_name}/kernel", conv2d_kernel(sd[f"{torch_name}.weight"]))
        _set(params, f"{flax_name}/bias", sd[f"{torch_name}.bias"])

    conv("conv1.0", "conv1")
    conv("conv2", "conv2")
    conv("conv3.0", "conv3")
    conv("conv4.0", "conv4")
    conv("conv1m.0", "conv1m")
    conv("conv2m", "conv2m")
    conv("conv3m.0", "conv3m")
    conv("conv4m.0", "conv4m")
    conv("conv5.0", "conv5")
    conv("conv6.0", "conv6")

    # fc7: torch flattens (N, C=256, H=2, W=2) channel-major; ours flattens
    # (N, 2, 2, 256) L-major -> permute kernel rows.
    w7 = sd["fc7.0.weight"]           # (512, 1024)
    perm = hcn_out7_perm()
    _set(params, "fc7/kernel", linear_kernel(w7[:, perm]))
    _set(params, "fc7/bias", sd["fc7.0.bias"])
    _set(params, "fc8/kernel", linear_kernel(sd["fc8.weight"]))
    _set(params, "fc8/bias", sd["fc8.bias"])
    return params


# ---------------------------------------------------------------------------
# Inflated ResNet-50 (NTU Visual)
# ---------------------------------------------------------------------------

def convert_visual(sd: Dict[str, np.ndarray], visual_params: Dict,
                   visual_stats: Dict) -> tuple:
    """NTU Visual checkpoint (keys 'cnn.*', 'classifier.*') -> flax
    (params, batch_stats) for models/ntu.py Visual."""
    params = _to_mutable(visual_params)
    stats = _to_mutable(visual_stats)

    def bn(torch_name, flax_name):
        p, s = bn_params(sd, torch_name)
        _set(params, f"{flax_name}/BatchNorm_0/scale", p["scale"])
        _set(params, f"{flax_name}/BatchNorm_0/bias", p["bias"])
        _set(stats, f"{flax_name}/BatchNorm_0/mean", s["mean"])
        _set(stats, f"{flax_name}/BatchNorm_0/var", s["var"])

    # stem (2D)
    _set(params, "cnn/conv1/kernel", conv2d_kernel(sd["cnn.conv1.weight"]))
    bn("cnn.bn1", "cnn/bn1")

    layers = [3, 4, 6, 3]
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            t = f"cnn.layer{stage}.{b}"
            f = f"cnn/layer{stage}_{b}"
            for ci in (1, 2, 3):
                _set(params, f"{f}/conv{ci}/kernel",
                     conv3d_kernel(sd[f"{t}.conv{ci}.weight"]))
                bn(f"{t}.bn{ci}", f"{f}/bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                _set(params, f"{f}/downsample_conv/kernel",
                     conv3d_kernel(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", f"{f}/downsample_bn")

    _set(params, "classifier/kernel", linear_kernel(sd["classifier.weight"]))
    _set(params, "classifier/bias", sd["classifier.bias"])
    return params, stats


def convert_resnext(sd: Dict[str, np.ndarray], params: Dict, stats: Dict,
                    layers=(3, 4, 23, 3)) -> tuple:
    """Ego ResNeXt-101 checkpoint -> flax (params, batch_stats) for
    models/resnext.py ResNeXt3D (keys conv1/bn1/layer{1..4}.{b}/fc)."""
    params = _to_mutable(params)
    stats = _to_mutable(stats)

    def bn(torch_name, flax_name):
        p, s = bn_params(sd, torch_name)
        _set(params, f"{flax_name}/BatchNorm_0/scale", p["scale"])
        _set(params, f"{flax_name}/BatchNorm_0/bias", p["bias"])
        _set(stats, f"{flax_name}/BatchNorm_0/mean", s["mean"])
        _set(stats, f"{flax_name}/BatchNorm_0/var", s["var"])

    _set(params, "conv1/kernel", conv3d_kernel(sd["conv1.weight"]))
    bn("bn1", "bn1")
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            t = f"layer{stage}.{b}"
            f = f"layer{stage}_{b}"
            for ci in (1, 2, 3):
                _set(params, f"{f}/conv{ci}/kernel",
                     conv3d_kernel(sd[f"{t}.conv{ci}.weight"]))
                bn(f"{t}.bn{ci}", f"{f}/bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                _set(params, f"{f}/downsample_conv/kernel",
                     conv3d_kernel(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", f"{f}/downsample_bn")
    _set(params, "fc/kernel", linear_kernel(sd["fc.weight"]))
    _set(params, "fc/bias", sd["fc.bias"])
    return params, stats


def convert_resnet50_inflated(sd_2d: Dict[str, np.ndarray],
                              visual_params: Dict, visual_stats: Dict,
                              inflation: str = "center") -> tuple:
    """torchvision ResNet-50 (2D) state dict -> flax (params, batch_stats)
    for models/ntu.py Visual, via 2D->3D kernel inflation.

    Mirrors the reference's ImageNet initialization of the NTU RGB backbone
    (imagenet_pretraining.py:26-67): every conv whose target is 5-D is
    inflated to the target's temporal extent ('center' zeroes all but the
    middle slice, exactly preserving the per-frame 2D response); the 2D stem
    maps directly; BN params AND running stats transfer unchanged; the
    ImageNet fc head is dropped (classifier stays at init).
    """
    params = _to_mutable(visual_params)
    stats = _to_mutable(visual_stats)

    def bn(torch_name, flax_name):
        p, s = bn_params(sd_2d, torch_name)
        _set(params, f"{flax_name}/BatchNorm_0/scale", p["scale"])
        _set(params, f"{flax_name}/BatchNorm_0/bias", p["bias"])
        _set(stats, f"{flax_name}/BatchNorm_0/mean", s["mean"])
        _set(stats, f"{flax_name}/BatchNorm_0/var", s["var"])

    def conv3d_inflated(torch_name, flax_path):
        node = params
        for part in flax_path.split("/"):
            node = node[part]
        time_dim = node["kernel"].shape[0]  # target (D, H, W, I, O)
        w3d = inflate_2d_to_3d(sd_2d[f"{torch_name}.weight"], time_dim,
                               inflation)
        _set(params, f"{flax_path}/kernel", conv3d_kernel(w3d))

    # 2D stem maps directly (our InflatedResNet50 keeps it 2D per frame)
    _set(params, "cnn/conv1/kernel", conv2d_kernel(sd_2d["conv1.weight"]))
    bn("bn1", "cnn/bn1")

    layers = [3, 4, 6, 3]
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            t = f"layer{stage}.{b}"
            f = f"cnn/layer{stage}_{b}"
            for ci in (1, 2, 3):
                conv3d_inflated(f"{t}.conv{ci}", f"{f}/conv{ci}")
                bn(f"{t}.bn{ci}", f"{f}/bn{ci}")
            if f"{t}.downsample.0.weight" in sd_2d:
                conv3d_inflated(f"{t}.downsample.0", f"{f}/downsample_conv")
                bn(f"{t}.downsample.1", f"{f}/downsample_bn")
    # fc.weight/bias intentionally dropped (imagenet_pretraining.py:41-44)
    return params, stats


# ---------------------------------------------------------------------------
# Whole-model MM-IMDB transplant (search net) — the full-net parity contract
# against the reference's own Searchable_Image_Text_Net
# (mmimdb_darts_searchable.py:57-133). Used by tests/test_full_model_parity.py
# to prove logits/gradient/trajectory parity, and usable to import a trained
# reference search checkpoint wholesale.
# ---------------------------------------------------------------------------

def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d 1x1 kernel (O, I, 1) -> Dense kernel (I, O)."""
    assert w.shape[-1] == 1
    return np.transpose(w[:, :, 0], (1, 0))


def ln2d_param(w: np.ndarray) -> np.ndarray:
    """torch nn.LayerNorm([C, L]) affine (C, L) -> our LayerNorm2D (L, C)."""
    return np.transpose(w, (1, 0))


def flatten_perm(C_total: int, L: int) -> np.ndarray:
    """Column permutation mapping our L-major flatten of (B, L, C) to the
    reference's channel-major flatten of (B, C, L) (model_search.py:67).
    ``perm[j]`` = torch column feeding our flattened column j = l*C + c."""
    j = np.arange(L * C_total)
    l, c = j // C_total, j % C_total
    return c * L + l


def _bn_into(params, stats, sd, torch_name, flax_name):
    p, s = bn_params(sd, torch_name)
    _set(params, f"{flax_name}/scale", p["scale"])
    _set(params, f"{flax_name}/bias", p["bias"])
    _set(stats, f"{flax_name}/mean", s["mean"])
    _set(stats, f"{flax_name}/var", s["var"])


def convert_searchable_mmimdb(sd: Dict[str, np.ndarray], params: Dict,
                              stats: Dict, *, C: int, L: int,
                              multiplier: int, node_steps: int,
                              node_multiplier: int, steps: int) -> tuple:
    """Reference Searchable_Image_Text_Net state dict -> flax
    (params, batch_stats) for models/mmimdb.SearchableImageTextNet.

    Layout fixups beyond the standard transposes:
      * every 1x1 Conv1d over the channel dim -> Dense kernel (conv1d_kernel);
      * every nn.LayerNorm([C, L]) affine -> transposed (L, C) (ln2d_param);
      * the classifier consumes the cell's flatten — channel-major in torch,
        L-major here — so its kernel rows are permuted (flatten_perm).
    """
    params = _to_mutable(params)
    stats = _to_mutable(stats)

    # image backbone: VGG-19 convs + bn4 + classifier (central/mmimdb.py:10-54)
    img_sd = {k[len("imagenet."):]: v for k, v in sd.items()
              if k.startswith("imagenet.")}
    params["imagenet"] = convert_vgg19(img_sd, params["imagenet"])
    _bn_into(params, stats, sd, "imagenet.bn4", "imagenet/bn4/BatchNorm_0")
    _set(params, "imagenet/classifier/kernel",
         linear_kernel(sd["imagenet.classifier.weight"]))
    _set(params, "imagenet/classifier/bias", sd["imagenet.classifier.bias"])

    # text backbone: MaxOut_MLP (central/mmimdb.py:74-94)
    for t, f in (("op1", "op1"), ("op3", "op3")):
        _set(params, f"textnet/{f}/Dense_0/kernel",
             linear_kernel(sd[f"textnet.{t}.lin.weight"]))
        _set(params, f"textnet/{f}/Dense_0/bias", sd[f"textnet.{t}.lin.bias"])
    _bn_into(params, stats, sd, "textnet.op2.0", "textnet/bn1/BatchNorm_0")
    _bn_into(params, stats, sd, "textnet.op4.0", "textnet/bn2/BatchNorm_0")
    _set(params, "textnet/hid2val/kernel",
         linear_kernel(sd["textnet.hid2val.weight"]))
    _set(params, "textnet/hid2val/bias", sd["textnet.hid2val.bias"])

    _convert_reshape_layers(sd, params, stats, 6)
    _convert_fusion_and_classifier(sd, params, stats, C=C, L=L,
                                   multiplier=multiplier,
                                   node_steps=node_steps,
                                   node_multiplier=node_multiplier,
                                   steps=steps)
    return params, stats


def _convert_reshape_layers(sd, params, stats, n: int) -> None:
    """ReshapeInputLayer / ReshapeInputLayer_MMIMDB stacks (conv1d + BN;
    aux_models.py:51-76, :87-115)."""
    for i in range(n):
        t = f"reshape_layers.{i}"
        if f"{t}.conv.weight" not in sd:
            continue  # found nets replace unused ones with nn.ReLU()
        f = f"reshape_{i}"
        _set(params, f"{f}/Dense_0/kernel", conv1d_kernel(sd[f"{t}.conv.weight"]))
        _set(params, f"{f}/Dense_0/bias", sd[f"{t}.conv.bias"])
        _bn_into(params, stats, sd, f"{t}.bn", f"{f}/BatchNorm_0/BatchNorm_0")


def _convert_fusion_and_classifier(sd, params, stats, *, C: int, L: int,
                                   multiplier: int, node_steps: int,
                                   node_multiplier: int, steps: int) -> None:
    """FusionNetwork supernet params + the flatten-permuted classifier —
    shared by every task net (model_search.py / node_search.py structure)."""
    # fusion cell: per-step inner nodes (node_search.py:12-70,
    # node_operations.py:9-120)
    for i in range(steps):
        t_node = f"fusion_net.cell._step_nodes.{i}.node_cell"
        f_node = f"fusion_net/cell/step_node_{i}"
        for j in range(node_steps):
            t_mix = f"{t_node}.node_ops.{j}._ops"
            f_mix = f"{f_node}/NodeMixedOp_{j}"
            # _ops.1 = ScaledDotAttn (ln only)
            _set(params, f"{f_mix}/ScaledDotAttn_0/LayerNorm2D_0/scale",
                 ln2d_param(sd[f"{t_mix}.1.ln.weight"]))
            _set(params, f"{f_mix}/ScaledDotAttn_0/LayerNorm2D_0/bias",
                 ln2d_param(sd[f"{t_mix}.1.ln.bias"]))
            # _ops.2 = LinearGLU
            _set(params, f"{f_mix}/LinearGLU_0/Dense_0/kernel",
                 conv1d_kernel(sd[f"{t_mix}.2.conv.weight"]))
            _set(params, f"{f_mix}/LinearGLU_0/Dense_0/bias",
                 sd[f"{t_mix}.2.conv.bias"])
            _bn_into(params, stats, sd, f"{t_mix}.2.bn",
                     f"{f_mix}/LinearGLU_0/BatchNorm_0/BatchNorm_0")
            # _ops.3 = ConcatFC
            _set(params, f"{f_mix}/ConcatFC_0/Dense_0/kernel",
                 conv1d_kernel(sd[f"{t_mix}.3.conv.weight"]))
            _set(params, f"{f_mix}/ConcatFC_0/Dense_0/bias",
                 sd[f"{t_mix}.3.conv.bias"])
            _bn_into(params, stats, sd, f"{t_mix}.3.bn",
                     f"{f_mix}/ConcatFC_0/BatchNorm_0/BatchNorm_0")
        if node_multiplier != 1:
            _set(params, f"{f_node}/Dense_0/kernel",
                 conv1d_kernel(sd[f"{t_node}.out_conv.weight"]))
            _set(params, f"{f_node}/Dense_0/bias", sd[f"{t_node}.out_conv.bias"])
            _bn_into(params, stats, sd, f"{t_node}.bn",
                     f"{f_node}/BatchNorm_0/BatchNorm_0")
        _set(params, f"{f_node}/LayerNorm2D_0/scale",
             ln2d_param(sd[f"{t_node}.ln.weight"]))
        _set(params, f"{f_node}/LayerNorm2D_0/bias",
             ln2d_param(sd[f"{t_node}.ln.bias"]))

    # cell output LayerNorm([C*multiplier, L]) (model_search.py:27)
    _set(params, "fusion_net/cell/LayerNorm2D_0/scale",
         ln2d_param(sd["fusion_net.cell.ln.weight"]))
    _set(params, "fusion_net/cell/LayerNorm2D_0/bias",
         ln2d_param(sd["fusion_net.cell.ln.bias"]))

    # classifier over the flatten (column-permuted)
    perm = flatten_perm(C * multiplier, L)
    _set(params, "central_classifier/kernel",
         linear_kernel(sd["central_classifier.weight"][:, perm]))
    _set(params, "central_classifier/bias", sd["central_classifier.bias"])


def convert_searchable_ntu(sd: Dict[str, np.ndarray], params: Dict,
                           stats: Dict, *, C: int, L: int, multiplier: int,
                           node_steps: int, node_multiplier: int,
                           steps: int) -> tuple:
    """Reference Searchable_Skeleton_Image_Net state dict -> flax
    (params, batch_stats) for models/ntu.SearchableSkeletonImageNet
    (ntu_darts_searchable.py:71-178): inflated-ResNet Visual + HCN Skeleton
    via the checkpoint converters, 8 reshape layers, the shared fusion cell
    (node_steps=2, node_multiplier=2 at reference defaults) and the
    flatten-permuted classifier."""
    params = _to_mutable(params)
    stats = _to_mutable(stats)
    rgb_sd = {k[len("rgbnet."):]: v for k, v in sd.items()
              if k.startswith("rgbnet.")}
    params["rgbnet"], stats["rgbnet"] = convert_visual(
        rgb_sd, params["rgbnet"], stats["rgbnet"])
    ske_sd = {k[len("skenet."):]: v for k, v in sd.items()
              if k.startswith("skenet.")}
    params["skenet"] = convert_hcn(ske_sd, params["skenet"])
    _convert_reshape_layers(sd, params, stats, 8)
    # reshape_6 consumes HCN's flattened out7 (ntu_darts_searchable.py:
    # 126-128) — channel-major in torch, L-major here; permute its conv's
    # input dim like the fc7 converter does.
    if "reshape_layers.6.conv.weight" in sd:
        w6 = sd["reshape_layers.6.conv.weight"][:, hcn_out7_perm(), :]
        _set(params, "reshape_6/Dense_0/kernel", conv1d_kernel(w6))
    _convert_fusion_and_classifier(sd, params, stats, C=C, L=L,
                                   multiplier=multiplier,
                                   node_steps=node_steps,
                                   node_multiplier=node_multiplier,
                                   steps=steps)
    return params, stats


def convert_searchable_ego(sd: Dict[str, np.ndarray], params: Dict,
                           stats: Dict, *, C: int, L: int, multiplier: int,
                           node_steps: int, node_multiplier: int,
                           steps: int) -> tuple:
    """Reference Searchable_RGB_Depth_Net state dict -> flax
    (params, batch_stats) for models/ego.SearchableRGBDepthNet
    (ego_darts_searchable.py:72-180): two ResNeXt-101 backbones (RGB with the
    (3,7,7) first-conv surgery, Depth with the 1-channel stem —
    central/ego.py:296-312), 8 reshape layers, the shared fusion supernet and
    the flatten-permuted classifier."""
    params = _to_mutable(params)
    stats = _to_mutable(stats)
    for prefix in ("rgb_net", "depth_net"):
        sub = {k[len(prefix) + 1:]: v for k, v in sd.items()
               if k.startswith(prefix + ".")}
        params[prefix], stats[prefix] = convert_resnext(
            sub, params[prefix], stats[prefix])
    _convert_reshape_layers(sd, params, stats, 8)
    _convert_fusion_and_classifier(sd, params, stats, C=C, L=L,
                                   multiplier=multiplier,
                                   node_steps=node_steps,
                                   node_multiplier=node_multiplier,
                                   steps=steps)
    return params, stats


def convert_arch_params(torch_arch, steps: int) -> Dict[str, np.ndarray]:
    """Reference arch_parameters() list [alphas, beta_0, gamma_0, beta_1, ...]
    (model_search.py:91) -> our arch pytree {alphas, betas, gammas}
    (supernet.init_arch_params shapes)."""
    # np.array(copy=True): _np() returns a VIEW of the torch tensor's memory;
    # without the copy, a later in-place torch optimizer step would silently
    # mutate the returned pytree (jnp.asarray is zero-copy on CPU).
    alphas = np.array(_np(torch_arch[0]), copy=True)
    betas = np.stack([_np(torch_arch[1 + 2 * i]) for i in range(steps)])
    gammas = np.stack([_np(torch_arch[2 + 2 * i]) for i in range(steps)])
    return {"alphas": alphas, "betas": betas, "gammas": gammas}


# ---------------------------------------------------------------------------
# Task-level loaders
# ---------------------------------------------------------------------------

def load_ntu_backbones(task_params: Any, task_stats: Any, ske_path: str,
                       rgb_path: str) -> tuple:
    """Load both NTU backbone checkpoints into a task-net pytree.

    Returns ``(params, batch_stats)`` with prefixes 'skenet' (HCN, no BN) and
    'rgbnet' (Visual, incl. BN running stats). The reference loads the full
    state_dict — running_mean/var included (ntu_darts_searchable.py:32-36) —
    so eval-mode forwards see pretrained statistics, not init values.
    """
    params = dict(task_params)
    stats = dict(task_stats)
    ske_sd = load_torch_state_dict(ske_path)
    params["skenet"] = convert_hcn(ske_sd, params["skenet"])
    rgb_sd = load_torch_state_dict(rgb_path)
    params["rgbnet"], stats["rgbnet"] = convert_visual(
        rgb_sd, params["rgbnet"], stats["rgbnet"])
    return params, stats
