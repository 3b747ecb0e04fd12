"""Whole-model parity for the EgoGesture task net against the PyTorch
reference.

Companion to test_full_model_parity.py (MM-IMDB) and
test_full_model_parity_ntu.py: imports the reference's own
``Searchable_RGB_Depth_Net`` (ego_darts_searchable.py:72-180 — two
ResNeXt-101-3D backbones incl. the first-conv surgeries: RGB (3,7,7) stem
via _modify_first_conv_layer, Depth 1-channel stem via
_construct_depth_model, central/ego.py:296-312), transplants one random-init
weight set via ``convert_searchable_ego``, and asserts full-net logits
parity and alpha/beta/gamma arch-gradient parity at the reference's
node_steps=3/node_multiplier=3 fusion shape.

The ego BN quirk (backbones forced to eval() on every forward,
ego_darts_searchable.py:122-128) is part of what's under test: both sides
run backbone BN on running stats even in train mode, so the train-mode
arch-gradient comparison is exact up to fp32 accumulation.

Input is 8x32x32 so the reference's fixed AvgPool3d((ceil(T/16),
ceil(S/32)^2)) (central/ego.py:112-116) covers the whole x4 extent —
matching our global-mean pooled tap (models/resnext.py:97).
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")

import torch  # noqa: E402

from test_full_model_parity import (  # noqa: E402
    _no_dropout_interceptor,
    _torch_disable_dropout,
)

CFG = dict(C=8, L=4, steps=2, multiplier=2, node_steps=3, node_multiplier=3,
           num_input_nodes=8, num_keep_edges=2, num_outputs=6, drpt=0.0)
B, T, HW = 2, 8, 32


def _batch(seed=0):
    r = np.random.RandomState(seed)
    return {
        "rgb": r.rand(B, T, HW, HW, 3).astype(np.float32),
        "depth": r.rand(B, T, HW, HW, 1).astype(np.float32),
        "label": r.randint(0, CFG["num_outputs"], size=(B,)).astype(np.int32),
        "mask": np.ones((B,), np.float32),
    }


@pytest.fixture(scope="module")
def nets():
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    tvm = types.ModuleType("torchvision.models")
    tvt = types.ModuleType("torchvision.transforms")
    tv.models, tv.transforms = tvm, tvt
    saved = {k: sys.modules.get(k) for k in
             ("torchvision", "torchvision.models", "torchvision.transforms")}
    sys.modules.update({"torchvision": tv, "torchvision.models": tvm,
                        "torchvision.transforms": tvt})
    sys.path.insert(0, REF)
    try:
        import models.search.ego_darts_searchable as ref_ego

        from bmnas_tpu.models.ego import SearchableRGBDepthNet
        from bmnas_tpu.models.supernet import init_arch_params
        from bmnas_tpu.utils.torch_convert import (
            convert_arch_params,
            convert_searchable_ego,
        )

        torch.manual_seed(7)
        args = types.SimpleNamespace(parallel=False, **CFG)
        # the subset of parse_opts (models/utils.py:125-217) generate_model
        # reads; sample_size/duration sized to the test input (see module doc)
        opt = types.SimpleNamespace(
            n_classes=CFG["num_outputs"], resnet_shortcut="B",
            resnext_cardinality=32, sample_size=HW, sample_duration=T,
            model="resnext101", modality="RGB")
        tnet = ref_ego.Searchable_RGB_Depth_Net(
            args, opt, torch.nn.CrossEntropyLoss())

        model = SearchableRGBDepthNet(**CFG)
        arch0 = init_arch_params(jax.random.PRNGKey(1), CFG["steps"],
                                 CFG["num_input_nodes"], CFG["node_steps"])
        batch = _batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(2)}, batch, arch0, True)
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        params, stats = convert_searchable_ego(
            sd, variables["params"], variables["batch_stats"],
            C=CFG["C"], L=CFG["L"], multiplier=CFG["multiplier"],
            node_steps=CFG["node_steps"],
            node_multiplier=CFG["node_multiplier"], steps=CFG["steps"])
        arch = {k: jnp.asarray(v) for k, v in convert_arch_params(
            tnet.arch_parameters(), CFG["steps"]).items()}
        yield tnet, model, {"params": params, "batch_stats": stats}, arch
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _torch_forward(tnet, batch):
    rgb = torch.from_numpy(batch["rgb"].transpose(0, 4, 1, 2, 3))
    depth = torch.from_numpy(batch["depth"].transpose(0, 4, 1, 2, 3))
    return tnet((rgb, depth))


def test_eval_logits_match(nets):
    tnet, model, variables, arch = nets
    batch = _batch()
    tnet.eval()
    with torch.no_grad():
        want = _torch_forward(tnet, batch).numpy()
    got = np.asarray(model.apply(variables, batch, arch, False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


def test_arch_gradients_match(nets):
    import flax.linen as nn
    tnet, model, variables, arch = nets
    batch = _batch(seed=3)

    tnet.train()
    _torch_disable_dropout(tnet)
    for p in tnet.arch_parameters():
        p.grad = None
    crit = torch.nn.CrossEntropyLoss()
    loss = crit(_torch_forward(tnet, batch),
                torch.from_numpy(batch["label"]).long())
    loss.backward()
    ta = tnet.arch_parameters()
    want = {
        "alphas": ta[0].grad.numpy(),
        "betas": np.stack([ta[1].grad.numpy(), ta[3].grad.numpy()]),
        "gammas": np.stack([ta[2].grad.numpy(), ta[4].grad.numpy()]),
    }

    def arch_loss(a):
        with nn.intercept_methods(_no_dropout_interceptor):
            logits, _ = model.apply(
                variables, batch, a, True,
                rngs={"dropout": jax.random.PRNGKey(9)},
                mutable=["batch_stats"])
        from bmnas_tpu.search.bilevel import cross_entropy
        return cross_entropy(logits, jnp.asarray(batch["label"]),
                             jnp.asarray(batch["mask"]))

    got = jax.grad(arch_loss)(arch)
    # backbone BN runs on running stats here (ego eval-pinned quirk), so the
    # remaining divergence is fp32 accumulation through 2x 101-layer conv
    # stacks — norm-relative error + direction, as in the NTU harness.
    for k in ("alphas", "betas", "gammas"):
        g, w = np.asarray(got[k]).ravel(), want[k].ravel()
        scale = np.abs(w).max()
        assert np.abs(g - w).max() <= 2e-2 * scale, (
            k, np.abs(g - w).max(), scale)
        cos = float(g @ w / (np.linalg.norm(g) * np.linalg.norm(w)))
        assert cos >= 0.999, (k, cos)
