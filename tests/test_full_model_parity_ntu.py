"""Whole-model parity for the NTU task net against the PyTorch reference.

Companion to test_full_model_parity.py (MM-IMDB): imports the reference's
``Searchable_Skeleton_Image_Net`` (inflated-3D ResNet-50 Visual + HCN
Skeleton + 8 reshape layers + the node_steps=2/node_multiplier=2 fusion
supernet), transplants one random-init weight set via
``convert_searchable_ntu``, and asserts full-net logits parity and
alpha/beta/gamma gradient parity.

The reference's ``inflated_resnet()`` downloads ImageNet weights at
construction (imagenet_pretraining.py:63-67) — stubbed to keep random init
(parity needs no pretrained weights; zero-egress environment anyway).
Input is 224x224x8 frames because the reference hard-codes
``AvgPool3d((8, 7, 7))`` for the temporal pooling (central/ntu.py:12).
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

CFG = dict(C=8, L=4, steps=2, multiplier=2, node_steps=2, node_multiplier=2,
           num_input_nodes=8, num_keep_edges=2, num_outputs=6, drpt=0.0)
B, HW = 2, 224


def _batch(seed=0):
    r = np.random.RandomState(seed)
    return {
        "image": r.rand(B, 8, HW, HW, 3).astype(np.float32),
        "skeleton": r.randn(B, 32, 25, 2, 3).astype(np.float32),
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
    import models.auxiliary.inflated_resnet as ref_ir
    orig_load = ref_ir.load_pretrained_2D_weights
    ref_ir.load_pretrained_2D_weights = lambda *a, **k: None
    try:
        import models.search.ntu_darts_searchable as ref_ntu

        from bmnas_tpu.models.ntu import SearchableSkeletonImageNet
        from bmnas_tpu.models.supernet import init_arch_params
        from bmnas_tpu.utils.torch_convert import (
            convert_arch_params,
            convert_searchable_ntu,
        )

        torch.manual_seed(5)
        args = types.SimpleNamespace(parallel=False, **CFG)
        tnet = ref_ntu.Searchable_Skeleton_Image_Net(
            args, torch.nn.CrossEntropyLoss(), None)

        model = SearchableSkeletonImageNet(**CFG)
        arch0 = init_arch_params(jax.random.PRNGKey(1), CFG["steps"],
                                 CFG["num_input_nodes"], CFG["node_steps"])
        batch = _batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(2)}, batch, arch0, True)
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        params, stats = convert_searchable_ntu(
            sd, variables["params"], variables["batch_stats"],
            C=CFG["C"], L=CFG["L"], multiplier=CFG["multiplier"],
            node_steps=CFG["node_steps"],
            node_multiplier=CFG["node_multiplier"], steps=CFG["steps"])
        arch = {k: jnp.asarray(v) for k, v in convert_arch_params(
            tnet.arch_parameters(), CFG["steps"]).items()}
        yield tnet, model, {"params": params, "batch_stats": stats}, arch
    finally:
        ref_ir.load_pretrained_2D_weights = orig_load
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _torch_forward(tnet, batch):
    image = torch.from_numpy(batch["image"])                  # (B,T,W,H,C)
    ske = torch.from_numpy(batch["skeleton"].transpose(0, 4, 1, 2, 3))
    return tnet((image, ske))


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
    # fp32 accumulation through the 50-layer 3D convnet with train-mode BN
    # (batch stats divide activations) leaves ~1e-4 absolute grad noise
    # between frameworks; check norm-relative error + direction instead of
    # elementwise rtol on near-zero entries.
    for k in ("alphas", "betas", "gammas"):
        g, w = np.asarray(got[k]).ravel(), want[k].ravel()
        scale = np.abs(w).max()
        assert np.abs(g - w).max() <= 2e-2 * scale, (
            k, np.abs(g - w).max(), scale)
        cos = float(g @ w / (np.linalg.norm(g) * np.linalg.norm(w)))
        assert cos >= 0.999, (k, cos)
