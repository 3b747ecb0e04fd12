"""Whole-model numerical parity against the ACTUAL PyTorch reference.

Imports the reference's own ``Searchable_Image_Text_Net`` (incl. its
``FusionNetwork`` supernet) from /root/reference, transplants one set of
randomly-initialized weights + arch params into our flax model via
``utils.torch_convert.convert_searchable_mmimdb``, and asserts:

  (a) full-net logits match in eval mode AND in train mode (BN batch stats);
  (b) alpha/beta/gamma gradients match on one arch (dev) step;
  (c) 3 hand-rolled bilevel steps (weight Adam update + arch Adam update,
      mirroring train_searchable/mmimdb.py:77-99 + architect.py:21-29) from
      identical weights keep arch params numerically close and derive the
      IDENTICAL genotype.

Dropout is deterministically disabled on both sides for the comparisons
(torch: Dropout modules forced to eval inside model.train(); flax: an
``intercept_methods`` hook that makes nn.Dropout the identity) — the two
frameworks cannot share dropout masks. Everything else (BN train-mode batch
statistics, LayerNorms, the mixed-op relaxations, the classifier over the
flatten) runs the full production code path on both sides.

Requires /root/reference to be present; skipped otherwise. torchvision is not
installed here, so the reference's ``tmodels.vgg19(pretrained='imagenet')``
(central/mmimdb.py:15) is satisfied with a stub exposing the identical cfg-E
``features`` stack (random init — parity needs no pretrained weights).
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

CFG = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1, node_multiplier=1,
           num_input_nodes=6, num_keep_edges=2, num_outputs=5, drpt=0.1)
B, HW = 4, 64

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _make_vgg_features():
    layers, c_in = [], 3
    for v in VGG19_CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(c_in, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            c_in = v
    return torch.nn.Sequential(*layers)


@pytest.fixture(scope="module")
def ref_module():
    """Import the reference package with a torchvision stub (no network)."""
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    tvm = types.ModuleType("torchvision.models")
    tvt = types.ModuleType("torchvision.transforms")

    class _Shell(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _make_vgg_features()

    tvm.vgg19 = lambda pretrained=None, **kw: _Shell()
    tv.models, tv.transforms = tvm, tvt
    saved = {k: sys.modules.get(k) for k in
             ("torchvision", "torchvision.models", "torchvision.transforms")}
    sys.modules.update({"torchvision": tv, "torchvision.models": tvm,
                        "torchvision.transforms": tvt})
    sys.path.insert(0, REF)
    try:
        import models.search.mmimdb_darts_searchable as ref_mm
        yield ref_mm
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _no_dropout_interceptor(next_fn, args, kwargs, context):
    import flax.linen as nn
    if isinstance(context.module, nn.Dropout):
        return args[0]
    return next_fn(*args, **kwargs)


def _torch_disable_dropout(net):
    # forward -> x.clone(), not .eval(): an eval-mode Dropout returns its
    # input ALIASED, and the reference's in-place residual (`out += x`,
    # node_search.py:67) would then mutate a tensor the backward pass needs
    # (only reachable with dropout disabled — real training is safe).
    for m in net.modules():
        if isinstance(m, torch.nn.modules.dropout._DropoutNd):
            m.forward = (lambda x: x.clone())


def _batches(seed=0):
    r = np.random.RandomState(seed)
    out = []
    for i in range(4):
        out.append({
            "image": r.randn(B, HW, HW, 3).astype(np.float32),
            "text": r.randn(B, 300).astype(np.float32),
            "label": (r.rand(B, CFG["num_outputs"]) < 0.3).astype(np.float32),
            "mask": np.ones((B,), np.float32),
        })
    return out


@pytest.fixture(scope="module")
def nets(ref_module):
    """(torch net, flax model, transplanted variables, arch pytree)."""
    from bmnas_tpu.models.mmimdb import SearchableImageTextNet
    from bmnas_tpu.models.supernet import init_arch_params
    from bmnas_tpu.utils.torch_convert import (
        convert_arch_params,
        convert_searchable_mmimdb,
    )

    torch.manual_seed(3)
    args = types.SimpleNamespace(parallel=False, **CFG)
    tnet = ref_module.Searchable_Image_Text_Net(
        args, torch.nn.BCEWithLogitsLoss())

    model = SearchableImageTextNet(**CFG)
    arch0 = init_arch_params(jax.random.PRNGKey(1), CFG["steps"],
                             CFG["num_input_nodes"], CFG["node_steps"])
    batch = _batches()[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(2)},
        batch, arch0, True)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, stats = convert_searchable_mmimdb(
        sd, variables["params"], variables["batch_stats"],
        C=CFG["C"], L=CFG["L"], multiplier=CFG["multiplier"],
        node_steps=CFG["node_steps"], node_multiplier=CFG["node_multiplier"],
        steps=CFG["steps"])
    arch = convert_arch_params(tnet.arch_parameters(), CFG["steps"])
    arch = {k: jnp.asarray(v) for k, v in arch.items()}
    return tnet, model, {"params": params, "batch_stats": stats}, arch


def _torch_forward(tnet, batch):
    text = torch.from_numpy(batch["text"])
    image = torch.from_numpy(batch["image"].transpose(0, 3, 1, 2))
    return tnet((text, image))


def test_eval_logits_match(nets):
    """(a) eval mode: running stats, no dropout."""
    import flax.linen as nn
    tnet, model, variables, arch = nets
    batch = _batches()[0]
    tnet.eval()
    with torch.no_grad():
        want = _torch_forward(tnet, batch).numpy()
    got = np.asarray(model.apply(variables, batch, arch, False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_train_logits_match(nets):
    """(a) train mode: BN batch statistics drive every norm layer."""
    import flax.linen as nn
    tnet, model, variables, arch = nets
    batch = _batches()[0]
    tnet.train()
    _torch_disable_dropout(tnet)
    with torch.no_grad():
        want = _torch_forward(tnet, batch).numpy()
    with nn.intercept_methods(_no_dropout_interceptor):
        got, _ = model.apply(
            variables, batch, arch, True,
            rngs={"dropout": jax.random.PRNGKey(9)}, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-4)


def test_arch_gradients_match(nets):
    """(b) d loss / d {alpha, beta, gamma} on one train-mode dev batch
    (the architect step's differentiable path, architect.py:21-29)."""
    import flax.linen as nn
    tnet, model, variables, arch = nets
    batch = _batches(seed=5)[1]

    tnet.train()
    _torch_disable_dropout(tnet)
    for p in tnet.arch_parameters():
        if p.grad is not None:
            p.grad = None
    crit = torch.nn.BCEWithLogitsLoss()
    loss = crit(_torch_forward(tnet, batch),
                torch.from_numpy(batch["label"]))
    loss.backward()
    ta = tnet.arch_parameters()  # [alphas, b0, g0, b1, g1]
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
        from bmnas_tpu.search.bilevel import bce_with_logits
        return bce_with_logits(logits, jnp.asarray(batch["label"]),
                               jnp.asarray(batch["mask"]))

    got = jax.grad(arch_loss)(arch)
    for k in ("alphas", "betas", "gammas"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=2e-3, atol=1e-6, err_msg=k)


def test_bilevel_trajectory_matches(nets):
    """(c) 3 bilevel steps (weight Adam + arch Adam, reference hyperparams)
    from identical weights -> same genotype, arch params still close."""
    import flax.linen as nn

    from bmnas_tpu.models.supernet import derive_genotype_from_arch
    from bmnas_tpu.search.bilevel import (
        TrainState,
        bce_with_logits,
        build_step_functions,
        make_arch_optimizer,
        make_param_labels,
        make_weight_optimizer,
    )

    tnet, model, variables, arch = nets
    etas = [1e-3, 9e-4, 8e-4]
    batches = _batches(seed=11)
    train_b, dev_b = batches[0], batches[1]

    # ---- torch side: the reference's loop, hand-rolled ------------------
    # (weight Adam over central_params with per-batch lr, then architect
    #  step = arch Adam over arch_parameters on the dev batch)
    torch.manual_seed(0)
    crit = torch.nn.BCEWithLogitsLoss()
    w_opt = torch.optim.Adam(tnet.central_params(), lr=etas[0],
                             weight_decay=1e-4)
    a_opt = torch.optim.Adam(tnet.arch_parameters(), lr=3e-4,
                             betas=(0.5, 0.999), weight_decay=1e-3)
    tnet.train()
    _torch_disable_dropout(tnet)
    for eta in etas:
        for g in w_opt.param_groups:
            g["lr"] = eta
        w_opt.zero_grad()
        crit(_torch_forward(tnet, train_b),
             torch.from_numpy(train_b["label"])).backward()
        w_opt.step()
        a_opt.zero_grad()
        crit(_torch_forward(tnet, dev_b),
             torch.from_numpy(dev_b["label"])).backward()
        a_opt.step()
    ta = tnet.arch_parameters()
    want_arch = {
        "alphas": ta[0].detach().numpy(),
        "betas": np.stack([ta[1].detach().numpy(), ta[3].detach().numpy()]),
        "gammas": np.stack([ta[2].detach().numpy(), ta[4].detach().numpy()]),
    }
    want_genotype = tnet.genotype()

    # ---- flax side: the production step functions -----------------------
    def apply_fn(vs, batch, a, train, rngs, mutable):
        if mutable:
            return model.apply(vs, batch, a, train, rngs=rngs,
                               mutable=mutable)
        return model.apply(vs, batch, a, train)

    labels = make_param_labels(variables["params"], ("imagenet", "textnet"))
    w_tx = make_weight_optimizer(labels, weight_decay=1e-4)
    arch_tx = make_arch_optimizer(3e-4, 1e-3)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        arch=arch, opt_w=w_tx.init(variables["params"]),
        opt_arch=arch_tx.init(arch), rng=jax.random.PRNGKey(7),
        step=jnp.asarray(0, jnp.int32))
    fns = build_step_functions(apply_fn, bce_with_logits,
                               lambda l, y, m: {}, w_tx, arch_tx,
                               donate=False)
    with nn.intercept_methods(_no_dropout_interceptor):
        for eta in etas:
            state, _ = fns.weight_step(state, train_b, np.float32(eta))
            state, _ = fns.arch_step(state, dev_b)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x), state.arch)  # force inside ctx

    for k in ("alphas", "betas", "gammas"):
        np.testing.assert_allclose(np.asarray(state.arch[k]), want_arch[k],
                                   rtol=5e-3, atol=5e-6, err_msg=k)

    got_genotype = derive_genotype_from_arch(
        state.arch, CFG["steps"], CFG["multiplier"],
        CFG["num_input_nodes"], CFG["node_steps"], CFG["node_multiplier"])
    assert [tuple(e) for e in got_genotype.edges] == \
        [tuple(e) for e in want_genotype.edges]
    assert list(got_genotype.concat) == list(want_genotype.concat)
    for gs, ws in zip(got_genotype.steps, want_genotype.steps):
        assert [tuple(e) for e in gs.inner_edges] == \
            [tuple(e) for e in ws.inner_edges]
        assert list(gs.inner_steps) == list(ws.inner_steps)
        assert list(gs.inner_concat) == list(ws.inner_concat)
