"""GSPMD data-parallel tests on the 8-device virtual CPU mesh.

Validates the reference's --parallel contract (DataParallel semantics,
SURVEY.md §2.5): batch sharded over 'data', state replicated, arch params
updating identically everywhere, and single-device vs 8-device numerics
agreeing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.models.mmimdb import (
    MMIMDB_FROZEN_PREFIXES,
    SearchableImageTextNet,
)
from bmnas_tpu.models.supernet import init_arch_params
from bmnas_tpu.parallel.mesh import make_parallel_context, pad_batch_to_multiple
from bmnas_tpu.search.bilevel import (
    TrainState,
    bce_with_logits,
    build_step_functions,
    make_arch_optimizer,
    make_param_labels,
    make_weight_optimizer,
)
from bmnas_tpu.utils.metrics import multilabel_counts

CFG = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1, node_multiplier=1,
           num_input_nodes=6, num_keep_edges=2, num_outputs=5, drpt=0.0)


def counts_fn(logits, labels, mask):
    preds = (jax.nn.sigmoid(logits) > 0.3).astype(jnp.float32)
    return multilabel_counts(preds, labels, mask)


def make_batch(b):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        "text": jnp.asarray(rng.randn(b, 300).astype(np.float32)),
        "label": jnp.asarray((rng.rand(b, 5) < 0.3).astype(np.float32)),
        "mask": jnp.ones((b,), np.float32),
    }


def build(batch):
    model = SearchableImageTextNet(**CFG)
    arch = init_arch_params(jax.random.PRNGKey(1), CFG["steps"],
                            CFG["num_input_nodes"], CFG["node_steps"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(2)},
        batch, arch, True)
    labels = make_param_labels(variables["params"], MMIMDB_FROZEN_PREFIXES)
    w_tx = make_weight_optimizer(labels, weight_decay=1e-4)
    arch_tx = make_arch_optimizer(3e-4, 1e-3)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        arch=arch, opt_w=w_tx.init(variables["params"]),
        opt_arch=arch_tx.init(arch), rng=jax.random.PRNGKey(7),
        step=jnp.asarray(0, jnp.int32))

    def apply_fn(vs, b, a, train, rngs, mutable):
        if mutable:
            return model.apply(vs, b, a, train, rngs=rngs, mutable=mutable)
        return model.apply(vs, b, a, train)

    fns = build_step_functions(apply_fn, bce_with_logits, counts_fn,
                               w_tx, arch_tx, donate=False)
    return state, fns


class TestDataParallel:
    def test_mesh_has_8_devices(self):
        ctx = make_parallel_context()
        assert ctx.num_devices == 8

    def test_pad_batch(self):
        assert pad_batch_to_multiple(96, 8) == 96
        assert pad_batch_to_multiple(10, 8) == 16

    def test_sharded_step_matches_single_device(self):
        # This test compiles the supernet step twice (single-device and
        # 8-device GSPMD). Late in a full-suite run the accumulated XLA/LLVM
        # compile state can abort the process (observed SIGABRT inside
        # backend_compile_and_load), so shed caches first for isolation.
        jax.clear_caches()
        batch = make_batch(8)
        state, fns = build(batch)
        # single device
        s1, c1 = fns.weight_step(state, batch, jnp.asarray(1e-3))
        s1, c1a = fns.arch_step(s1, batch)

        # 8-device mesh: replicate state, shard batch
        ctx = make_parallel_context()
        state8 = ctx.replicate(state)
        batch8 = ctx.shard_batch(batch)
        s2, c2 = fns.weight_step(state8, batch8, jnp.asarray(1e-3))
        s2, c2a = fns.arch_step(s2, batch8)

        np.testing.assert_allclose(np.asarray(c1["loss_sum"]),
                                   np.asarray(c2["loss_sum"]), rtol=1e-5)
        for k in ("tp", "fp", "fn"):
            np.testing.assert_allclose(np.asarray(c1a[k]), np.asarray(c2a[k]))
        # Arch params can differ by up to one full Adam step between device
        # layouts: at t=1 the update is ~lr*sign(grad) and reduction-order
        # noise on near-zero grads can flip the sign. Bound by 2*lr instead
        # of exact equality (losses/counts above ARE bitwise-comparable).
        for a1, a2 in zip(jax.tree_util.tree_leaves(s1.arch),
                          jax.tree_util.tree_leaves(s2.arch)):
            np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                       atol=2 * 3e-4 + 1e-6)

    def test_graft_dryrun(self):
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)
