"""End-to-end bilevel search on a tiny synthetic MM-IMDB-shaped task.

Covers: supernet init, weight step (frozen backbones), arch step (only arch
moves), genotype derivation, found-net compile + forward. This is the
miniature of the reference's search->found round trip (SURVEY.md §7 step 5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.models.mmimdb import (
    MMIMDB_FROZEN_PREFIXES,
    FoundImageTextNet,
    SearchableImageTextNet,
)
from bmnas_tpu.models.supernet import init_arch_params, derive_genotype_from_arch
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
           num_input_nodes=6, num_keep_edges=2, num_outputs=5, drpt=0.1)


def synthetic_batch(b=2, key=0):
    rng = np.random.RandomState(key)
    return {
        "image": jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        "text": jnp.asarray(rng.randn(b, 300).astype(np.float32)),
        "label": jnp.asarray((rng.rand(b, 5) < 0.3).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def setup():
    model = SearchableImageTextNet(**CFG)
    rng = jax.random.PRNGKey(0)
    arch = init_arch_params(rng, CFG["steps"], CFG["num_input_nodes"],
                            CFG["node_steps"])
    batch = synthetic_batch()
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(1)}, batch, arch, True
    )
    return model, variables, arch, batch


def make_apply(model):
    def apply_fn(variables, batch, arch, train, rngs, mutable):
        if mutable:
            return model.apply(variables, batch, arch, train,
                               rngs=rngs, mutable=mutable)
        return model.apply(variables, batch, arch, train)
    return apply_fn


def counts_fn(logits, labels, mask):
    preds = (jax.nn.sigmoid(logits) > 0.3).astype(jnp.float32)
    return multilabel_counts(preds, labels, mask)


def make_state(model, variables, arch):
    labels = make_param_labels(variables["params"], MMIMDB_FROZEN_PREFIXES)
    w_tx = make_weight_optimizer(labels, weight_decay=1e-4)
    arch_tx = make_arch_optimizer(3e-4, 1e-3)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        arch=arch,
        opt_w=w_tx.init(variables["params"]),
        opt_arch=arch_tx.init(arch),
        rng=jax.random.PRNGKey(7),
        step=jnp.asarray(0, jnp.int32),
    )
    fns = build_step_functions(make_apply(model), bce_with_logits, counts_fn,
                               w_tx, arch_tx, donate=False)
    return state, fns


class TestBilevel:
    def test_weight_step_updates_central_only(self, setup):
        model, variables, arch, batch = setup
        state, fns = make_state(model, variables, arch)
        new_state, counts = fns.weight_step(state, batch, jnp.asarray(1e-3))
        assert np.isfinite(float(counts['loss_sum']))
        # frozen backbones unchanged
        for prefix in MMIMDB_FROZEN_PREFIXES:
            old = jax.tree_util.tree_leaves(state.params[prefix])
            new = jax.tree_util.tree_leaves(new_state.params[prefix])
            for o, n in zip(old, new):
                np.testing.assert_array_equal(np.asarray(o), np.asarray(n))
        # central moved
        moved = any(
            not np.allclose(np.asarray(o), np.asarray(n))
            for o, n in zip(
                jax.tree_util.tree_leaves(state.params["fusion_net"]),
                jax.tree_util.tree_leaves(new_state.params["fusion_net"]),
            )
        )
        assert moved
        # arch untouched by the weight step
        for o, n in zip(jax.tree_util.tree_leaves(state.arch),
                        jax.tree_util.tree_leaves(new_state.arch)):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(n))
        # backbone batch_stats DID update (BN train mode even though frozen)
        bs_moved = any(
            not np.allclose(np.asarray(o), np.asarray(n))
            for o, n in zip(
                jax.tree_util.tree_leaves(state.batch_stats["imagenet"]),
                jax.tree_util.tree_leaves(new_state.batch_stats["imagenet"]),
            )
        )
        assert bs_moved

    def test_arch_step_moves_arch_not_params(self, setup):
        model, variables, arch, batch = setup
        state, fns = make_state(model, variables, arch)
        new_state, counts = fns.arch_step(state, batch)
        assert np.isfinite(float(counts['loss_sum']))
        for o, n in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_state.params)):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(n))
        arch_moved = any(
            not np.allclose(np.asarray(o), np.asarray(n))
            for o, n in zip(jax.tree_util.tree_leaves(state.arch),
                            jax.tree_util.tree_leaves(new_state.arch))
        )
        assert arch_moved

    def test_eval_step_is_pure(self, setup):
        model, variables, arch, batch = setup
        state, fns = make_state(model, variables, arch)
        c1 = fns.eval_step(state, batch)
        c2 = fns.eval_step(state, batch)
        assert float(c1['loss_sum']) == float(c2['loss_sum'])

    def test_search_to_found_round_trip(self, setup, tmp_path):
        model, variables, arch, batch = setup
        state, fns = make_state(model, variables, arch)
        for i in range(2):
            state, _ = fns.weight_step(state, batch, jnp.asarray(1e-3))
            state, _ = fns.arch_step(state, batch)
        genotype = derive_genotype_from_arch(
            state.arch, CFG["steps"], CFG["multiplier"], CFG["num_input_nodes"],
            CFG["node_steps"], CFG["node_multiplier"])
        # persist + reload (reference pickle contract)
        from bmnas_tpu.genotype import save_genotype, load_genotype
        p = str(tmp_path / "best_genotype.pkl")
        save_genotype(genotype, p)
        genotype = load_genotype(p)

        found = FoundImageTextNet.from_genotype(genotype, **CFG)
        fvars = found.init(
            {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            batch, None, True)
        logits = found.apply(fvars, batch, None, False)
        assert logits.shape == (2, CFG["num_outputs"])
        assert np.isfinite(np.asarray(logits)).all()
        # unused inputs must have no reshape params
        used = {idx for _, idx in genotype.edges}
        for i in range(CFG["num_input_nodes"]):
            has = f"reshape_{i}" in fvars["params"]
            assert has == (i in used)


class TestUnrolledDarts:
    """--unrolled: exact second-order DARTS (bilevel.arch_step_unrolled)."""

    def test_second_order_term_analytic(self):
        """Toy problem where the first-order arch gradient is ZERO and the
        unrolled gradient has a closed form:

            L_train(w, a) = a * w^2      -> grad_w = 2 a w
            w'            = w - eta * 2 a w
            L_val(w', a)  = w'^2         (no direct dependence on a)

        d L_val / d a = 2 w' * (-eta * 2 w). With w=1, a=0.5, eta=0.1:
        w' = 0.9, gradient = -0.36. First-order DARTS would return 0."""
        import optax

        from bmnas_tpu.search.bilevel import (
            TrainState,
            build_step_functions,
        )

        def apply_fn(variables, batch, arch, train, rngs, mutable):
            w = variables["params"]["w"]
            logit = batch["c_train"] * arch["a"] * w ** 2 \
                + batch["c_dev"] * w ** 2
            if mutable:
                return logit, {"batch_stats": {}}
            return logit

        criterion = lambda logits, labels, mask: logits
        counts = lambda logits, labels, mask: {}
        arch_tx = optax.sgd(1.0)  # new_a = a - grad
        fns = build_step_functions(apply_fn, criterion, counts,
                                   optax.identity(), arch_tx, donate=False)

        one = jnp.ones((1,), jnp.float32)
        train_b = {"c_train": 1.0, "c_dev": 0.0, "label": one, "mask": one}
        dev_b = {"c_train": 0.0, "c_dev": 1.0, "label": one, "mask": one}
        state = TrainState(
            params={"w": jnp.asarray(1.0)}, batch_stats={},
            arch={"a": jnp.asarray(0.5)},
            opt_w=optax.identity().init({"w": jnp.asarray(1.0)}),
            opt_arch=arch_tx.init({"a": jnp.asarray(0.5)}),
            rng=jax.random.PRNGKey(0), step=jnp.asarray(0, jnp.int32))

        # first-order step: no movement (grad is exactly zero)
        s1, _ = fns.arch_step(state, dev_b)
        np.testing.assert_allclose(float(s1.arch["a"]), 0.5, atol=1e-7)

        # unrolled step: a <- a - (-0.36)
        s2, _ = fns.arch_step_unrolled(state, dev_b, train_b,
                                       np.float32(0.1))
        np.testing.assert_allclose(float(s2.arch["a"]), 0.5 + 0.36,
                                   rtol=1e-5)
        # weights and their optimizer state untouched
        np.testing.assert_allclose(float(s2.params["w"]), 1.0)

    def test_unrolled_moves_arch_not_params(self, setup):
        model, variables, arch, batch = setup
        state, fns = make_state(model, variables, arch)
        dev = synthetic_batch(key=3)
        new_state, counts = fns.arch_step_unrolled(state, dev, batch,
                                                   np.float32(1e-3))
        # params identical, arch changed
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            state.params, new_state.params)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.arch,
            new_state.arch)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        assert np.isfinite(float(counts["loss_sum"]))

    def test_unrolled_differs_from_first_order(self, setup):
        model, variables, arch, batch = setup
        state, fns = make_state(model, variables, arch)
        dev = synthetic_batch(key=3)
        s_first, _ = fns.arch_step(state, dev)
        s_unrolled, _ = fns.arch_step_unrolled(state, dev, batch,
                                               np.float32(1e-2))
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            s_first.arch, s_unrolled.arch)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0


class TestFrozenPartition:
    """``frozen_prefixes``: differentiating only the trainable subtrees (the
    frozen backbones closed over as constants) must be numerically equivalent
    to differentiating everything and letting the optimizer's set_to_zero
    branch discard the frozen grads — the path every pre-partition test in
    this file exercises."""

    def _fns_pair(self, model, variables, arch):
        labels = make_param_labels(variables["params"], MMIMDB_FROZEN_PREFIXES)
        w_tx = make_weight_optimizer(labels, weight_decay=1e-4)
        arch_tx = make_arch_optimizer(3e-4, 1e-3)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            arch=arch,
            opt_w=w_tx.init(variables["params"]),
            opt_arch=arch_tx.init(arch),
            rng=jax.random.PRNGKey(7),
            step=jnp.asarray(0, jnp.int32),
        )
        apply_fn = make_apply(model)
        full = build_step_functions(apply_fn, bce_with_logits, counts_fn,
                                    w_tx, arch_tx, donate=False)
        part = build_step_functions(apply_fn, bce_with_logits, counts_fn,
                                    w_tx, arch_tx, donate=False,
                                    frozen_prefixes=MMIMDB_FROZEN_PREFIXES)
        return state, full, part

    def _assert_tree_close(self, a, b):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x, np.float64), np.asarray(y, np.float64),
                rtol=1e-6, atol=1e-7),
            a, b)

    def test_weight_step_matches_masked_full_gradient(self, setup):
        model, variables, arch, batch = setup
        state, full, part = self._fns_pair(model, variables, arch)
        sa, ca = full.weight_step(state, batch, jnp.asarray(1e-3))
        sb, cb = part.weight_step(state, batch, jnp.asarray(1e-3))
        self._assert_tree_close(sa.params, sb.params)
        self._assert_tree_close(sa.batch_stats, sb.batch_stats)
        self._assert_tree_close(sa.opt_w, sb.opt_w)
        np.testing.assert_allclose(float(ca["loss_sum"]),
                                   float(cb["loss_sum"]), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(sa.rng), np.asarray(sb.rng))

    def test_unrolled_matches_masked_virtual_step_oracle(self, setup):
        """The partitioned unrolled step holds frozen backbones fixed in the
        virtual step — the real weight optimizer never moves them (set_to_zero),
        so the unrolled objective must not either. Oracle: an independent
        re-derivation where the full-gradient virtual step explicitly zeroes
        the frozen subtrees' updates before differentiation."""
        model, variables, arch, batch = setup
        state, _, part = self._fns_pair(model, variables, arch)
        dev = synthetic_batch(key=3)
        eta = np.float32(1e-2)

        apply_fn = make_apply(model)
        _, k0, k1, _ = jax.random.split(state.rng, 4)
        ones = jnp.ones((batch["label"].shape[0],), jnp.float32)

        def fwd(params, arch_p, b, key):
            logits, _ = apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                b, arch_p, True, {"dropout": key}, ["batch_stats"])
            return bce_with_logits(logits, b["label"], ones)

        def oracle_arch_loss(arch_p):
            g_w = jax.grad(lambda p: fwd(p, arch_p, batch, k0))(state.params)
            g_w = {k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                       if k in MMIMDB_FROZEN_PREFIXES else v)
                   for k, v in g_w.items()}
            w_virtual = jax.tree_util.tree_map(
                lambda w, g: w - eta * g, state.params, g_w)
            return fwd(w_virtual, arch_p, dev, k1)

        oracle_grads = jax.grad(oracle_arch_loss)(state.arch)
        sb, _ = part.arch_step_unrolled(state, dev, batch, eta)
        # apply the same optimizer update the implementation applied
        arch_tx = make_arch_optimizer(3e-4, 1e-3)
        import optax
        upd, _ = arch_tx.update(oracle_grads, arch_tx.init(state.arch),
                                state.arch)
        expected = optax.apply_updates(state.arch, upd)
        self._assert_tree_close(expected, sb.arch)


class TestStepsPerDispatch:
    """--steps_per_dispatch: scanned k-step dispatches == k sequential
    single-step calls (same state trajectory, PRNG stream, summed counts)."""

    def test_weight_many_matches_sequential(self, setup):
        model, variables, arch, _ = setup
        state_a, fns = make_state(model, variables, arch)
        state_b, _ = make_state(model, variables, arch)
        batches = [synthetic_batch(b=2, key=k) for k in range(4)]
        etas = np.asarray([1e-3, 9e-4, 8e-4, 7e-4], np.float32)

        counts_seq = None
        for b, eta in zip(batches, etas):
            state_a, c = fns.weight_step(state_a, b, np.float32(eta))
            counts_seq = c if counts_seq is None else jax.tree_util.tree_map(
                lambda x, y: x + y, counts_seq, c)

        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
        state_b, counts_many = fns.weight_step_many(state_b, stacked, etas)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
            state_a.params, state_b.params)
        np.testing.assert_allclose(float(counts_seq["loss_sum"]),
                                   float(counts_many["loss_sum"]), rtol=1e-6)
        # PRNG stream advanced identically
        np.testing.assert_array_equal(np.asarray(state_a.rng),
                                      np.asarray(state_b.rng))

    def test_arch_many_matches_sequential(self, setup):
        model, variables, arch, _ = setup
        state_a, fns = make_state(model, variables, arch)
        state_b, _ = make_state(model, variables, arch)
        batches = [synthetic_batch(b=2, key=10 + k) for k in range(3)]
        for b in batches:
            state_a, _ = fns.arch_step(state_a, b)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
        state_b, _ = fns.arch_step_many(state_b, stacked)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
            state_a.arch, state_b.arch)

    def test_eval_many_matches_sequential(self, setup):
        model, variables, arch, _ = setup
        state, fns = make_state(model, variables, arch)
        batches = [synthetic_batch(b=2, key=20 + k) for k in range(3)]
        total = 0.0
        for b in batches:
            total += float(fns.eval_step(state, b)["loss_sum"])
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
        many = fns.eval_step_many(state, stacked)
        np.testing.assert_allclose(total, float(many["loss_sum"]), rtol=1e-6)


class TestFramePool:
    """Device frame-pool stepping (build_pool_step_functions): the on-device
    gather pool[sample_idx][frame_idx] must reproduce host-assembled batches
    exactly, including zeroed padding rows (sample_idx = -1)."""

    def test_gather_matches_numpy_and_masks_padding(self):
        from bmnas_tpu.search.bilevel import _gather_pool_batch
        r = np.random.RandomState(0)
        pool = jnp.asarray(r.randint(0, 255, size=(5, 7, 4, 4, 3),
                                     dtype=np.uint8))
        host = {
            "sample_idx": jnp.asarray([3, 0, -1], jnp.int32),
            "frame_idx": jnp.asarray(r.randint(0, 7, size=(3, 2)), jnp.int32),
            "label": jnp.asarray([1, 2, 0], jnp.int32),
            "mask": jnp.asarray([1.0, 1.0, 0.0], jnp.float32),
        }
        out = _gather_pool_batch(pool, host, "image")
        got = np.asarray(out["image"])
        p = np.asarray(pool)
        fi = np.asarray(host["frame_idx"])
        np.testing.assert_array_equal(got[0], p[3][fi[0]])
        np.testing.assert_array_equal(got[1], p[0][fi[1]])
        np.testing.assert_array_equal(got[2], 0)          # padded row zeroed
        assert "sample_idx" not in out and "frame_idx" not in out
        np.testing.assert_array_equal(np.asarray(out["label"]),
                                      [1, 2, 0])

    def test_pool_steps_match_direct_batches(self):
        """weight_step / weight_step_many / eval_step_many through the pool
        equal the same steps on host-gathered batches — a minimal flax net
        with a real frame axis (B, F, H, W, C), uint8 pool (the NTU
        configuration), including the scan chunking.

        (The full-CLI bit-equivalence, incl. the augmentation rng replay and
        the 8-device row-sharded pool, lives in tests/test_e2e_ntu.py.)"""
        import flax.linen as nn

        from bmnas_tpu.search.bilevel import build_pool_step_functions

        class TinyClipNet(nn.Module):
            @nn.compact
            def __call__(self, batch, arch, train: bool):
                x = batch["image"]
                if x.dtype == jnp.uint8:
                    x = x.astype(jnp.float32) / 255.0
                    m = batch["mask"]
                    x = x * m.reshape((-1,) + (1,) * (x.ndim - 1))
                h = x.reshape(x.shape[0], -1)
                h = nn.Dense(8, name="enc")(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 name="bn")(h)
                return nn.Dense(5, name="head")(nn.relu(h))

        model = TinyClipNet()
        r = np.random.RandomState(3)
        pool_np = r.randint(0, 255, size=(6, 3, 4, 4, 3), dtype=np.uint8)
        pool = jnp.asarray(pool_np)
        k, b, F = 2, 2, 2
        sample_idx = np.asarray([[0, 4], [5, 2]], np.int32)
        frame_idx = r.randint(0, 3, size=(k, b, F)).astype(np.int32)
        labels_np = (r.rand(k, b, 5) < 0.3).astype(np.float32)
        hosts = {
            "sample_idx": jnp.asarray(sample_idx),
            "frame_idx": jnp.asarray(frame_idx),
            "label": jnp.asarray(labels_np),
            "mask": jnp.ones((k, b), jnp.float32),
        }
        batch0 = {"image": pool[sample_idx[0]][:, 0:F],
                  "label": hosts["label"][0], "mask": hosts["mask"][0]}
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               batch0, None, True)

        def apply_fn(vs, bt, a, train, rngs, mutable):
            if mutable:
                return model.apply(vs, bt, a, train, mutable=mutable)
            return model.apply(vs, bt, a, train)

        labels = make_param_labels(variables["params"], ())
        w_tx = make_weight_optimizer(labels, weight_decay=1e-4)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"], arch=None,
            opt_w=w_tx.init(variables["params"]), opt_arch=None,
            rng=jax.random.PRNGKey(7), step=jnp.asarray(0, jnp.int32))
        fns = build_step_functions(apply_fn, bce_with_logits, counts_fn,
                                   w_tx, None, donate=False)
        pfns = build_pool_step_functions(fns, "image")

        etas = jnp.full((k,), 1e-2, jnp.float32)

        # sequential reference FIRST: the pool steps donate their state
        s_ref, c_ref = state, None
        for i in range(k):
            img = pool_np[sample_idx[i]]                       # (b, 3, 4,4,3)
            img = np.take_along_axis(
                img, frame_idx[i][:, :, None, None, None], axis=1)
            batch = {"image": jnp.asarray(img),
                     "label": hosts["label"][i], "mask": hosts["mask"][i]}
            s_ref, c = fns.weight_step(s_ref, batch, etas[i])
            c_ref = c if c_ref is None else jax.tree_util.tree_map(
                lambda x, y: x + y, c_ref, c)

        s_pool, c_pool = pfns.weight_step_many(state, pool, hosts, etas)
        np.testing.assert_allclose(float(c_pool["loss_sum"]),
                                   float(c_ref["loss_sum"]), rtol=1e-6)
        for leaf_a, leaf_b in zip(
                jax.tree_util.tree_leaves(s_pool.params),
                jax.tree_util.tree_leaves(s_ref.params)):
            np.testing.assert_allclose(np.asarray(leaf_a),
                                       np.asarray(leaf_b), rtol=2e-6,
                                       atol=2e-7)
