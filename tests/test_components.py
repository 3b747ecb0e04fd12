"""Unit tests for smaller components: supernet wiring, serving, plotting,
resume checkpoints, top-k accuracy, prefetcher."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.models.supernet import (
    FusionNetwork,
    derive_genotype_from_arch,
    init_arch_params,
    inner_num_edges,
    outer_num_edges,
)

CFG = dict(steps=2, multiplier=2, num_input_nodes=6, num_keep_edges=2,
           node_steps=1, node_multiplier=1, C=8, L=4, drpt=0.1)


def features(b=2):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(b, CFG["L"], CFG["C"]).astype(np.float32))
            for _ in range(CFG["num_input_nodes"])]


class TestSupernet:
    def test_arch_shapes(self):
        arch = init_arch_params(jax.random.PRNGKey(0), CFG["steps"],
                                CFG["num_input_nodes"], CFG["node_steps"])
        assert arch["alphas"].shape == (outer_num_edges(2, 6), 2)
        assert arch["betas"].shape == (2, inner_num_edges(1), 2)
        assert arch["gammas"].shape == (2, 1, 4)
        # init scale 1e-3 (model_search.py:102)
        assert float(jnp.abs(arch["alphas"]).max()) < 0.01

    def test_forward_shape_and_determinism(self):
        net = FusionNetwork(**CFG)
        arch = init_arch_params(jax.random.PRNGKey(0), CFG["steps"],
                                CFG["num_input_nodes"], CFG["node_steps"])
        feats = features()
        v = net.init({"params": jax.random.PRNGKey(1),
                      "dropout": jax.random.PRNGKey(2)}, feats, arch, True)
        out1 = net.apply(v, feats, arch, False)
        out2 = net.apply(v, feats, arch, False)
        assert out1.shape == (2, CFG["C"] * CFG["L"] * CFG["multiplier"])
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_genotype_consistency(self):
        arch = init_arch_params(jax.random.PRNGKey(3), CFG["steps"],
                                CFG["num_input_nodes"], CFG["node_steps"])
        g = derive_genotype_from_arch(arch, CFG["steps"], CFG["multiplier"],
                                      CFG["num_input_nodes"],
                                      CFG["node_steps"],
                                      CFG["node_multiplier"])
        assert len(g.edges) == CFG["steps"] * CFG["num_keep_edges"]
        assert all(op == "skip" for op, _ in g.edges)  # PRIMITIVES={none,skip}
        assert g.concat == [6, 7]


class TestServing:
    def test_predict_matches_apply(self, tmp_path):
        from bmnas_tpu.genotype import Genotype, StepGenotype
        from bmnas_tpu.models.mmimdb import FoundImageTextNet
        from bmnas_tpu.serving import FoundNetServer, load_server
        from bmnas_tpu.utils.checkpoint import save_model

        g = Genotype(
            edges=[("skip", 0), ("skip", 4), ("skip", 1), ("skip", 5)],
            concat=[6, 7],
            steps=[StepGenotype([("skip", 0), ("skip", 1)], ["Sum"], [2]),
                   StepGenotype([("skip", 0), ("skip", 1)], ["LinearGLU"], [2])],
        )
        cfg = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1,
                   node_multiplier=1, num_input_nodes=6, num_keep_edges=2,
                   num_outputs=5, drpt=0.1)
        model = FoundImageTextNet.from_genotype(g, **cfg)
        rng = np.random.RandomState(0)
        batch = {
            "image": jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32)),
            "text": jnp.asarray(rng.randn(4, 300).astype(np.float32)),
            "label": jnp.asarray(np.zeros((4, 5), np.float32)),
            "mask": jnp.asarray([1, 1, 1, 0], jnp.float32),
        }
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, batch, None, True)
        server = FoundNetServer(model, v["params"], v["batch_stats"])
        out = server.predict(batch)
        assert out.shape == (3, 5)  # mask drops the padded row
        want = np.asarray(model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            batch, None, False))[:3]
        np.testing.assert_allclose(out, want, rtol=1e-6)

        # snapshot round trip
        p = str(tmp_path / "best_model.pt")
        save_model(p, v["params"], v["batch_stats"])
        server2 = load_server(p, model)
        np.testing.assert_allclose(server2.predict(batch), want, rtol=1e-6)


class TestPlot:
    def test_writes_artifact(self, tmp_path):
        from bmnas_tpu.genotype import Genotype, StepGenotype
        from bmnas_tpu.visualize import plot_genotype
        g = Genotype(
            edges=[("skip", 0), ("skip", 4), ("skip", 1), ("skip", 5)],
            concat=[6, 7],
            steps=[StepGenotype([("skip", 0), ("skip", 1)], ["Sum"], [2]),
                   StepGenotype([("skip", 0), ("skip", 1)], ["ConcatFC"], [2])],
        )
        out = str(tmp_path / "epoch_0")
        plot_genotype(g, out, task="mmimdb", num_input_nodes=6,
                      num_keep_edges=2, node_steps=1, node_multiplier=1)
        assert (os.path.exists(out + ".pdf") or os.path.exists(out + ".dot")
                or os.path.exists(out))

    def test_plot_cli(self, tmp_path):
        from bmnas_tpu.cli.plot import main
        from bmnas_tpu.genotype import Genotype, StepGenotype, save_genotype
        g = Genotype(
            edges=[("skip", 0), ("skip", 4), ("skip", 1), ("skip", 5)],
            concat=[6, 7],
            steps=[StepGenotype([("skip", 0), ("skip", 1)], ["Sum"], [2]),
                   StepGenotype([("skip", 0), ("skip", 1)], ["Sum"], [2])],
        )
        p = str(tmp_path / "g.pkl")
        save_genotype(g, p)
        main([p, str(tmp_path / "viz"), "--task", "mmimdb"])


class TestResume:
    def test_state_round_trip(self, tmp_path):
        import optax
        from bmnas_tpu.search.bilevel import TrainState, torch_adam
        from bmnas_tpu.utils.checkpoint import restore_state, save_state
        params = {"w": jnp.arange(4, dtype=jnp.float32)}
        tx = torch_adam()
        state = TrainState(params=params, batch_stats={}, arch=None,
                           opt_w=tx.init(params), opt_arch=None,
                           rng=jax.random.PRNGKey(0),
                           step=jnp.asarray(7, jnp.int32))
        p = str(tmp_path / "ckpt.msgpack")
        save_state(p, state, extra={"epoch": 3, "scheduler": {"Ti": 2.0}})
        restored, extra = restore_state(p, state)
        assert extra["epoch"] == 3
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(params["w"]))
        assert int(restored.step) == 7


class TestTopK:
    def test_matches_manual(self):
        from bmnas_tpu.utils.metrics import topk_accuracy
        logits = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1],
                             [0.2, 0.3, 0.5]])
        labels = np.asarray([1, 2, 1])
        top1, top2 = topk_accuracy(logits, labels, topk=(1, 2))
        assert top1 == pytest.approx(100.0 / 3)
        assert top2 == pytest.approx(200.0 / 3)


class TestPrefetch:
    def test_order_and_completion(self):
        from bmnas_tpu.data.prefetch import device_prefetch
        batches = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
        out = list(device_prefetch(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert float(b["x"][0]) == i

    def test_error_propagates(self):
        from bmnas_tpu.data.prefetch import device_prefetch

        def gen():
            yield {"x": np.zeros(2, np.float32)}
            raise RuntimeError("loader boom")

        with pytest.raises(RuntimeError, match="loader boom"):
            list(device_prefetch(gen(), size=2))

    def test_oom_during_put_carries_budget_hint(self):
        """R5HYB3 postmortem: a RESOURCE_EXHAUSTED surfacing from the staging
        device_put must name the cache-budget levers, not just re-raise the
        bare runtime error (the dev-phase OOM of an 8 GB-pool full-scale NTU
        search gave no actionable message)."""
        from bmnas_tpu.data.prefetch import device_prefetch

        def oom_place(batch):
            raise ValueError("RESOURCE_EXHAUSTED: TPU backend error")

        gen = iter([{"x": np.zeros(2, np.float32)}])
        with pytest.raises(RuntimeError,
                           match="device_cache_budget_gb"):
            list(device_prefetch(gen, size=2, place=oom_place))

    def test_pooled_order_and_completion(self):
        """--h2d_streams > 1: the concurrent-put pipeline must preserve
        batch order exactly (the PRNG/LR stream depends on it)."""
        from bmnas_tpu.data.prefetch import device_prefetch
        batches = [{"x": np.full((2,), i, np.float32)} for i in range(23)]
        out = list(device_prefetch(iter(batches), size=2, put_threads=4))
        assert len(out) == 23
        for i, b in enumerate(out):
            assert float(b["x"][0]) == i

    def test_pooled_error_propagates(self):
        from bmnas_tpu.data.prefetch import device_prefetch

        def gen():
            yield {"x": np.zeros(2, np.float32)}
            raise RuntimeError("loader boom")

        with pytest.raises(RuntimeError, match="loader boom"):
            list(device_prefetch(gen(), size=2, put_threads=4))

    def test_pooled_abandonment_stops_threads(self):
        import gc
        import time

        from bmnas_tpu.data.prefetch import device_prefetch

        def gen():
            for i in range(100):
                yield {"x": np.zeros(4) + i}

        it = device_prefetch(gen(), size=2, put_threads=3)
        next(it)
        next(it)
        it.close()
        del it
        gc.collect()
        time.sleep(0.6)  # reader notices stop within its 0.2s put timeout


def test_bf16_backbones_close_to_fp32():
    """--bf16_backbone for NTU/ego: bf16 conv stacks (fp32 params/taps) give
    logits close to the fp32 path — same param tree, no retracing issues."""
    import jax
    import jax.numpy as jnp

    from bmnas_tpu.models.ntu import SearchableSkeletonImageNet
    from bmnas_tpu.models.supernet import init_arch_params

    cfg = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1,
               node_multiplier=1, num_input_nodes=8, num_keep_edges=2,
               num_outputs=6, drpt=0.0)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, 4, 32, 32, 3).astype(np.float32)),
        "skeleton": jnp.asarray(rng.randn(2, 16, 25, 2, 3).astype(np.float32)),
        "label": jnp.asarray([1, 2], jnp.int32),
    }
    arch = init_arch_params(jax.random.PRNGKey(1), 2, 8, 1)
    m32 = SearchableSkeletonImageNet(**cfg)
    m16 = SearchableSkeletonImageNet(backbone_dtype=jnp.bfloat16, **cfg)
    variables = m32.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(2)},
                         batch, arch, False)
    # identical param tree: bf16 is a compute dtype, not a storage dtype
    v16 = m16.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(2)}, batch, arch, False)
    assert jax.tree_util.tree_structure(variables) \
        == jax.tree_util.tree_structure(v16)
    out32 = m32.apply(variables, batch, arch, False)
    out16 = m16.apply(variables, batch, arch, False)
    assert out16.dtype == jnp.float32  # fusion/classifier stay fp32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.1, atol=0.15)


def test_device_prefetch_worker_exits_on_abandonment():
    """Abandoning a prefetch iterator mid-epoch (e.g. the --unrolled dev
    phase cycling a train iterator) must stop the worker thread instead of
    leaving it blocked with device batches pinned in the queue."""
    import gc
    import threading
    import time

    from bmnas_tpu.data.prefetch import device_prefetch

    def gen():
        for i in range(100):
            yield {"x": np.zeros(4) + i}

    before = threading.active_count()
    it = device_prefetch(gen(), size=2)
    next(it)
    next(it)
    del it
    gc.collect()
    time.sleep(0.6)
    assert threading.active_count() <= before


class TestBlockDiagGroupedConv:
    """--dense_grouped_convs: the block-diagonal dense execution of the
    ResNeXt grouped conv must equal the grouped nn.Conv exactly (the
    off-block weights are zero, same sums in a different tiling)."""

    def test_matches_grouped_conv(self):
        import flax.linen as nn

        from bmnas_tpu.models.resnext import BlockDiagGroupedConv

        groups, c_in, feats, stride = 8, 32, 32, 2
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 6, 10, 10, c_in).astype(np.float32))
        grouped = nn.Conv(feats, (3, 3, 3), strides=stride, padding=1,
                          feature_group_count=groups, use_bias=False)
        dense = BlockDiagGroupedConv(features=feats, groups=groups,
                                     stride=stride)
        vg = grouped.init(jax.random.PRNGKey(0), x)
        # identical param name + shape -> transplant verbatim
        vd = {"params": {"kernel": vg["params"]["kernel"]}}
        want = np.asarray(grouped.apply(vg, x))
        got = np.asarray(dense.apply(vd, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_full_net_parity_with_flag(self):
        """SearchableRGBDepthNet(dense_grouped=True) must produce the same
        logits as the default net from the SAME params (flag only changes
        the execution plan, never the parameter tree)."""
        from bmnas_tpu.models.ego import SearchableRGBDepthNet
        from bmnas_tpu.models.supernet import init_arch_params

        cfg = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1,
                   node_multiplier=1, num_input_nodes=8, num_keep_edges=2,
                   num_outputs=5, drpt=0.0)
        r = np.random.RandomState(1)
        batch = {
            "rgb": r.rand(2, 8, 32, 32, 3).astype(np.float32),
            "depth": r.rand(2, 8, 32, 32, 1).astype(np.float32),
            "label": r.randint(0, 5, size=(2,)).astype(np.int32),
            "mask": np.ones((2,), np.float32),
        }
        arch = init_arch_params(jax.random.PRNGKey(1), 2, 8, 1)
        base = SearchableRGBDepthNet(**cfg)
        flag = SearchableRGBDepthNet(dense_grouped=True, **cfg)
        v = base.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(2)}, batch, arch, True)
        want = np.asarray(base.apply(v, batch, arch, False))
        got = np.asarray(flag.apply(v, batch, arch, False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestCacheBudgetClamp:
    """clamp_cache_budget must bound resident data on real TPUs even when
    memory_stats is unavailable (the axon relay returns none — the unclamped
    12 GB R5HYBRID booking left <4 GB for the batch-96 step and OOMed)."""

    class _Dev:
        def __init__(self, kind, stats=None):
            self.device_kind = kind
            self._stats = stats

        def memory_stats(self):
            if self._stats is None:
                raise RuntimeError("no stats on this runtime")
            return self._stats

    def _clamp(self, monkeypatch, dev, budget, **kw):
        from bmnas_tpu.cli import common
        monkeypatch.setattr(jax, "local_devices", lambda: [dev])
        monkeypatch.delenv("BMNAS_TPU_HBM_GB", raising=False)
        monkeypatch.delenv("BMNAS_CACHE_HEADROOM_GB", raising=False)
        return common.clamp_cache_budget(budget, **kw)

    def test_memory_stats_path(self, monkeypatch):
        dev = self._Dev("TPU v5 lite",
                        {"bytes_limit": 16 * 2**30, "bytes_in_use": 2**30})
        assert self._clamp(monkeypatch, dev, 14.0) == pytest.approx(10.0)

    def test_static_fallback_v5e(self, monkeypatch):
        # no stats: 16 GB (v5 lite table) - 0.5 resident - 5 headroom = 10.5
        dev = self._Dev("TPU v5 lite")
        assert self._clamp(monkeypatch, dev, 12.0) == pytest.approx(10.5)

    def test_under_budget_untouched(self, monkeypatch):
        dev = self._Dev("TPU v5 lite")
        assert self._clamp(monkeypatch, dev, 8.0) == pytest.approx(8.0)

    def test_env_override(self, monkeypatch):
        dev = self._Dev("weird accelerator")
        monkeypatch.setattr(jax, "local_devices", lambda: [dev])
        monkeypatch.setenv("BMNAS_TPU_HBM_GB", "32")
        from bmnas_tpu.cli import common
        assert common.clamp_cache_budget(40.0) == pytest.approx(26.5)

    def test_unknown_kind_trusts_flag(self, monkeypatch):
        # CPU test meshes / unknown devices: pre-clamp behavior
        dev = self._Dev("cpu")
        assert self._clamp(monkeypatch, dev, 12.0) == 12.0

    def test_none_budget_passthrough(self, monkeypatch):
        dev = self._Dev("TPU v5 lite")
        assert self._clamp(monkeypatch, dev, None) is None


@pytest.mark.quick
class TestDevicePutChunked:
    """device_put_chunked: concurrent chunked upload for multi-GB cache/pool
    arrays must reproduce plain device_put exactly (donated
    dynamic_update_slice fold, peak HBM = result + streams*chunk)."""

    def test_roundtrip_uint8(self):
        from bmnas_tpu.data.prefetch import device_put_chunked
        a = np.random.RandomState(0).randint(
            0, 255, (1000, 7, 11), dtype=np.uint8)
        out = device_put_chunked(a, streams=4, chunk_mb=1)
        assert np.array_equal(np.asarray(out), a)

    def test_small_array_degrades_to_plain_put(self):
        from bmnas_tpu.data.prefetch import device_put_chunked
        b = np.random.randn(7, 3).astype(np.float32)
        out = device_put_chunked(b, streams=4, chunk_mb=1)
        assert np.array_equal(np.asarray(out), b)

    def test_single_stream_is_plain_put(self):
        from bmnas_tpu.data.prefetch import device_put_chunked
        a = np.arange(64, dtype=np.int32).reshape(16, 4)
        out = device_put_chunked(a, streams=1, chunk_mb=0)
        assert np.array_equal(np.asarray(out), a)

    def test_uneven_tail_chunk(self):
        from bmnas_tpu.data.prefetch import device_put_chunked
        # rows chosen so the final chunk is shorter than the others
        a = np.random.RandomState(1).randn(1031, 300).astype(np.float32)
        out = device_put_chunked(a, streams=3, chunk_mb=1)
        assert np.array_equal(np.asarray(out), a)
