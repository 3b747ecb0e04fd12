"""Found-net ablation node variants (node.py:94-184) and edge-op coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.genotype import Genotype, StepGenotype
from bmnas_tpu.models.foundnet import NODE_VARIANTS, FoundFusionNetwork
from bmnas_tpu.ops.fusion_ops import EDGE_OPS, EdgeOp

CFG = dict(steps=2, multiplier=2, num_input_nodes=4, num_keep_edges=2,
           node_steps=1, node_multiplier=1, C=8, L=4, drpt=0.0)

GENO = Genotype(
    edges=[("skip", 0), ("skip", 1), ("skip", 2), ("skip", 3)],
    concat=[4, 5],
    steps=[StepGenotype([("skip", 0), ("skip", 1)], ["ScaleDotAttn"], [2]),
           StepGenotype([("skip", 0), ("skip", 1)], ["LinearGLU"], [2])],
)


def feats(b=2):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(b, 4, 8).astype(np.float32))
            for _ in range(4)]


@pytest.mark.parametrize("variant", NODE_VARIANTS)
def test_all_variants_run(variant):
    net = FoundFusionNetwork.from_genotype(GENO, node_variant=variant, **CFG)
    f = feats()
    v = net.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, f, True)
    out = net.apply(v, f, False)
    assert out.shape == (2, 8 * 4 * 2)
    assert np.isfinite(np.asarray(out)).all()


def test_get_genotype_round_trip():
    net = FoundFusionNetwork.from_genotype(GENO, **CFG)
    g = net.get_genotype()
    assert g.edges == [tuple(e) for e in GENO.edges]
    assert g.concat == GENO.concat
    assert g.steps[0].inner_steps == GENO.steps[0].inner_steps


@pytest.mark.parametrize("kind", EDGE_OPS)
def test_edge_ops(kind):
    op = EdgeOp(kind=kind, C=8, drpt=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8).astype(np.float32))
    v = op.init({"params": jax.random.PRNGKey(0)}, x, False)
    out = op.apply(v, x, False)
    assert out.shape == x.shape
    if kind == "none":
        assert float(jnp.abs(out).max()) == 0.0
    if kind == "skip":
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_temporal_crops():
    from bmnas_tpu.data.ego import temporal_center_crop, temporal_random_crop
    frames = list(range(10, 110))  # 100 frames
    out = temporal_center_crop(frames, size=32, downsample=1)
    assert len(out) == 32
    assert out[0] == frames[50 - 16]  # centered window
    # short clip loops
    out2 = temporal_center_crop([1, 2, 3], size=8, downsample=1)
    assert len(out2) == 8
    assert set(out2) == {1, 2, 3}
    rng = np.random.RandomState(0)
    out3 = temporal_random_crop(frames, size=32, downsample=2, rng=rng)
    assert len(out3) == 32
    # downsample=2 picks every other frame of a 64-window
    assert out3[1] - out3[0] == 2


class TestNTUTaskVariants:
    """Whole-net NTU ablation baselines (ntu_darts_searchable.py:275-680)."""

    @pytest.mark.parametrize("variant", ["simple_concat", "ensemble_concat",
                                         "ensemble", "simple_concat_attn"])
    def test_forward_shapes(self, variant):
        import jax
        import numpy as np

        from bmnas_tpu.models.ntu import NTUAblationNet

        r = np.random.RandomState(0)
        batch = {
            "image": r.rand(2, 8, 32, 32, 3).astype(np.float32),
            "skeleton": r.randn(2, 32, 25, 2, 3).astype(np.float32),
            "label": np.zeros((2,), np.int32),
            "mask": np.ones((2,), np.float32),
        }
        model = NTUAblationNet(C=8, L=4, num_outputs=6, drpt=0.0,
                               variant=variant)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, batch, None, True)
        out = model.apply(v, batch, None, False)
        assert out.shape == (2, 6)
        # the picked-feature head widths match the reference classifiers
        k = {"simple_concat": 2, "ensemble_concat": 5, "ensemble": 2,
             "simple_concat_attn": 2}[variant]
        kern = v["params"]["central_classifier"]["Dense_0"]["kernel"]
        assert kern.shape[0] == 8 * 4 * k

    def test_cli_task_variant(self, tmp_path):
        """--task_variant through the found NTU CLI end to end."""
        import glob
        import os

        import numpy as np

        from bmnas_tpu.cli.ntu import main_found, main_search
        from bmnas_tpu.data.synthetic import make_ntu_synthetic

        root = make_ntu_synthetic(str(tmp_path / "data"),
                                  n_videos_per_subject=2,
                                  subjects=(1, 8, 2, 5, 3, 6), num_actions=6,
                                  hw=32, frames=70)
        tiny = ["--small_dataset", "--batchsize", "2", "--epochs", "1",
                "--C", "8", "--L", "4", "--num_outputs", "6",
                "--num_workers", "2", "--seed", "3"]
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            main_search(["--datadir", root,
                         "--checkpointdir", str(tmp_path)] + tiny)
            exp = glob.glob("final_exp/ntu/search-*")[0]
            acc = main_found(
                ["--datadir", root, "--checkpointdir", str(tmp_path),
                 "--search_exp_dir", exp, "--steps", "2",
                 "--task_variant", "simple_concat_attn"] + tiny)
            assert np.isfinite(acc)
        finally:
            os.chdir(cwd)
