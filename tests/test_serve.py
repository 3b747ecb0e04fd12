"""main_serve.py: batch-inference serving CLI over FoundNetServer."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.data.synthetic import make_mmimdb_synthetic
from bmnas_tpu.genotype import Genotype, StepGenotype, save_genotype
from bmnas_tpu.models.mmimdb import FoundImageTextNet
from bmnas_tpu.utils.checkpoint import save_model

GENO = Genotype(
    edges=[("skip", 0), ("skip", 4), ("skip", 2), ("skip", 5)],
    concat=[6, 7],
    steps=[StepGenotype([("skip", 0), ("skip", 1)], ["ScaleDotAttn"], [2]),
           StepGenotype([("skip", 1), ("skip", 0)], ["Sum"], [2])],
)
CFG = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1, node_multiplier=1,
           num_input_nodes=6, num_keep_edges=2, num_outputs=23, drpt=0.0)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    data = root / "data"
    make_mmimdb_synthetic(str(data), n_per_stage=12, image_hw=(32, 32))
    exp = root / "exp" / "best"
    exp.mkdir(parents=True)
    save_genotype(GENO, str(exp / "best_genotype.pkl"))
    model = FoundImageTextNet.from_genotype(GENO, **CFG)
    batch = {"image": jnp.zeros((2, 32, 32, 3)),
             "text": jnp.zeros((2, 300))}
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    save_model(str(exp / "best_model.pt"), variables["params"],
               variables["batch_stats"])
    return str(data), str(root / "exp"), model, variables


def _serve(data, exp, extra=()):
    from bmnas_tpu.cli.serve import main_serve
    return main_serve(["--task", "mmimdb", "--eval_exp_dir", exp,
                       "--datadir", data, "--small_dataset",
                       "--batchsize", "4", "--C", "8", "--L", "4",
                       "--num_workers", "2", *extra])


def test_serve_reports_metric_and_throughput(artifacts, capsys):
    data, exp, model, variables = artifacts
    result = _serve(data, exp)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == result  # the JSON line IS the return value
    assert result["metric"] == "weighted_f1"
    assert 0.0 <= result["value"] <= 1.0
    assert result["samples"] == 12
    assert result["samples_per_sec"] > 0


def test_serve_matches_direct_apply(artifacts):
    """Served logits (through snapshot load + FoundNetServer) must equal a
    direct model.apply with the same variables."""
    data, exp, model, variables = artifacts
    from bmnas_tpu.data.mmimdb import MMIMDBDataset
    from bmnas_tpu.serving import load_server

    server = load_server(os.path.join(exp, "best", "best_model.pt"), model)
    ds = MMIMDBDataset(data, "test", small_dataset=True, num_workers=2)
    batch = next(iter(ds.batches(4, shuffle=False)))
    got = server.predict(batch)
    want = model.apply(variables,
                       {k: jnp.asarray(v) for k, v in batch.items()},
                       None, False)
    np.testing.assert_allclose(got, np.asarray(want)[: len(got)], rtol=1e-5,
                               atol=1e-5)


def test_serve_fused_matches(artifacts):
    data, exp, model, variables = artifacts
    base = _serve(data, exp)
    fused = _serve(data, exp, extra=("--fused_kernels",))
    assert abs(fused["value"] - base["value"]) < 1e-3
    assert fused["fused_kernels"] is True


def test_serve_missing_artifacts_fails_fast(tmp_path, artifacts):
    data, _, _, _ = artifacts
    (tmp_path / "best").mkdir()
    with pytest.raises(SystemExit, match="no genotype"):
        _serve(data, str(tmp_path))


NTU_GENO = Genotype(
    edges=[("skip", 2), ("skip", 5), ("skip", 3), ("skip", 4)],
    concat=[8, 9],
    steps=[StepGenotype([("skip", 0), ("skip", 1)], ["Sum"], [2]),
           StepGenotype([("skip", 1), ("skip", 0)], ["ConcatFC"], [2])],
)


def test_serve_ntu_task(tmp_path):
    """main_serve --task ntu: dataset branch, model branch, accuracy metric."""
    from bmnas_tpu.cli.serve import main_serve
    from bmnas_tpu.data.synthetic import make_ntu_synthetic
    from bmnas_tpu.models.ntu import FoundSkeletonImageNet

    data = tmp_path / "data"
    make_ntu_synthetic(str(data), n_videos_per_subject=2,
                       subjects=(3, 6), num_actions=6, hw=32, frames=40)
    cfg = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1,
               node_multiplier=1, num_input_nodes=8, num_keep_edges=2,
               num_outputs=6, drpt=0.0)
    model = FoundSkeletonImageNet.from_genotype(NTU_GENO, **cfg)
    batch = {"image": jnp.zeros((2, 8, 32, 32, 3)),
             "skeleton": jnp.zeros((2, 32, 25, 2, 3))}
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    best = tmp_path / "exp" / "best"
    best.mkdir(parents=True)
    save_genotype(NTU_GENO, str(best / "best_genotype.pkl"))
    save_model(str(best / "best_model.pt"), variables["params"],
               variables["batch_stats"])

    result = main_serve(
        ["--task", "ntu", "--eval_exp_dir", str(tmp_path / "exp"),
         "--datadir", str(data), "--small_dataset", "--batchsize", "2",
         "--C", "8", "--L", "4", "--num_outputs", "6",
         "--node_steps", "1", "--node_multiplier", "1",
         "--num_workers", "2"])
    assert result["metric"] == "accuracy"
    assert 0.0 <= result["value"] <= 1.0
    assert result["samples"] == 4


def test_serve_ego_task(tmp_path):
    """main_serve --task ego: annotation plumbing + RGB-D split serving."""
    from bmnas_tpu.cli.serve import main_serve
    from bmnas_tpu.data.synthetic import make_ego_synthetic
    from bmnas_tpu.models.ego import FoundRGBDepthNet

    ann = make_ego_synthetic(str(tmp_path / "data"), n_per_subset=3,
                             num_classes=5, hw=40, frames=10)
    geno = Genotype(
        edges=[("skip", 0), ("skip", 4), ("skip", 1), ("skip", 5)],
        concat=[8, 9],
        steps=[StepGenotype([("skip", 0), ("skip", 1)], ["Sum"], [2]),
               StepGenotype([("skip", 0), ("skip", 1)], ["LinearGLU"], [2])],
    )
    cfg = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1,
               node_multiplier=1, num_input_nodes=8, num_keep_edges=2,
               num_outputs=5, drpt=0.0)
    model = FoundRGBDepthNet.from_genotype(geno, **cfg)
    batch = {"rgb": jnp.zeros((2, 4, 32, 32, 3)),
             "depth": jnp.zeros((2, 4, 32, 32, 1))}
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    best = tmp_path / "exp" / "best"
    best.mkdir(parents=True)
    save_genotype(geno, str(best / "best_genotype.pkl"))
    save_model(str(best / "best_model.pt"), variables["params"],
               variables["batch_stats"])

    result = main_serve(
        ["--task", "ego", "--eval_exp_dir", str(tmp_path / "exp"),
         "--datadir", str(tmp_path / "data"),
         "--checkpointdir", os.path.dirname(ann),
         "--annotation", os.path.basename(ann),
         "--small_dataset", "--batchsize", "2", "--C", "8", "--L", "4",
         "--num_outputs", "5", "--node_steps", "1", "--node_multiplier", "1",
         "--sample_size", "32", "--sample_duration", "4",
         "--num_workers", "2"])
    assert result["metric"] == "accuracy"
    assert result["samples"] == 3


def test_export_round_trip_matches_server(artifacts):
    """jax.export artifact (weights baked into the StableHLO module) must
    reproduce the live server bit-for-bit-ish, incl. mask trimming, with no
    model code in the loop."""
    data, exp, model, variables = artifacts
    from bmnas_tpu.data.mmimdb import MMIMDBDataset
    from bmnas_tpu.serving import load_exported, load_server

    server = load_server(os.path.join(exp, "best", "best_model.pt"), model)
    ds = MMIMDBDataset(data, "test", small_dataset=True, num_workers=2)
    batches = list(ds.batches(4, shuffle=False))
    blob = server.export_bytes(batches[0])
    exported = load_exported(blob)
    assert "cpu" in exported.platforms
    for b in batches:  # last batch exercises the mask-trim path
        np.testing.assert_allclose(exported.predict(b), server.predict(b),
                                   rtol=1e-5, atol=1e-5)


def test_serve_cli_export_then_from_export(artifacts, tmp_path):
    data, exp, model, variables = artifacts
    art = str(tmp_path / "mmimdb_export.bin")
    res = _serve(data, exp, extra=("--export", art))
    assert res["metric"] == "export_artifact_bytes"
    assert os.path.getsize(art) == res["value"] > 0
    assert res["verified_batch_max_abs_diff"] < 1e-4

    # serving from the artifact alone (no --eval_exp_dir, no snapshot)
    from bmnas_tpu.cli.serve import main_serve
    got = main_serve(["--task", "mmimdb", "--from_export", art,
                      "--datadir", data, "--small_dataset",
                      "--batchsize", "4", "--C", "8", "--L", "4",
                      "--num_workers", "2"])
    want = _serve(data, exp)
    assert got["metric"] == want["metric"]
    np.testing.assert_allclose(got["value"], want["value"], rtol=1e-6)
    assert got["from_export"] == art
