"""Full CLI round trip on synthetic data: search -> best_genotype.pkl ->
found retrain -> test-only. Exercises every layer L0-L6 once (SURVEY.md §7
step 5 exit criterion), on the CPU backend with tiny shapes.
"""
import glob
import os

import numpy as np
import pytest

from bmnas_tpu.data.synthetic import make_mmimdb_synthetic

TINY = ["--small_dataset", "--batchsize", "4", "--epochs", "1",
        "--C", "8", "--L", "4", "--num_workers", "2", "--seed", "3"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmimdb_synth")
    return make_mmimdb_synthetic(str(root), n_per_stage=8, image_hw=(32, 32))


@pytest.fixture(scope="module")
def search_exp(data_root, tmp_path_factory, monkeypatch_module=None):
    from bmnas_tpu.cli.mmimdb import main_search
    cwd = os.getcwd()
    work = tmp_path_factory.mktemp("exp")
    os.chdir(work)
    try:
        best_f1, best_genotype = main_search(
            ["--datadir", data_root] + TINY)
    finally:
        os.chdir(cwd)
    exps = glob.glob(str(work / "final_exp/mmimdb/search-*"))
    assert len(exps) == 1
    return exps[0], best_f1, best_genotype


class TestSearchCLI:
    def test_artifacts(self, search_exp):
        exp_dir, best_f1, best_genotype = search_exp
        assert os.path.exists(os.path.join(exp_dir, "log.txt"))
        assert os.path.exists(os.path.join(exp_dir, "best", "best_genotype.pkl"))
        assert os.path.exists(os.path.join(exp_dir, "best", "best_model.pt"))
        assert os.path.exists(os.path.join(exp_dir, "checkpoint.msgpack"))
        # machine-readable metrics stream
        mpath = os.path.join(exp_dir, "metrics.jsonl")
        assert os.path.exists(mpath)
        import json as _json
        rows = [_json.loads(l) for l in open(mpath)]
        assert {r["phase"] for r in rows} == {"train", "dev"}
        assert all("loss" in r and "metric" in r for r in rows)
        assert np.isfinite(best_f1)
        assert best_genotype is not None
        assert len(best_genotype.edges) == 4  # steps=2 * keep_edges=2
        # architectures dir has a per-epoch plot artifact (pdf or dot)
        arts = os.listdir(os.path.join(exp_dir, "architectures"))
        assert any(a.startswith("epoch_0") for a in arts)

    def test_log_format(self, search_exp):
        exp_dir, _, _ = search_exp
        log = open(os.path.join(exp_dir, "log.txt")).read()
        assert "train Loss:" in log and "weighted F1:" in log
        assert "Fusion Model Params:" in log
        assert "Current best dev weighted F1:" in log

    def test_found_and_test_only(self, search_exp, data_root):
        from bmnas_tpu.cli.mmimdb import main_found
        exp_dir, _, _ = search_exp
        f1 = main_found(["--datadir", data_root, "--search_exp_dir", exp_dir]
                        + TINY)
        assert np.isfinite(f1)
        evals = glob.glob(os.path.join(exp_dir, "eval-*"))
        assert len(evals) == 1
        eval_dir = evals[0]
        assert os.path.exists(os.path.join(eval_dir, "best",
                                           "best_test_model.pt"))
        # test-only mode consumes the eval experiment
        f1_t = main_found(["--datadir", data_root, "--eval_exp_dir", eval_dir]
                          + TINY)
        assert np.isfinite(f1_t)
        assert glob.glob(os.path.join(eval_dir, "test-*"))
