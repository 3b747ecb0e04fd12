"""EgoGesture CLI round trip on synthetic JPEG data (tiny shapes, CPU)."""
import glob
import os

import numpy as np
import pytest

from bmnas_tpu.data.synthetic import make_ego_synthetic

TINY = ["--small_dataset", "--batchsize", "2", "--epochs", "1",
        "--C", "8", "--L", "4", "--num_outputs", "5",
        "--sample_size", "32", "--sample_duration", "4",
        "--node_steps", "1", "--node_multiplier", "1",
        "--j", "2", "--seed", "3"]


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego_synth")
    ann = make_ego_synthetic(str(root), n_per_subset=4, num_classes=5,
                             hw=48, frames=12)
    return str(root), ann


@pytest.mark.slow
def test_search_found_round_trip(data, tmp_path):
    from bmnas_tpu.cli.ego import main_found, main_search
    root, ann = data
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        best_acc, best_genotype = main_search(
            ["--datadir", root, "--checkpointdir", os.path.dirname(ann),
             "--annotation", os.path.basename(ann)] + TINY)
        assert np.isfinite(best_acc)
        assert best_genotype is not None
        exps = glob.glob("final_exp/ego/search-*")
        assert len(exps) == 1
        acc = main_found(
            ["--datadir", root, "--checkpointdir", os.path.dirname(ann),
             "--annotation", os.path.basename(ann),
             "--search_exp_dir", exps[0]] + TINY)
        assert np.isfinite(acc)

        # --dense_grouped_convs is an execution-plan change only: the found
        # retrain must reproduce the grouped run's accuracy from the same
        # seed (same params, same math — block-diagonal dense kernels)
        acc_dense = main_found(
            ["--datadir", root, "--checkpointdir", os.path.dirname(ann),
             "--annotation", os.path.basename(ann),
             "--search_exp_dir", exps[0], "--dense_grouped_convs"] + TINY)
        np.testing.assert_allclose(acc_dense, acc, rtol=1e-6)
    finally:
        os.chdir(cwd)


def test_device_data_cache_search_identical_results(data, tmp_path):
    """Ego --device_data_cache: the dev split (deterministic center-crop
    pipeline, evaluated UNSHUFFLED) is gathered from HBM; must reproduce the
    streaming run's genotype and dev accuracy exactly."""
    from bmnas_tpu.cli.ego import main_search
    root, ann = data
    cwd = os.getcwd()
    results = []
    for sub, extra in (("a", []),
                       ("b", ["--device_data_cache",
                              "--steps_per_dispatch", "2"])):
        d = tmp_path / sub
        d.mkdir()
        os.chdir(d)
        try:
            results.append(main_search(
                ["--datadir", root, "--checkpointdir", os.path.dirname(ann),
                 "--annotation", os.path.basename(ann)] + TINY + extra))
        finally:
            os.chdir(cwd)
    (acc_a, gen_a), (acc_b, gen_b) = results
    assert repr(gen_a) == repr(gen_b)
    np.testing.assert_allclose(acc_a, acc_b, rtol=1e-6)
    exp = glob.glob(str(tmp_path / "b" / "final_exp/ego/search-*"))[0]
    log = open(os.path.join(exp, "log.txt")).read()
    assert "device cache [dev]:" in log
    assert "device cache [train]: skipped" in log
