"""NTU CLI round trip on synthetic data (tiny shapes, CPU backend)."""
import glob
import os

import numpy as np
import pytest

from bmnas_tpu.data.synthetic import make_ntu_synthetic

TINY = ["--small_dataset", "--batchsize", "2", "--epochs", "1",
        "--C", "8", "--L", "4", "--num_outputs", "6",
        "--num_workers", "2", "--seed", "3"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ntu_synth")
    # subjects chosen to hit train_exp (1, 8), dev (2, 5), test (3, 6)
    return make_ntu_synthetic(str(root), n_videos_per_subject=2,
                              subjects=(1, 8, 2, 5, 3, 6), num_actions=6,
                              hw=32, frames=70)


def test_search_found_round_trip(data_root, tmp_path):
    from bmnas_tpu.cli.ntu import main_found, main_search
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        best_acc, best_genotype = main_search(
            ["--datadir", data_root, "--checkpointdir", str(tmp_path)] + TINY)
        assert np.isfinite(best_acc)
        assert best_genotype is not None
        assert len(best_genotype.edges) == 4
        assert len(best_genotype.steps[0].inner_steps) == 2  # node_steps=2

        exps = glob.glob("final_exp/ntu/search-*")
        assert len(exps) == 1
        acc = main_found(
            ["--datadir", data_root, "--checkpointdir", str(tmp_path),
             "--search_exp_dir", exps[0], "--steps", "2"] + TINY)
        assert np.isfinite(acc)
        assert glob.glob(os.path.join(exps[0], "eval-*"))

        # --fused_kernels on the NTU found default shape (node_steps=2,
        # node_multiplier=2): the multi-step Pallas cell must actually run
        # (no "composite fallback" line) and produce a finite accuracy.
        acc_fused = main_found(
            ["--datadir", data_root, "--checkpointdir", str(tmp_path),
             "--search_exp_dir", exps[0], "--steps", "2",
             "--fused_kernels"] + TINY)
        assert np.isfinite(acc_fused)
        eval_dirs = sorted(glob.glob(os.path.join(exps[0], "eval-*")))
        log = open(os.path.join(eval_dirs[-1], "log.txt")).read()
        assert "composite fallback" not in log
    finally:
        os.chdir(cwd)


def test_device_data_cache_search_identical_results(data_root, tmp_path):
    """NTU --device_data_cache: the dev split (deterministic pipeline) lives
    in HBM as raw uint8 and is gathered + normalized on device; the augmented
    train split lives in HBM as a decoded FRAME POOL (its random temporal
    crop is pure frame selection — the host replays the rng stream and ships
    only frame-index arrays + skeletons). Must reproduce the streaming run's
    genotype and dev accuracy exactly (same shuffle order, padded-batch
    semantics, PRNG stream, augmentation draws)."""
    from bmnas_tpu.cli.ntu import main_search
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
                ["--datadir", data_root, "--checkpointdir", str(d)]
                + TINY + extra))
        finally:
            os.chdir(cwd)
    (acc_a, gen_a), (acc_b, gen_b) = results
    assert repr(gen_a) == repr(gen_b)
    np.testing.assert_allclose(acc_a, acc_b, rtol=1e-6)
    exp = glob.glob(str(tmp_path / "b" / "final_exp/ntu/search-*"))[0]
    log = open(os.path.join(exp, "log.txt")).read()
    assert "device cache [dev]:" in log             # dev cached whole
    assert "device frame pool [train]:" in log      # train pooled
    assert "device frame pool [train]: skipped" not in log


def test_device_frame_pool_parallel_identical_results(data_root, tmp_path):
    """Frame pool x --parallel on the 8-device mesh: the pool is row-sharded
    over the data mesh (NamedSharding(mesh, P('data'))) and the global
    sample/frame gather crosses shards. Streaming --parallel and pooled
    --parallel must produce the identical genotype and dev accuracy."""
    from bmnas_tpu.cli.ntu import main_search
    cwd = os.getcwd()
    results = []
    for sub, extra in (("a", ["--parallel"]),
                       ("b", ["--parallel", "--device_data_cache",
                              "--steps_per_dispatch", "2"])):
        d = tmp_path / sub
        d.mkdir()
        os.chdir(d)
        try:
            results.append(main_search(
                ["--datadir", data_root, "--checkpointdir", str(d)]
                + TINY + extra))
        finally:
            os.chdir(cwd)
    (acc_a, gen_a), (acc_b, gen_b) = results
    assert repr(gen_a) == repr(gen_b)
    np.testing.assert_allclose(acc_a, acc_b, rtol=1e-6)
    exp = glob.glob(str(tmp_path / "b" / "final_exp/ntu/search-*"))[0]
    log = open(os.path.join(exp, "log.txt")).read()
    assert "device frame pool [train]:" in log
    assert "device frame pool [train]: skipped" not in log


def test_device_frame_pool_found_identical_results(data_root, tmp_path):
    """Found retrain with --device_data_cache (train frame POOL + test-split
    cache) must reproduce the streaming found run's accuracy exactly — the
    found CLI wires build_pool_step_functions too (cli/ntu.py run_found)."""
    from bmnas_tpu.cli.ntu import main_found, main_search
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main_search(["--datadir", data_root, "--checkpointdir",
                     str(tmp_path)] + TINY)
        exp = glob.glob("final_exp/ntu/search-*")[0]
        accs = []
        for extra in ([], ["--device_data_cache", "--steps_per_dispatch",
                           "2"]):
            accs.append(main_found(
                ["--datadir", data_root, "--checkpointdir", str(tmp_path),
                 "--search_exp_dir", exp, "--steps", "2"] + TINY + extra))
        np.testing.assert_allclose(accs[0], accs[1], rtol=1e-6)
        eval_dirs = sorted(glob.glob(os.path.join(exp, "eval-*")))
        log = open(os.path.join(eval_dirs[-1], "log.txt")).read()
        assert "device frame pool [train]:" in log
        assert "device frame pool [train]: skipped" not in log
    finally:
        os.chdir(cwd)
