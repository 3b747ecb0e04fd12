"""CLI-level tests for the TPU-rebuild additions: --resume and --parallel."""
import glob
import json
import os

import numpy as np
import pytest

from bmnas_tpu.data.synthetic import make_mmimdb_synthetic

TINY = ["--small_dataset", "--batchsize", "4", "--epochs", "1",
        "--C", "8", "--L", "4", "--num_workers", "2", "--seed", "11"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmimdb_feat")
    return make_mmimdb_synthetic(str(root), n_per_stage=8, image_hw=(32, 32))


def test_resume_continues_search(data_root, tmp_path):
    """--resume continues AFTER the checkpointed epoch: a 1-epoch run
    resumed with --epochs 2 trains exactly epoch 1 (not epochs 0-1 again),
    and resuming an already-finished run trains nothing but still returns
    the best metric + genotype restored from the checkpointed experiment."""
    from bmnas_tpu.cli.mmimdb import main_search
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main_search(["--datadir", data_root] + TINY)
        exp1 = glob.glob("final_exp/mmimdb/search-*")[0]
        ckpt = os.path.join(exp1, "checkpoint.msgpack")
        assert os.path.exists(ckpt)

        best_f1, best_genotype = main_search(
            ["--datadir", data_root, "--resume", os.path.abspath(ckpt),
             "--small_dataset", "--batchsize", "4", "--epochs", "2",
             "--C", "8", "--L", "4", "--num_workers", "2", "--seed", "11"])
        exp2 = sorted(glob.glob("final_exp/mmimdb/search-*"))[-1]
        log = open(os.path.join(exp2, "log.txt")).read()
        assert "continuing at epoch 1" in log
        assert "Epoch: 1" in log and "Epoch: 0" not in log
        assert np.isfinite(best_f1)
        assert best_genotype is not None

        # resuming a finished run: no epochs trained, best restored
        best_f1b, best_genotypeb = main_search(
            ["--datadir", data_root, "--resume", os.path.abspath(ckpt)] + TINY)
        exp3 = sorted(glob.glob("final_exp/mmimdb/search-*"))[-1]
        log3 = open(os.path.join(exp3, "log.txt")).read()
        assert "Epoch: 0" not in log3
        assert best_genotypeb is not None
    finally:
        os.chdir(cwd)


def test_parallel_search_on_virtual_mesh(data_root, tmp_path):
    """--use_dataparallel with the 8-virtual-device CPU mesh: full CLI path
    (loaders shard batches, state replicated, metrics globally reduced)."""
    import jax
    assert len(jax.devices()) == 8
    from bmnas_tpu.cli.mmimdb import main_search
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        best_f1, best_genotype = main_search(
            TINY[:-4] + ["--datadir", data_root, "--use_dataparallel",
                         "--batchsize", "8", "--num_workers", "2",
                         "--seed", "12"])
        assert np.isfinite(best_f1)
        assert best_genotype is not None
        exp = sorted(glob.glob("final_exp/mmimdb/search-*"))[-1]
        rows = [json.loads(l) for l in
                open(os.path.join(exp, "metrics.jsonl"))]
        # 8 samples / batch 8 with padding -> dev F1 computed over all rows
        assert any(r["phase"] == "dev" for r in rows)
    finally:
        os.chdir(cwd)


def test_unrolled_search_cli(data_root, tmp_path):
    """--unrolled drives second-order arch steps through the full search CLI
    and still produces a genotype + best artifacts."""
    import glob

    from bmnas_tpu.cli.mmimdb import main_search
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        best_f1, genotype = main_search(
            ["--datadir", data_root, "--small_dataset", "--epochs", "1",
             "--batchsize", "4", "--C", "8", "--L", "4",
             "--num_workers", "2", "--seed", "11", "--unrolled"])
        assert np.isfinite(best_f1)
        assert genotype is not None
        exp = glob.glob("final_exp/mmimdb/search-EXP-*")[0]
        assert os.path.exists(os.path.join(exp, "best", "best_genotype.pkl"))
    finally:
        os.chdir(cwd)


def test_steps_per_dispatch_cli_identical_results(data_root, tmp_path):
    """--steps_per_dispatch 4 through the full search CLI produces the
    identical genotype and dev F1 as the default per-step path."""
    import glob

    from bmnas_tpu.cli.mmimdb import main_search
    cwd = os.getcwd()
    results = []
    for sub, extra in (("a", []), ("b", ["--steps_per_dispatch", "4"])):
        d = tmp_path / sub
        d.mkdir()
        os.chdir(d)
        try:
            results.append(main_search(
                ["--datadir", data_root] + TINY + extra))
        finally:
            os.chdir(cwd)
    (f1_a, gen_a), (f1_b, gen_b) = results
    assert repr(gen_a) == repr(gen_b)
    np.testing.assert_allclose(f1_a, f1_b, rtol=1e-6)


def test_device_data_cache_cli_identical_results(data_root, tmp_path,
                                                 monkeypatch):
    """--device_data_cache (+ chunked dispatch) must reproduce the streaming
    loader's genotype and dev F1 exactly — same shuffle order, same padded
    final batch semantics (zero rows + mask), same PRNG stream.

    Variant b also runs --h2d_streams 3 with a 1 MB chunk size, covering
    the concurrent CHUNKED cache upload (device_put_chunked fold) and the
    pooled concurrent-put prefetcher through the full CLI."""
    import glob

    from bmnas_tpu.cli.mmimdb import main_search
    monkeypatch.setenv("BMNAS_H2D_CHUNK_MB", "1")
    cwd = os.getcwd()
    results = []
    for sub, extra in (("a", []),
                       ("b", ["--device_data_cache",
                              "--h2d_streams", "3",
                              "--steps_per_dispatch", "3"])):
        d = tmp_path / sub
        d.mkdir()
        os.chdir(d)
        try:
            results.append(main_search(
                ["--datadir", data_root] + TINY + extra))
        finally:
            os.chdir(cwd)
    (f1_a, gen_a), (f1_b, gen_b) = results
    assert repr(gen_a) == repr(gen_b)
    np.testing.assert_allclose(f1_a, f1_b, rtol=1e-6)


def test_device_data_cache_composes_with_parallel(data_root, tmp_path):
    """--device_data_cache + --parallel: the cache is row-sharded over the
    8-device mesh and the on-device gather must reproduce the streaming
    --parallel run's genotype and dev F1 exactly (VERDICT r2 item 1)."""
    import jax
    assert len(jax.devices()) == 8
    from bmnas_tpu.cli.mmimdb import main_search
    cwd = os.getcwd()
    base = ["--datadir", data_root, "--use_dataparallel", "--small_dataset",
            "--epochs", "1", "--C", "8", "--L", "4", "--batchsize", "8",
            "--num_workers", "2", "--seed", "12"]
    results = []
    for sub, extra in (("a", []),
                       ("b", ["--device_data_cache",
                              "--steps_per_dispatch", "3"])):
        d = tmp_path / sub
        d.mkdir()
        os.chdir(d)
        try:
            results.append(main_search(base + extra))
        finally:
            os.chdir(cwd)
    (f1_a, gen_a), (f1_b, gen_b) = results
    assert repr(gen_a) == repr(gen_b)
    np.testing.assert_allclose(f1_a, f1_b, rtol=1e-6)


def test_device_data_cache_found_phase(data_root, tmp_path):
    """--device_data_cache through the found (eval) CLI: train/dev/test all
    gather from HBM; final F1 matches the streaming path."""
    import glob

    from bmnas_tpu.cli.mmimdb import main_found, main_search
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main_search(["--datadir", data_root] + TINY)
        exp = glob.glob("final_exp/mmimdb/search-EXP-*")[0]
        f1_stream = main_found(
            ["--datadir", data_root, "--search_exp_dir", exp] + TINY)
        f1_cached = main_found(
            ["--datadir", data_root, "--search_exp_dir", exp] + TINY
            + ["--device_data_cache", "--steps_per_dispatch", "3"])
        np.testing.assert_allclose(f1_stream, f1_cached, rtol=1e-6)
    finally:
        os.chdir(cwd)
