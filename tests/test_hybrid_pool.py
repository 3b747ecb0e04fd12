"""Hybrid pool+stream for oversized NTU train splits (VERDICT r04 #2).

When the full decoded frame pool exceeds --device_cache_budget_gb, the CLI
pools the first pool_n dataset rows in HBM and streams the remainder each
epoch (data/ntu.hybrid_batches + the kind-aware dispatch in search/loop.py).
Reference workload being scaled: main_darts_searchable_ntu.py:38-59 feeds
batch-96 NTU from host RAM across ~128 GB aggregate GPU memory
(README.md:66); one 16 GB chip cannot hold the 16.7 GB full-scale pool.

Exact stream equivalence holds on pool-fit corpora (hybrid degenerates to
pool_batches, pinned by test_e2e_ntu.test_device_data_cache_*); a genuinely
hybrid epoch necessarily regroups batches by kind, so these tests pin the
invariants that matter instead: every sample appears exactly once per
epoch, per-sample augmentation draws are bit-identical to streaming, chunks
stay homogeneous by kind, and the e2e search runs the HYBRID path.
"""
import glob
import os

import numpy as np
import pytest

from bmnas_tpu.data.ntu import NTUDataset
from bmnas_tpu.data.synthetic import make_ntu_synthetic

BATCH, POOL_N, SPD = 2, 8, 2


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ntu_hybrid")
    # train subjects (1, 8) x 6 videos -> 12 train samples
    return make_ntu_synthetic(str(root), n_videos_per_subject=6,
                              subjects=(1, 8, 2, 5, 3, 6), num_actions=6,
                              hw=32, frames=70)


@pytest.mark.quick
def test_hybrid_batches_coverage_kinds_and_parity(data_root):
    ds = NTUDataset(data_root, "train_exp", num_workers=2,
                    train_transform=True)
    assert len(ds) == 12
    seed = 5
    pool = ds.build_frame_pool(limit=POOL_N)
    assert pool.shape[0] == POOL_N
    pooled_rows = streamed_rows = 0
    seen_pooled = []
    for b in ds.hybrid_batches(BATCH, shuffle=True, seed=seed,
                               pool_n=POOL_N, spd=SPD):
        is_pool = "sample_idx" in b
        assert is_pool != ("image" in b)  # homogeneous, exactly one kind
        valid = int(b["mask"].sum())
        if is_pool:
            pooled_rows += valid
            sidx = b["sample_idx"][:valid]
            assert (sidx >= 0).all() and (sidx < POOL_N).all()
            assert (b["sample_idx"][valid:] == -1).all()
            seen_pooled.extend(sidx.tolist())
            # device-gather parity: pool[sidx][frame_idx] must equal the
            # pixels load_sample would stream for the same per-sample seed
            for r in range(valid):
                want = ds.load_sample(int(sidx[r]),
                                      int(seed * 7919 + sidx[r]))["image"]
                got = pool[sidx[r]][b["frame_idx"][r]]
                np.testing.assert_array_equal(got, want)
        else:
            streamed_rows += valid
            assert b["image"].dtype == pool.dtype
    assert pooled_rows == POOL_N  # every pooled row exactly once
    assert sorted(seen_pooled) == list(range(POOL_N))
    assert streamed_rows == len(ds) - POOL_N


@pytest.mark.quick
def test_hybrid_batches_poolfit_delegates_to_pool_batches(data_root):
    """pool_n >= N: hybrid must be batch-for-batch identical to
    pool_batches — this is what carries the existing pool==stream
    equivalence guarantee over to the hybrid entry point."""
    ds = NTUDataset(data_root, "train_exp", num_workers=2,
                    train_transform=True)
    a = list(ds.hybrid_batches(BATCH, shuffle=True, seed=7, pool_n=99,
                               spd=SPD))
    b = list(ds.pool_batches(BATCH, shuffle=True, seed=7))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert sorted(x) == sorted(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_hybrid_search_e2e(data_root, tmp_path, monkeypatch):
    """Full search epoch through the kind-aware loop dispatch: a budget that
    fits only ~8 of 12 train rows must log the HYBRID pool, train on both
    kinds, and produce a finite accuracy + valid genotype.

    Also pins the host-memory-trim gating (VERDICT r04 weak #6): the
    per-chunk ``_release_host_memory`` must fire only for STREAM-kind
    chunks (pixels crossed the relay), never for pool-kind index-gather
    chunks, so an almost-fully-cached epoch pays ~zero trim overhead."""
    import re

    from bmnas_tpu.cli.ntu import main_search
    from bmnas_tpu.search import loop as loop_mod
    calls = []
    real = loop_mod._release_host_memory
    monkeypatch.setattr(loop_mod, "_release_host_memory",
                        lambda: (calls.append(1), real())[1])
    # 8 rows x 70 frames x 32*32*3 uint8 = 1.64 MB, plus ~1 MB for the
    # dev/test split caches that are debited from the same budget
    # (cli/common.build_device_cache resident_gb accounting)
    budget = f"{(8 * 70 * 32 * 32 * 3 + 1_200_000) / 2**30:.6f}"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        acc, genotype = main_search(
            ["--datadir", data_root, "--checkpointdir", str(tmp_path),
             "--small_dataset", "--batchsize", "2", "--epochs", "1",
             "--C", "8", "--L", "4", "--num_outputs", "6",
             "--num_workers", "2", "--seed", "3",
             "--device_data_cache", "--device_cache_budget_gb", budget,
             "--steps_per_dispatch", "2"])
        assert np.isfinite(acc)
        assert genotype is not None and len(genotype.edges) == 4
        exp = glob.glob("final_exp/ntu/search-*")[0]
        log = open(os.path.join(exp, "log.txt")).read()
        m = re.search(r"HYBRID - pooling (\d+) of 12", log)
        assert m, "hybrid pool did not engage"
        pool_n = int(m.group(1))
        assert 4 <= pool_n < 12  # genuinely partial
        # Trim-call budget: one per phase end (unconditional) plus one per
        # STREAM-kind train chunk (ceil((12-pool_n)/batch/spd) per epoch).
        # Pool-kind chunks (train pooled run + fully-cached dev/test) must
        # contribute zero; ungated, the count would at least double.
        n_phase_ends = log.count("Loss:")
        stream_chunks = -(-(12 - pool_n) // (2 * 2))
        assert len(calls) <= n_phase_ends + stream_chunks, (
            f"per-chunk host trim fired {len(calls)} times; pool-kind "
            f"chunks should not trigger it "
            f"(expected <= {n_phase_ends + stream_chunks})")
    finally:
        os.chdir(cwd)
