"""Guard tests for the measurement-recording tools (benchmarks/record_*.py).

These scripts turn multi-hour on-chip runs into the JSON artifacts bench.py
publishes; a silent parsing failure wastes the run (found the hard way:
plain pickle.load on a genotype pickle raises ModuleNotFoundError and the
pool-vs-stream genotype-equality evidence would have been dropped).
"""
import importlib.util
import json
import os
import sys

import pytest

pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(_ROOT, "benchmarks", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


rs = _load("record_search")
rpc = _load("record_pool_compare")

SEARCH_LOG = """\
08/18 01:00:00 PM args = Namespace(seed=2, save='x', datadir='/root/ntu', \
small_dataset=False, num_workers=8, parallel=False, batchsize=96, epochs=4, \
bf16_backbone=True, device_data_cache=True, steps_per_dispatch=8)
08/18 01:06:00 PM BM-NAS for NTU Started.
08/18 01:10:00 PM Epoch: 0
08/18 01:40:00 PM Epoch: 1
08/18 01:54:00 PM Epoch: 2
08/18 02:08:00 PM Epoch: 3
08/18 02:22:00 PM Searching complete in 76m 0s
"""


def _mk_exp(tmp_path, name, log, genotype_src=None):
    exp = tmp_path / name
    exp.mkdir()
    (exp / "log.txt").write_text(log)
    if genotype_src:
        best = exp / "best"
        best.mkdir()
        import shutil
        shutil.copy(genotype_src, best / "best_genotype.pkl")
    return str(exp)


@pytest.fixture(scope="module")
def genotype_pickle(tmp_path_factory):
    """A real reference-classed genotype pickle (what the CLIs write)."""
    from bmnas_tpu.genotype import Genotype, StepGenotype, save_genotype
    g = Genotype(
        edges=[("skip", 1), ("skip", 5), ("skip", 0), ("skip", 3)],
        steps=[StepGenotype([("skip", 0), ("skip", 1)], ["ConcatFC"], [2]),
               StepGenotype([("skip", 1), ("skip", 0)], ["Sum"], [2])],
        concat=[6, 7])
    p = tmp_path_factory.mktemp("geno") / "best_genotype.pkl"
    save_genotype(g, str(p))
    return str(p)


class TestSteadyEpochMinutes:
    def test_skips_first_gap_and_averages(self):
        # gaps: 30 (epoch0, skipped: compile+cache), then 14, 14, 14
        assert rs.steady_epoch_minutes(SEARCH_LOG) == 14.0

    def test_too_few_epochs_returns_none(self):
        log = "08/18 01:00:00 PM Epoch: 0\n08/18 01:30:00 PM done\n"
        assert rs.steady_epoch_minutes(log) is None

    def test_crosses_midnight(self):
        log = ("08/18 11:50:00 PM Epoch: 0\n"
               "08/18 11:55:00 PM Epoch: 1\n"
               "08/19 12:05:00 AM Epoch: 2\n"
               "08/19 12:15:00 AM Searching complete\n")
        assert rs.steady_epoch_minutes(log) == 10.0


class TestRecordSearch:
    def test_derives_flags_epochs_and_wall(self, tmp_path):
        exp = _mk_exp(tmp_path, "search-NTU-1", SEARCH_LOG)
        rec = rs.main(exp, task="ntu", out_dir=str(tmp_path))
        assert rec["wall_minutes"] == 76.0
        assert rec["epochs"] == 4
        assert rec["steady_state_minutes_per_epoch"] == 14.0
        for flag in ("--bf16_backbone", "--device_data_cache",
                     "--steps_per_dispatch 8", "batch 96"):
            assert flag in rec["note"]
        # artifact written where told, loadable, bench-compatible keys
        saved = json.load(open(tmp_path / "ntu_fullscale_search.json"))
        assert saved["wall_minutes"] == 76.0

    def test_task_inferred_from_path(self, tmp_path):
        d = tmp_path / "final_exp" / "ego"
        d.mkdir(parents=True)
        exp = _mk_exp(d, "search-FULLSCALE-1", SEARCH_LOG)
        rec = rs.main(exp, out_dir=str(tmp_path))
        assert "ego" in rec["note"]

    def test_incomplete_run_fails_loud(self, tmp_path):
        exp = _mk_exp(tmp_path, "search-NTU-2",
                      SEARCH_LOG.replace("Searching complete in 76m 0s",
                                         "still going"))
        with pytest.raises(SystemExit):
            rs.main(exp, task="ntu", out_dir=str(tmp_path))


class TestRecordPoolCompare:
    def test_genotypes_load_through_the_shim(self, tmp_path, genotype_pickle):
        """The pickles carry reference class paths; plain pickle.load raises
        ModuleNotFoundError. describe() must load them via the shim and the
        comparison must come out equal for identical pickles."""
        pool_log = SEARCH_LOG + (
            "08/18 01:07:00 PM device frame pool [train]: 2400 samples "
            "x 30 frames cached (3.7 GB)\n")
        pool = _mk_exp(tmp_path, "search-POOL-1", pool_log, genotype_pickle)
        stream = _mk_exp(tmp_path, "search-STREAM-1", SEARCH_LOG,
                         genotype_pickle)
        out = rpc.main(pool, stream, out_dir=str(tmp_path))
        assert "genotype_error" not in out["pool"], out["pool"]
        assert out["same_genotype"] is True
        assert out["pool"]["frame_pool"].startswith("2400 samples")
        assert out["stream"]["frame_pool"] == "streaming"
        assert out["epoch_speedup"] == 1.0
        saved = json.load(open(tmp_path / "ntu_pool_vs_stream.json"))
        assert saved["same_genotype"] is True

    def test_missing_genotype_is_flagged_not_silent(self, tmp_path):
        a = _mk_exp(tmp_path, "search-A", SEARCH_LOG)
        b = _mk_exp(tmp_path, "search-B", SEARCH_LOG)
        out = rpc.main(a, b, out_dir=str(tmp_path))
        assert "genotype_error" in out["pool"]
        assert "same_genotype" not in out
