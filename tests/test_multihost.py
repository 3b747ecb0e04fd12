"""Multi-host runtime wiring (parallel/multihost.py).

The reference's DDP is commented out (ntu_darts_searchable.py:52); our
upgrade is jax.distributed + the same 1-D data mesh spanning all hosts.
Verified here with a REAL 2-process jax.distributed CPU cluster: both
workers initialize through ensure_multihost (the exact call the CLIs make
via maybe_parallel), build make_parallel_context() over the global device
set, feed the IDENTICAL global batch through ParallelContext.shard_batch
(which keeps each process's 1/P slice — the CLI loader contract), and check
an order-sensitive jitted global reduction agrees on both workers.
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]

from bmnas_tpu.parallel.multihost import ensure_multihost, is_primary_host
assert ensure_multihost(coordinator_address=f"127.0.0.1:{port}",
                        num_processes=2, process_id=pid)
assert jax.process_count() == 2

import numpy as np
from bmnas_tpu.parallel.mesh import make_parallel_context
ctx = make_parallel_context()
assert ctx.num_devices == jax.device_count() == 2

# CLI contract: every process loads the IDENTICAL global batch (seeded
# loaders); shard_batch keeps this process's 1/P row slice. A
# position-weighted reduction proves row ORDER survives assembly, not
# just membership.
global_batch = np.arange(8, dtype=np.float32).reshape(8, 1)
batch = ctx.shard_batch({"x": global_batch})
assert batch["x"].shape == (8, 1)
w = np.arange(8, dtype=np.float32).reshape(8, 1)
g = jax.jit(lambda b: (b["x"] * w).sum())(batch)
total = float(g)  # sum i*i for i<8 = 140, and order-sensitive
print(f"RESULT pid={pid} total={total} primary={is_primary_host()}",
      flush=True)
assert total == 140.0, total
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_ensure_multihost_noop_without_config(monkeypatch):
    """Single-host CLIs call ensure_multihost unconditionally; with no
    coordinator configured it must decline without touching jax.distributed."""
    from bmnas_tpu.parallel.multihost import ensure_multihost
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert ensure_multihost() is False


def test_two_process_cpu_cluster():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # hermetic single-device CPU workers (no virtual 8-device flag)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"RESULT pid={pid} total=140.0" in out, out
    assert "primary=True" in outs[0] and "primary=False" in outs[1]


CLI_WORKER = r"""
import os, sys, glob, pickle
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, data = int(sys.argv[1]), sys.argv[2], sys.argv[3]

from bmnas_tpu.parallel.multihost import ensure_multihost
assert ensure_multihost(coordinator_address=f"127.0.0.1:{port}",
                        num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

os.chdir(sys.argv[4])
from bmnas_tpu.cli.mmimdb import main_search
best_f1, genotype = main_search(
    ["--datadir", data, "--small_dataset", "--epochs", "1",
     "--batchsize", "8", "--C", "8", "--L", "4", "--num_workers", "2",
     "--seed", "5", "--parallel"])
print(f"CLIRESULT pid={pid} f1={best_f1:.6f} geno={genotype!r}", flush=True)
"""


def test_two_process_search_cli_end_to_end(tmp_path):
    """The ACTUAL mmimdb search CLI run as a 2-process x 4-device cluster:
    both workers train the full bilevel loop over the global 8-device mesh
    on identical seeded data and must derive the identical genotype and dev
    F1 (replicated deterministic updates == single-host semantics)."""
    port = _free_port()
    data = tmp_path / "data"
    from bmnas_tpu.data.synthetic import make_mmimdb_synthetic
    make_mmimdb_synthetic(str(data), n_per_stage=16, image_hw=(32, 32))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        env.pop(var, None)
    cwds = []
    procs = []
    for pid in range(2):
        cwd = tmp_path / f"run{pid}"
        cwd.mkdir()
        cwds.append(cwd)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CLI_WORKER, str(pid), str(port),
             str(data), str(cwd)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("CLIRESULT")][0]
        results.append(line.split(" ", 1)[1])
    # identical F1 + genotype on both processes = replicated determinism
    assert results[0].split("geno=")[1] == results[1].split("geno=")[1]
    assert results[0].split(" ")[1] == results[1].split(" ")[1]
    # primary wrote the canonical exp dir; worker 1 a -proc1 suffixed one
    import glob as g
    assert g.glob(str(cwds[0] / "final_exp/mmimdb/search-EXP-*/best/best_genotype.pkl"))
    assert g.glob(str(cwds[0] / "final_exp/mmimdb/search-EXP-*/checkpoint.msgpack"))
    assert g.glob(str(cwds[0] / "final_exp/mmimdb/search-EXP-*/metrics.jsonl"))
    proc1 = g.glob(str(cwds[1] / "final_exp/mmimdb/search-EXP-*"))
    assert proc1 and all(d.endswith("-proc1") for d in proc1)
    # non-primary processes must NOT write best/checkpoint/metrics artifacts
    # (search/loop.py primary gating): worker 1's dir carries log.txt only
    for d in proc1:
        assert not g.glob(os.path.join(d, "best", "*"))
        assert not os.path.exists(os.path.join(d, "checkpoint.msgpack"))
        assert not os.path.exists(os.path.join(d, "metrics.jsonl"))
        assert os.path.exists(os.path.join(d, "log.txt"))
