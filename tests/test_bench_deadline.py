"""bench.py's deadline-proof emission protocol (VERDICT r04 #1).

The driver records only the tail of stdout and kills the run at an unknown
timeout; round 4's artifact was empty (rc=124, parsed=null) because the old
bench printed its single JSON line only at the very end. These tests pin
the new contract: a complete, parseable artifact line exists within seconds
of start, survives a SIGTERM at an arbitrary mid-run point (exit 0, final
line carries detail.terminated), and a zero budget degrades to a carried
artifact with every section listed as skipped — never to an empty tail.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _env(**extra):
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
                "JAX_ENABLE_X64": "0"})
    env.update(extra)
    return env


def _parse_lines(stdout):
    lines = []
    for ln in stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                continue
    return lines


REQUIRED = {"metric", "value", "unit", "vs_baseline", "detail"}


@pytest.mark.quick
def test_sigterm_mid_run_still_yields_artifact():
    """Kill bench.py mid-run: the tail must end with a complete artifact."""
    proc = subprocess.Popen(
        [sys.executable, BENCH], cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
        env=_env(BENCH_HOLD_S="120", BENCH_BUDGET_S="6000"))
    first = None
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line.strip().startswith("{"):
            first = json.loads(line)
            break
    assert first is not None, "no artifact line within 120s of start"
    assert REQUIRED <= set(first), first.keys()
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0  # polite kill -> clean exit
    lines = _parse_lines(out)
    assert lines, "no JSON line after SIGTERM"
    last = lines[-1]
    assert REQUIRED <= set(last)
    assert "terminated" in last["detail"]
    # the carried record is present, labelled, and not claimed as fresh
    assert last["detail"]["measured_this_run"] == []
    if last["value"]:
        assert "headline_carried_from" in last["detail"]


@pytest.mark.quick
def test_prev_bench_skips_null_parses():
    """The carried headline walks past parsed=null rounds (BENCH_r04.json)
    to the newest artifact with data — a timeout round must not zero the
    carried value of every later round."""
    sys.path.insert(0, REPO)
    try:
        import bench
        prev, name = bench.load_prev_bench()
    finally:
        sys.path.remove(REPO)
    r04 = json.load(open(os.path.join(REPO, "BENCH_r04.json")))
    if r04.get("parsed") is None:  # true in-repo; guard for future rounds
        assert name != "BENCH_r04.json"
    assert prev is not None and prev.get("value"), (name, prev)


@pytest.mark.quick
def test_zero_budget_run_completes_with_skips():
    """BENCH_BUDGET_S=0: every section skipped, artifact still complete."""
    out = subprocess.run(
        [sys.executable, BENCH], cwd=REPO, capture_output=True, text=True,
        timeout=300, env=_env(BENCH_BUDGET_S="0")).stdout
    lines = _parse_lines(out)
    assert lines
    last = lines[-1]
    assert REQUIRED <= set(last)
    skipped = last["detail"].get("skipped_sections", [])
    names = " ".join(skipped)
    for section in ("bf16_mmimdb", "fp32_mmimdb", "ntu_found",
                    "ego_search", "ego_found", "serving"):
        assert section in names, f"{section} not listed in {skipped}"
    assert last["detail"]["measured_this_run"] == []
