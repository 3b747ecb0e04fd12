"""Scheduler semantics tests (reference models/auxiliary/scheduler.py:12-62)."""
import numpy as np
import pytest

from bmnas_tpu.search.scheduler import FixedScheduler, LRCosineAnnealingScheduler


pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

def simulate_reference(eta_max, eta_min, Ti, Tm, nbpe, n_steps):
    """Independent simulation of the published recurrence (the spec)."""
    etas = []
    counter, ti = 0.0, float(Ti)
    for _ in range(n_steps):
        tcur = counter / nbpe
        counter += 1.0
        eta = eta_min + 0.5 * (eta_max - eta_min) * (1 + np.cos(np.pi * tcur / ti))
        if eta <= eta_min + 1e-10:
            ti *= Tm
            counter = 0.0
        etas.append(eta)
    return etas


class TestCosineRestart:
    def test_matches_recurrence(self):
        sched = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2, 10.0)
        got = [sched.step() for _ in range(100)]
        want = simulate_reference(1e-3, 1e-6, 1, 2, 10.0, 100)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_starts_at_eta_max_and_restarts(self):
        nbpe = 10.0
        sched = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2, nbpe)
        etas = [sched.step() for _ in range(45)]
        assert etas[0] == 1e-3
        # first restart at step Ti*nbpe = 10 (0-indexed): eta hits eta_min
        assert etas[10] <= 1e-6 + 1e-10
        # after restart the next step starts a new (doubled) period at eta_max
        assert etas[11] == 1e-3
        # second period is 2x longer: next minimum 20 steps later
        assert etas[31] <= 1e-6 + 1e-10
        assert etas[32] == 1e-3

    def test_state_round_trip(self):
        s1 = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2, 7.0)
        for _ in range(13):
            s1.step()
        s2 = LRCosineAnnealingScheduler(1e-3, 1e-6, 1, 2, 7.0)
        s2.load_state(s1.state())
        for _ in range(20):
            assert s1.step() == s2.step()

    def test_fixed(self):
        s = FixedScheduler(0.01)
        assert s.step() == 0.01
