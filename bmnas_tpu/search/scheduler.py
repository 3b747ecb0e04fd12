"""Per-batch cosine-annealing LR schedule with warm restarts.

Exact semantic rebuild of ``models/auxiliary/scheduler.py:12-62``. The
schedule is *stateful* (iteration counter resets and the period multiplies by
``Tm`` when eta reaches eta_min), and the reference evaluates it in float64
host arithmetic — the restart trigger is a float equality-ish comparison
(``eta <= eta_min + 1e-10``) that float32 cos() would miss. We therefore keep
the schedule on the host (scalar math, one call per weight step, zero device
cost) and feed the resulting eta into the jitted train step as a scalar
argument, which keeps the step's compiled signature static.

State is exposed as a plain tuple for checkpoint/resume (an improvement over
the reference, which cannot resume).
"""
from __future__ import annotations

import numpy as np


class LRCosineAnnealingScheduler:
    """eta = eta_min + 0.5 (eta_max - eta_min)(1 + cos(pi * Tcur / Ti));
    restart (Ti *= Tm) when eta hits eta_min. scheduler.py:25-40."""

    def __init__(self, eta_max: float, eta_min: float, Ti: float,
                 Tmultiplier: float, num_batches_per_epoch: float):
        self.eta_min = float(eta_min)
        self.eta_max = float(eta_max)
        self.Ti = float(Ti)
        self.Tcur = 0.0
        self.nbpe = float(num_batches_per_epoch)
        self.iteration_counter = 0.0
        self.eta = float(eta_max)
        self.Tm = float(Tmultiplier)

    def _compute_rule(self) -> float:
        self.eta = self.eta_min + 0.5 * (self.eta_max - self.eta_min) * (
            1 + np.cos(np.pi * self.Tcur / self.Ti)
        )
        return self.eta

    def step(self) -> float:
        self.Tcur = self.iteration_counter / self.nbpe
        self.iteration_counter += 1.0
        eta = self._compute_rule()
        if eta <= self.eta_min + 1e-10:
            self.Tcur = 0
            self.Ti = self.Ti * self.Tm
            self.iteration_counter = 0
        return eta

    # -- checkpoint/resume support (not in the reference) ------------------
    def state(self) -> dict:
        return {
            "Ti": self.Ti,
            "Tcur": self.Tcur,
            "iteration_counter": self.iteration_counter,
            "eta": self.eta,
        }

    def load_state(self, state: dict) -> None:
        self.Ti = state["Ti"]
        self.Tcur = state["Tcur"]
        self.iteration_counter = state["iteration_counter"]
        self.eta = state["eta"]


class FixedScheduler:
    """Constant LR (scheduler.py:50-62)."""

    def __init__(self, lr: float):
        self.lr = float(lr)
        self.eta = self.lr

    def step(self) -> float:
        return self.lr

    def state(self) -> dict:
        return {"lr": self.lr}

    def load_state(self, state: dict) -> None:
        self.lr = state["lr"]
