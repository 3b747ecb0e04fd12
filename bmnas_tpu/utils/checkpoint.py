"""Checkpointing: model snapshots + full-state resume.

The reference persists best models via ``torch.save(state_dict)`` into
``<exp>/best/best_model.pt`` and genotypes via pickle (darts/utils.py:83-105)
but cannot resume an interrupted run (SURVEY.md §5.4). Here:

* model snapshots are single-file msgpack pytrees (flax.serialization) at the
  same ``<exp>/best/best_model.pt`` paths — file-layout parity;
* a full train-state checkpoint (params, opt states, arch, scheduler counters,
  epoch, PRNG key) is written per epoch for resume — an improvement the
  north-star contract asks for.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax.serialization as fser
import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_model(path: str, params: Any, batch_stats: Any,
               arch: Optional[Any] = None) -> None:
    payload = {"params": _to_host(params), "batch_stats": _to_host(batch_stats)}
    if arch is not None:
        payload["arch"] = _to_host(arch)
    with open(path, "wb") as f:
        f.write(fser.msgpack_serialize(payload))


def load_model(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return fser.msgpack_restore(f.read())


def save_state(path: str, state: Any, extra: Optional[Dict[str, Any]] = None) -> None:
    """Full-resume checkpoint. ``state`` is the TrainState pytree; ``extra``
    carries host-side scalars (epoch, scheduler state, best metrics)."""
    payload = {"state": fser.to_state_dict(_to_host(state)),
               "extra": extra or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(fser.msgpack_serialize(payload))
    os.replace(tmp, path)


def restore_state(path: str, state_template: Any):
    """Restore a TrainState from disk given a freshly-built template with the
    same structure. Returns (state, extra)."""
    with open(path, "rb") as f:
        payload = fser.msgpack_restore(f.read())
    state = fser.from_state_dict(state_template, payload["state"])
    return state, payload["extra"]


# ---------------------------------------------------------------------------
# Orbax backend (optional): async, sharded, multi-host-capable checkpoints.
# The msgpack path above is the default (single atomic file, matches the
# reference's one-file-per-exp layout); use these for large multi-host runs.
# ---------------------------------------------------------------------------

def save_state_orbax(path: str, state: Any,
                     extra: Optional[Dict[str, Any]] = None) -> None:
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path),
                   {"state": fser.to_state_dict(_to_host(state)),
                    "extra": extra or {}},
                   force=True)


def restore_state_orbax(path: str, state_template: Any):
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path))
    state = fser.from_state_dict(state_template, payload["state"])
    return state, payload["extra"]
