"""Device-mesh data parallelism (GSPMD).

TPU-native replacement for the reference's single-process
``torch.nn.DataParallel`` (``--parallel`` / ``--use_dataparallel`` flags,
mmimdb_darts_searchable.py:36-37, ntu_darts_searchable.py:50-51): a 1-D
``data`` mesh shards every batch over ICI; params, batch stats, optimizer
states and arch params are replicated. XLA inserts the gradient all-reduces —
semantically identical to DataParallel's scatter/gather but without a
parameter server device, and the arch pytree updates identically on every
chip (the reference keeps arch params outside the replicated module for the
same effect, SURVEY.md §2.5/§5.8).

Scaling beyond one slice needs no code changes: a multi-slice mesh lays DP
over DCN automatically. Tested on the 8-device virtual CPU mesh in CI.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class ParallelContext:
    mesh: Mesh
    batch_sharding: NamedSharding     # shard dim 0 over 'data'
    replicated: NamedSharding

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    def shard_batch(self, batch: Any) -> Any:
        """Place a host batch with dim-0 sharded across the mesh.

        Single-process: a plain device_put scatter. Multi-process (after
        parallel.multihost.ensure_multihost): every process passes the SAME
        global batch — the deterministic seeded loaders already produce
        identical batches on every host — and each process keeps only its
        1/P row slice, assembled into one global array spanning all hosts'
        devices. This makes the multi-process semantics bit-identical to
        the single-host run on the same global batch (DataParallel parity,
        SURVEY.md §2.5) at the cost of P-fold duplicated host-side loading."""
        if jax.process_count() > 1:
            pid, pc = jax.process_index(), jax.process_count()

            def place(x):
                x = np.asarray(x)
                if x.shape[0] % pc:
                    raise ValueError(
                        f"global batch dim {x.shape[0]} not divisible by "
                        f"{pc} processes (pad_batch_to_multiple over "
                        f"jax.device_count() guarantees this in the CLIs)")
                per = x.shape[0] // pc
                local = x[pid * per:(pid + 1) * per]
                return jax.make_array_from_process_local_data(
                    self.batch_sharding, local)

            return jax.tree_util.tree_map(place, batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.batch_sharding), batch
        )

    def replicate(self, tree: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.replicated), tree
        )


def make_parallel_context(num_devices: Optional[int] = None,
                          devices=None) -> ParallelContext:
    """Build a 1-D 'data' mesh over the first ``num_devices`` devices
    (default: all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    mesh = Mesh(np.asarray(devices), ("data",))
    return ParallelContext(
        mesh=mesh,
        batch_sharding=NamedSharding(mesh, P("data")),
        replicated=NamedSharding(mesh, P()),
    )


def pad_batch_to_multiple(batch_size: int, num_devices: int) -> int:
    """Smallest batch size >= requested that divides evenly over devices."""
    return ((batch_size + num_devices - 1) // num_devices) * num_devices
