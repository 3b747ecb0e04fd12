"""Multi-host (multi-slice) runtime initialization.

The reference tops out at single-process ``nn.DataParallel`` (its DDP path
is commented out — ntu_darts_searchable.py:52). Here the same
``make_parallel_context()`` code scales past one host: call
:func:`ensure_multihost` before building the mesh and JAX's distributed
runtime assembles the global device set; the 1-D ``data`` mesh then spans
all slices, with gradient all-reduces riding ICI within a slice and DCN
across slices (GSPMD inserts both automatically).

No-op on a single host, so CLIs can call it unconditionally.
"""
from __future__ import annotations

import os
from typing import Optional


def ensure_multihost(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > cloud-TPU auto-detection
    (jax.distributed.initialize with no args inside a TPU pod). Returns True
    if the distributed runtime was (or already is) initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single-host run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except RuntimeError:
        # already initialized
        return True


def is_primary_host() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax
    return jax.process_index() == 0
