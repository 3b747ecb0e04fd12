"""Experiment directory + logging management.

Reference parity: ``darts/utils.py:115-127`` (create_exp_dir with
``architectures/`` and ``best/`` subdirs) and the logging setup every main
script repeats (e.g. ``main_darts_searchable_mmimdb.py:75-81`` — stdout +
``<exp>/log.txt`` with the '%m/%d %I:%M:%S %p' date format).
"""
from __future__ import annotations

import logging
import os
import sys
import time

LOG_FORMAT = "%(asctime)s %(message)s"
DATE_FORMAT = "%m/%d %I:%M:%S %p"


def create_exp_dir(path: str) -> str:
    """Create the reference's <exp>/{architectures,best} layout
    (darts/utils.py:115-127).

    Multi-process runs: initializes the distributed runtime first (no-op
    without a coordinator) and gives every non-primary process a
    '-procN'-suffixed directory, so identical deterministic artifacts never
    race on a shared filesystem; the primary's directory is the canonical
    one. Callers must use the RETURNED path."""
    from bmnas_tpu.parallel.multihost import ensure_multihost, is_primary_host
    ensure_multihost()
    import jax
    if jax.process_count() > 1 and not is_primary_host():
        path = f"{path}-proc{jax.process_index()}"
    os.makedirs(path, exist_ok=True)
    os.makedirs(os.path.join(path, "architectures"), exist_ok=True)
    os.makedirs(os.path.join(path, "best"), exist_ok=True)
    return path


def timestamped_exp_dir(base: str, task: str, prefix: str, save_name: str) -> str:
    """'<base>/<task>/<prefix>-<save_name>-<timestamp>' — the reference's
    naming scheme (main_darts_searchable_mmimdb.py:70-71)."""
    name = "{}-{}-{}".format(prefix, save_name, time.strftime("%Y%m%d-%H%M%S"))
    return os.path.join(base, task, name)


def setup_logger(exp_dir: str, name: str = "bmnas") -> logging.Logger:
    logging.basicConfig(stream=sys.stdout, level=logging.INFO,
                        format=LOG_FORMAT, datefmt=DATE_FORMAT)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    fh = logging.FileHandler(os.path.join(exp_dir, "log.txt"))
    fh.setFormatter(logging.Formatter(LOG_FORMAT, datefmt=DATE_FORMAT))
    logger.addHandler(fh)
    return logger
