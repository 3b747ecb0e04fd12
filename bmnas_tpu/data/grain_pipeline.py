"""Grain-backed input pipeline (multiprocess production data path).

The thread-pool loaders in data/{mmimdb,ntu,ego}.py (plus the native C++ npy
reader) cover the reference's DataLoader role. For deployments that want
process-level parallelism with deterministic global shuffling and
checkpointable iterators, this module adapts the same datasets to
`grain.python.DataLoader`:

  * the dataset objects already expose random-access ``load_sample`` — they
    plug into grain as RandomAccessDataSources;
  * batching pads the final batch and attaches the 'mask' vector, identical
    to the in-tree loaders (static shapes for XLA);
  * ``worker_count > 0`` forks worker processes (the analog of the
    reference's num_workers, models/darts_searchable.py:39-41).
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np


class _SampleSource:
    """RandomAccessDataSource over a dataset with load_sample(idx[, seed])."""

    def __init__(self, dataset, seeded: bool, base_seed: int = 0):
        self._dataset = dataset
        self._seeded = seeded
        self._base_seed = base_seed

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        if self._seeded:
            return self._dataset.load_sample(
                int(idx), int(self._base_seed * 7919 + idx) % (2 ** 32))
        return self._dataset.load_sample(int(idx))


class _PadBatch:
    """grain BatchOperation equivalent: stack + pad to batch_size + mask."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size

    def __call__(self, samples) -> Dict[str, np.ndarray]:
        n = len(samples)
        b = self.batch_size
        out: Dict[str, np.ndarray] = {}
        for key in samples[0]:
            first = np.asarray(samples[0][key])
            arr = np.zeros((b,) + first.shape, first.dtype if
                           first.dtype != np.float64 else np.float32)
            for i, s in enumerate(samples):
                arr[i] = s[key]
            out[key] = arr
        mask = np.zeros((b,), np.float32)
        mask[:n] = 1.0
        out["mask"] = mask
        return out


def grain_batches(dataset, batch_size: int, *, shuffle: bool, seed: int,
                  epoch: int, worker_count: int = 0,
                  seeded_samples: bool = False) -> Iterator[Dict[str, np.ndarray]]:
    """Yield padded+masked host batches via grain.

    Drop-in replacement for ``dataset.batches(...)`` with process workers.
    """
    import grain.python as gp

    source = _SampleSource(dataset, seeded=seeded_samples, base_seed=seed)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=gp.NoSharding(),
        shuffle=shuffle,
        num_epochs=1,
        seed=(seed + epoch) % (2 ** 31),
    )
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=False)],
        worker_count=worker_count,
    )
    pad = _PadBatch(batch_size)
    for batch in loader:
        # grain's Batch stacks dict fields; re-pad the final partial batch
        n = len(next(iter(batch.values())))
        if n == batch_size:
            batch = dict(batch)
            batch["mask"] = np.ones((batch_size,), np.float32)
            yield batch
        else:
            samples = [{k: v[i] for k, v in batch.items()} for i in range(n)]
            yield pad(samples)
