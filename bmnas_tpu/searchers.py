"""Searcher facade classes (API parity with models/darts_searchable.py).

The reference exposes per-task searcher objects that own the dataloaders and
a ``.search()`` method (MMIMDB_Searcher :25-43, NTUSearcher :46-68,
Ego_Searcher :70-90). The CLI modules already build everything; these thin
facades give library users the same entry shape:

    searcher = MMIMDBSearcher(args, logger)
    best_metric, best_genotype = searcher.search()
"""
from __future__ import annotations


class _SearcherBase:
    _run = None

    def __init__(self, args, logger, device=None):
        # ``device`` accepted for signature parity; placement is managed by
        # jax/GSPMD (SURVEY.md §2.5).
        self.args = args
        self.logger = logger

    def search(self):
        return type(self)._run(self.args, self.logger)


class MMIMDBSearcher(_SearcherBase):
    @staticmethod
    def _run(args, logger):
        from bmnas_tpu.cli.mmimdb import run_search
        return run_search(args, logger)


class NTUSearcher(_SearcherBase):
    @staticmethod
    def _run(args, logger):
        from bmnas_tpu.cli.ntu import run_search
        return run_search(args, logger)


class EgoSearcher(_SearcherBase):
    @staticmethod
    def _run(args, logger):
        from bmnas_tpu.cli.ego import run_search
        return run_search(args, logger)


# reference spellings
MMIMDB_Searcher = MMIMDBSearcher
Ego_Searcher = EgoSearcher
