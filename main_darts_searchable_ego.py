#!/usr/bin/env python
"""EgoGesture bilevel search CLI (reference: main_darts_searchable_ego.py)."""
from bmnas_tpu.cli.ego import main_search

if __name__ == "__main__":
    main_search()
