#!/usr/bin/env python
"""NTU bilevel search CLI (reference: main_darts_searchable_ntu.py)."""
from bmnas_tpu.cli.ntu import main_search

if __name__ == "__main__":
    main_search()
