#!/usr/bin/env python
"""MM-IMDB bilevel search CLI (reference: main_darts_searchable_mmimdb.py)."""
from bmnas_tpu.cli.mmimdb import main_search

if __name__ == "__main__":
    main_search()
