#!/usr/bin/env python
"""MM-IMDB found-net retrain/test CLI (reference: main_darts_found_mmimdb.py)."""
from bmnas_tpu.cli.mmimdb import main_found

if __name__ == "__main__":
    main_found()
