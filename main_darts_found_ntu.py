#!/usr/bin/env python
"""NTU found-net retrain/test CLI (reference: main_darts_found_ntu.py)."""
from bmnas_tpu.cli.ntu import main_found

if __name__ == "__main__":
    main_found()
