#!/usr/bin/env python
"""EgoGesture found-net retrain/test CLI (reference: main_darts_found_ego.py)."""
from bmnas_tpu.cli.ego import main_found

if __name__ == "__main__":
    main_found()
