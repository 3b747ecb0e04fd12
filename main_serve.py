#!/usr/bin/env python
"""Found-net batch-inference serving CLI (TPU-rebuild addition; the
reference has no serving path — see bmnas_tpu/serving.py)."""
from bmnas_tpu.cli.serve import main_serve

if __name__ == "__main__":
    main_serve()
