"""bmnas-tpu: TPU-native bilevel multimodal NAS framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
Somedaywilldo/BM-NAS (arXiv:2104.09379). See README.md for the framework
tour and PARITY.md for the component-by-component reference mapping.

Public API entry points:
    bmnas_tpu.genotype           — Genotype schema, parse rules, pickles
    bmnas_tpu.models             — supernet / found-net / backbones
    bmnas_tpu.search             — bilevel steps, scheduler, epoch loop
    bmnas_tpu.data               — task datasets, transforms, grain adapter
    bmnas_tpu.parallel           — GSPMD mesh + multi-host bootstrap
    bmnas_tpu.serving            — compiled found-net inference
    bmnas_tpu.searchers          — per-task searcher facades
"""

__version__ = "0.1.0"

from bmnas_tpu.genotype import (  # noqa: F401
    Genotype,
    StepGenotype,
    PRIMITIVES,
    STEP_EDGE_PRIMITIVES,
    STEP_STEP_PRIMITIVES,
    derive_genotype,
    load_genotype,
    save_genotype,
)
