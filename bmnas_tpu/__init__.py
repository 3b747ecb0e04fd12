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


def _honor_jax_platforms_env():
    """Re-apply the JAX_PLATFORMS env var through jax.config.

    TPU-terminal environments (the axon relay) import jax from
    sitecustomize at interpreter boot, freezing the platform choice before
    any user code runs — a shell ``JAX_PLATFORMS=cpu python main_*.py``
    then silently lands on the TPU (observed: a 'CPU' verification search
    time-sliced the relay against a measured full-scale run). Tests pin
    CPU the reliable way (tests/conftest.py: jax.config.update after
    import); this hook gives every CLI/bench/dryrun entry point the same
    guarantee, since they all import bmnas_tpu before touching a backend.
    No-op when the env var is unset or jax is not importable, and safe
    when backends are already initialized with the same platform."""
    import os
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass


_honor_jax_platforms_env()

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
