"""CPU structural pre-bisect of the bf16 MM-IMDB regression (relay down).

Compiles the partitioned and masked bf16 weight steps on CPU and compares
XLA cost/memory analysis: flops, bytes accessed, temp/constant sizes.
Structural deltas (not wall times) are meaningful across backends.

RESULT (2026-08-18, CPU backend): the two programs are byte-identical —
246.537 GFLOP, 2.378 GB accessed, 30,838 HLO lines, identical conv/dot/
transpose/copy counts and temp/argument sizes, zero constant bloat. XLA
dead-code-eliminates the unused frozen-backbone cotangents in the masked
path, so the frozen-partition commit (81ec176) compiles to the SAME step
and cannot explain the r02->r03 bf16 drop (3,522 -> 1,748 samples/s).
Remaining suspects, settled on-chip by bisect_bf16.py: the AOT-executable
timing path (9301225) or relay load during the r03 measurement (the r02
memory notes already record a 2,512-3,151 samples/s run-to-run band).
"""
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from bisect_bf16 import build  # noqa: E402

out = {}
for frozen in (True, False):
    tag = "part" if frozen else "mask"
    fns, state = build(frozen)
    batch = bench.make_batch(0)
    eta = np.float32(1e-3)
    lowered = fns.weight_step.lower(state, batch, eta)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out[f"{tag}_gflops"] = round(float(ca.get("flops", 0)) / 1e9, 3)
        out[f"{tag}_gbytes"] = round(
            float(ca.get("bytes accessed", 0)) / 2**30, 3)
    except Exception as e:
        out[f"{tag}_cost_err"] = str(e)[:100]
    try:
        ma = compiled.memory_analysis()
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            out[f"{tag}_{k}"] = getattr(ma, k, None)
        out[f"{tag}_const_mb"] = round(
            getattr(ma, "constant_size_in_bytes", 0) / 2**20, 1)
    except Exception as e:
        out[f"{tag}_mem_err"] = str(e)[:100]
    hlo = compiled.as_text()
    out[f"{tag}_hlo_lines"] = hlo.count("\n")
    out[f"{tag}_hlo_convs"] = hlo.count(" convolution(")
    out[f"{tag}_hlo_dots"] = hlo.count(" dot(")
    out[f"{tag}_hlo_transposes"] = hlo.count(" transpose(")
    out[f"{tag}_hlo_copies"] = hlo.count(" copy(")

print(json.dumps(out, indent=1, default=str))
