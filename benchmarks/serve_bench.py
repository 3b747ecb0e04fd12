"""Serving-layer bench rows for bench.py (VERDICT r04 #8).

Two measurements, both chip-bound and bounded:
  * ego_serving_samples_per_sec — FoundRGBDepthNet batch-96 inference
    through FoundNetServer with bf16 weights + the fused Pallas eval cell
    (serving.py:38-66, ops/kernels/node_mixed.py). Timed on the device
    dispatch chain with a single scalar sync per chain (host fetches of the
    full logits cost seconds over the relay tunnel and would measure the
    tunnel, not the chip — see bench.py's timing-protocol note).
  * export_roundtrip_ok — a jax.export artifact (weights baked in as
    StableHLO constants) is serialized, deserialized and CALLED on the
    attached TPU platform (serving.py:83-157); proves the deployment
    artifact path end-to-end on real hardware. Uses a small found net so
    the blob stays MBs, not the flagship's hundreds.

Reference parity note: the reference has no serving layer at all (found
nets are re-instantiated ad hoc in the test-only CLI modes,
main_darts_found_*.py); this subsystem is an addition.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _ego_server(batch=96):
    from bmnas_tpu.genotype import Genotype, StepGenotype
    from bmnas_tpu.models.ego import FoundRGBDepthNet
    from bmnas_tpu.serving import FoundNetServer

    geno = Genotype(
        edges=[("skip", 3), ("skip", 7), ("skip", 2), ("skip", 6)],
        steps=[StepGenotype([("skip", 0), ("skip", 1), ("skip", 2),
                             ("skip", 0), ("skip", 1), ("skip", 3)],
                            ["ScaleDotAttn", "LinearGLU", "ConcatFC"],
                            [2, 3, 4]),
               StepGenotype([("skip", 1), ("skip", 0), ("skip", 2),
                             ("skip", 1), ("skip", 0), ("skip", 3)],
                            ["LinearGLU", "Sum", "ScaleDotAttn"],
                            [2, 3, 4])],
        concat=[8, 9])
    model = FoundRGBDepthNet.from_genotype(
        geno, backbone_dtype=jnp.bfloat16, C=128, L=8, steps=2, multiplier=2,
        node_steps=3, node_multiplier=3, num_input_nodes=8, num_keep_edges=2,
        num_outputs=83, drpt=0.0)
    r = np.random.RandomState(0)
    batch0 = {
        "rgb": jnp.asarray(r.rand(batch, 32, 112, 112, 3).astype(np.float32)),
        "depth": jnp.asarray(r.rand(batch, 32, 112, 112, 1).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch0, None, False)
    server = FoundNetServer(model, variables["params"],
                            variables["batch_stats"], dtype=jnp.bfloat16,
                            fused=True)
    return server, batch0, batch


def _time_infer(server, batch0, iters=30, warm=4, reps=2):
    """Median per-dispatch time; scalar-sync per chain (not per step)."""
    infer, variables = server._infer, server._variables
    out = None
    for _ in range(warm):
        out = infer(variables, batch0)
    float(out[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, batch0)
        float(out[0, 0])
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2], (times[0], times[-1])


def _export_roundtrip():
    """Small found net → export bytes → deserialize → call on this chip."""
    from bmnas_tpu.genotype import Genotype, StepGenotype
    from bmnas_tpu.models.mmimdb import FoundImageTextNet
    from bmnas_tpu.serving import FoundNetServer, load_exported

    geno = Genotype(
        edges=[("skip", 0), ("skip", 4), ("skip", 2), ("skip", 5)],
        concat=[6, 7],
        steps=[StepGenotype([("skip", 0), ("skip", 1)], ["ScaleDotAttn"],
                            [2]),
               StepGenotype([("skip", 1), ("skip", 0)], ["Sum"], [2])])
    model = FoundImageTextNet.from_genotype(
        geno, C=32, L=8, steps=2, multiplier=2, node_steps=1,
        node_multiplier=1, num_input_nodes=6, num_keep_edges=2,
        num_outputs=23, drpt=0.0)
    batch = {"image": jnp.zeros((4, 64, 64, 3)), "text": jnp.zeros((4, 300))}
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    server = FoundNetServer(model, variables["params"],
                            variables["batch_stats"])
    blob = server.export_bytes(batch)
    exported = load_exported(blob)
    logits = exported.predict(batch)
    ok = bool(np.all(np.isfinite(logits))) and logits.shape == (4, 23)
    return ok, len(blob), list(exported.platforms)


def measure_serving():
    server, batch0, batch = _ego_server()
    t_step, spread = _time_infer(server, batch0)
    rows = {
        "ego_serving_samples_per_sec": round(batch / t_step, 2),
        "ego_serving_step_ms": round(t_step * 1e3, 2),
        "ego_serving_step_ms_range": [round(t * 1e3, 2) for t in spread],
        "ego_serving_batch": batch,
        "ego_serving_note": "FoundNetServer, bf16 weights, fused Pallas "
                            "eval cell (serving.py:38-66)",
    }
    try:
        ok, size, platforms = _export_roundtrip()
        rows.update({
            "export_roundtrip_ok": ok,
            "export_artifact_bytes": size,
            "export_platforms": platforms,
        })
    except Exception as e:
        rows["export_roundtrip_error"] = f"{type(e).__name__}: {e}"[:200]
    return rows


if __name__ == "__main__":
    import json
    print(json.dumps(measure_serving()))
