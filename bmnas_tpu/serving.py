"""Found-net inference serving.

The reference has no serving path (models are re-instantiated ad hoc for the
test-only CLI mode). Production-oriented additions here:

  * a compiled inference function per (genotype, batch size, dtype) — the
    genotype is static so XLA sees a fixed DAG;
  * optional bfloat16 activations/weights (MXU-native; backbone convs
    dominate and are numerically robust at bf16 — logits computed in fp32);
  * ``fused=True``: the fusion cell's eval forward runs as one Pallas
    whole-cell kernel (ops/kernels/node_mixed.found_node_cell_multi_fused — inner
    op + residual + LayerNorm in a single VMEM residency, BNs folded);
    covers arbitrary node_steps/node_multiplier genotypes (the multi-step
    kernel walks the compiled inner DAG; tests/test_kernels.py), off by
    default;
  * fixed batch with mask padding, matching the training data contract;
  * optional data-parallel serving over a device mesh;
  * ``jax.export`` deployment artifacts: one serialized blob holding the
    StableHLO graph WITH the trained weights baked in as constants,
    loadable and callable on cpu/tpu with plain jax — no bmnas_tpu, no
    model code, no checkpoint files (``FoundNetServer.save_exported`` /
    ``load_exported``; ``main_serve.py --export/--from_export``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bmnas_tpu.parallel.mesh import ParallelContext


class FoundNetServer:
    """Wraps a found task net + trained variables for batched inference."""

    def __init__(self, model, params: Any, batch_stats: Any,
                 dtype=jnp.float32,
                 parallel_ctx: Optional[ParallelContext] = None,
                 fused: bool = False):
        if fused and hasattr(model, "fused_eval"):
            model = model.clone(fused_eval=True)
        self.model = model
        self.dtype = dtype
        variables = {"params": params, "batch_stats": batch_stats}
        if dtype != jnp.float32:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                variables)
        self.parallel_ctx = parallel_ctx
        if parallel_ctx is not None:
            variables = parallel_ctx.replicate(variables)
        self._variables = variables

        def infer(variables, batch):
            if dtype != jnp.float32:
                batch = {k: v.astype(dtype)
                         if jnp.issubdtype(v.dtype, jnp.floating) else v
                         for k, v in batch.items()}
            logits = model.apply(variables, batch, None, False)
            return logits.astype(jnp.float32)

        self._infer = jax.jit(infer)

    def predict(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """Run one batch; returns host logits for valid rows only."""
        if self.parallel_ctx is not None:
            batch = self.parallel_ctx.shard_batch(batch)
        logits = self._infer(self._variables, batch)
        logits = np.asarray(logits)
        if "mask" in batch:
            n = int(np.asarray(batch["mask"]).sum())
            return logits[:n]
        return logits

    def predict_stream(self, batches) -> np.ndarray:
        """Run an iterator of batches; returns concatenated logits."""
        outs = [self.predict(b) for b in batches]
        return np.concatenate(outs, axis=0)

    def export_bytes(self, example_batch: Dict[str, Any]) -> bytes:
        """Serialize a self-contained inference artifact.

        The trained variables are closed over, so ``jax.export`` bakes them
        into the StableHLO module as constants: the returned blob is the
        whole deployable model. Lowered for BOTH cpu and tpu when possible
        (the Pallas ``fused`` path is platform-specific, so it falls back
        to the current platform alone). Batch shapes/dtypes are static —
        serve fixed batches with mask padding, the training data contract.
        """
        from jax import export as jax_export

        if self.parallel_ctx is not None:
            raise ValueError(
                "export from a mesh-sharded server is not supported; build "
                "the server without parallel_ctx to export (the artifact "
                "itself can then be served data-parallel by the consumer)")
        variables = self._variables
        infer = self._infer

        def infer_closed(batch):
            return infer(variables, batch)

        args = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                           jnp.asarray(x).dtype),
            dict(example_batch))
        jitted = jax.jit(infer_closed)
        try:
            exp = jax_export.export(jitted, platforms=("cpu", "tpu"))(args)
        except Exception:  # platform-specific lowering (e.g. Pallas kernel)
            exp = jax_export.export(jitted)(args)
        return exp.serialize()

    def save_exported(self, path: str,
                      example_batch: Dict[str, Any]) -> int:
        """Write the export artifact; returns its size in bytes."""
        blob = self.export_bytes(example_batch)
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)


class ExportedServer:
    """Serve from a ``jax.export`` artifact — no model code, no snapshot.

    Mirrors ``FoundNetServer.predict``'s mask-trimming contract so the two
    are drop-in interchangeable on the serving loop."""

    def __init__(self, blob: bytes):
        from jax import export as jax_export
        self._exported = jax_export.deserialize(blob)

    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    def predict(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        logits = np.asarray(self._exported.call(dict(batch)))
        if "mask" in batch:
            n = int(np.asarray(batch["mask"]).sum())
            return logits[:n]
        return logits

    def predict_stream(self, batches) -> np.ndarray:
        return np.concatenate([self.predict(b) for b in batches], axis=0)


def load_exported(path_or_bytes) -> ExportedServer:
    """Rehydrate an exported artifact (path or raw bytes)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return ExportedServer(bytes(path_or_bytes))
    with open(path_or_bytes, "rb") as f:
        return ExportedServer(f.read())


def load_server(snapshot_path: str, model, dtype=jnp.float32,
                parallel_ctx: Optional[ParallelContext] = None,
                fused: bool = False) -> FoundNetServer:
    """Build a server from a ``best_model.pt`` snapshot (utils.checkpoint)."""
    from bmnas_tpu.utils.checkpoint import load_model
    snap = load_model(snapshot_path)
    return FoundNetServer(model, snap["params"], snap["batch_stats"],
                          dtype=dtype, parallel_ctx=parallel_ctx, fused=fused)
