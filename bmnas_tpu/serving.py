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
  * optional data-parallel serving over a device mesh.
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


def load_server(snapshot_path: str, model, dtype=jnp.float32,
                parallel_ctx: Optional[ParallelContext] = None,
                fused: bool = False) -> FoundNetServer:
    """Build a server from a ``best_model.pt`` snapshot (utils.checkpoint)."""
    from bmnas_tpu.utils.checkpoint import load_model
    snap = load_model(snapshot_path)
    return FoundNetServer(model, snap["params"], snap["batch_stats"],
                          dtype=dtype, parallel_ctx=parallel_ctx, fused=fused)
