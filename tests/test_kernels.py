"""Pallas kernel equivalence tests (interpret mode on CPU)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmnas_tpu.ops.kernels.node_mixed import (
    NodeMixedParams,
    fuse_bn_into_dense,
    node_mixed_op_fused,
    node_mixed_op_reference,
)

RNG = np.random.RandomState(0)


def make_params(L, C):
    return NodeMixedParams(
        ln_scale=jnp.asarray(RNG.randn(L, C).astype(np.float32)),
        ln_bias=jnp.asarray(RNG.randn(L, C).astype(np.float32)),
        glu_kernel=jnp.asarray(RNG.randn(2 * C, 2 * C).astype(np.float32) * 0.1),
        glu_bias=jnp.asarray(RNG.randn(2 * C).astype(np.float32)),
        cfc_kernel=jnp.asarray(RNG.randn(2 * C, C).astype(np.float32) * 0.1),
        cfc_bias=jnp.asarray(RNG.randn(C).astype(np.float32)),
    )


@pytest.mark.parametrize("B,L,C", [(2, 8, 16), (3, 16, 192)])
def test_fused_matches_reference(B, L, C):
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    gammas = jax.nn.softmax(jnp.asarray([0.1, 0.4, 0.3, 0.2]))
    p = make_params(L, C)
    want = node_mixed_op_reference(x, y, gammas, p)
    got = node_mixed_op_fused(x, y, gammas, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_one_hot_gammas_select_branches():
    B, L, C = 2, 8, 16
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    p = make_params(L, C)
    # gamma = e0 -> exactly x + y
    got = node_mixed_op_fused(x, y, jnp.asarray([1.0, 0, 0, 0]), p,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x + y), rtol=1e-5)


def test_bn_folding():
    C = 8
    kernel = jnp.asarray(RNG.randn(2 * C, C).astype(np.float32))
    bias = jnp.asarray(RNG.randn(C).astype(np.float32))
    scale = jnp.asarray(RNG.rand(C).astype(np.float32) + 0.5)
    bn_bias = jnp.asarray(RNG.randn(C).astype(np.float32))
    mean = jnp.asarray(RNG.randn(C).astype(np.float32))
    var = jnp.asarray(RNG.rand(C).astype(np.float32) + 0.5)
    xk, xb = fuse_bn_into_dense(kernel, bias, scale, bn_bias, mean, var)
    x = jnp.asarray(RNG.randn(5, 2 * C).astype(np.float32))
    want = scale * ((x @ kernel + bias) - mean) / jnp.sqrt(var + 1e-5) + bn_bias
    got = x @ xk + xb
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=1e-5)


@pytest.mark.parametrize("op", ["Sum", "ScaleDotAttn", "LinearGLU",
                                "ConcatFC"])
def test_fused_found_cell_matches_composite(op):
    """The whole-cell kernel (inner op + residual + LN in one Pallas call)
    == FoundNodeCell's composite eval forward, for every inner op at
    node_steps=1, with parameters extracted+folded straight from the flax
    variables tree."""
    from bmnas_tpu.models.foundnet import FoundNodeCell
    from bmnas_tpu.ops.kernels.node_mixed import (
        found_cell_params_from_flax,
        found_cell_steps_cfg,
        found_node_cell_multi_fused,
    )

    B, L, C = 3, 8, 16
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    cell = FoundNodeCell(inner_edges=(("skip", 0), ("skip", 1)),
                         inner_steps=(op,), node_steps=1, node_multiplier=1,
                         C=C, L=L, drpt=0.0)
    variables = cell.init(jax.random.PRNGKey(0), x, y, True)
    # randomize BN stats so folding is actually exercised
    if "batch_stats" in variables:
        variables = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                RNG.rand(*a.shape).astype(np.float32) * 0.5),
            variables)
    want = cell.apply(variables, x, y, False)

    p = found_cell_params_from_flax(variables, (op,), C, L, 1)
    cfg = found_cell_steps_cfg((("skip", 0), ("skip", 1)), (op,))
    got = found_node_cell_multi_fused(x, y, p, cfg, multiplier=1,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # and through the module's own fused_eval switch (identical params)
    fused_cell = cell.clone(fused_eval=True)
    got2 = fused_cell.apply(variables, x, y, False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_eval_full_found_net_and_server():
    """--fused_kernels end to end: a FoundImageTextNet with fused_eval=True
    produces the composite's logits, and FoundNetServer(fused=True) serves
    them."""
    from bmnas_tpu.genotype import Genotype, StepGenotype
    from bmnas_tpu.models.mmimdb import FoundImageTextNet
    from bmnas_tpu.serving import FoundNetServer

    geno = Genotype(
        edges=[("skip", 0), ("skip", 4), ("skip", 2), ("skip", 5)],
        concat=[6, 7],
        steps=[StepGenotype([("skip", 0), ("skip", 1)], ["ScaleDotAttn"], [2]),
               StepGenotype([("skip", 1), ("skip", 0)], ["LinearGLU"], [2])],
    )
    kwargs = dict(C=8, L=4, steps=2, multiplier=2, node_steps=1,
                  node_multiplier=1, num_input_nodes=6, num_keep_edges=2,
                  num_outputs=5, drpt=0.0)
    model = FoundImageTextNet.from_genotype(geno, **kwargs)
    batch = {"image": jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32)),
             "text": jnp.asarray(RNG.randn(2, 300).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    want = model.apply(variables, batch, None, False)

    fused_model = model.clone(fused_eval=True)
    got = fused_model.apply(variables, batch, None, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    server = FoundNetServer(model, variables["params"],
                            variables["batch_stats"], fused=True)
    assert server.model.fused_eval
    logits = server.predict(batch)
    np.testing.assert_allclose(logits, np.asarray(want), rtol=2e-4,
                               atol=2e-4)


def test_fused_cell_bf16_dtype():
    """bf16 serving regression: the kernels accumulate in f32 but must store
    back in the output dtype (crashed with 'Invalid dtype for swap' before)."""
    from bmnas_tpu.ops.kernels.node_mixed import (
        FoundCellParams,
        found_node_cell_multi_fused,
    )

    B, L, C = 2, 4, 8
    p = make_params(L, C)
    cp = FoundCellParams(
        ln1_scale=p.ln_scale[None], ln1_bias=p.ln_bias[None],
        glu_kernel=p.glu_kernel[None], glu_bias=p.glu_bias[None],
        cfc_kernel=p.cfc_kernel[None], cfc_bias=p.cfc_bias[None],
        oc_kernel=None, oc_bias=None,
        ln2_scale=jnp.ones((L, C)), ln2_bias=jnp.zeros((L, C)))
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32)).astype(jnp.bfloat16)
    out = found_node_cell_multi_fused(
        x, x, cp, ((1, (True, 0), (True, 1)),), multiplier=1, interpret=True)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()
    got16 = node_mixed_op_fused(x, x, jnp.asarray([0.25] * 4), p,
                                interpret=True)
    assert got16.dtype == jnp.bfloat16


@pytest.mark.parametrize("node_steps,node_multiplier,ops", [
    (2, 2, ("ConcatFC", "ScaleDotAttn")),   # NTU found default shape
    (2, 2, ("LinearGLU", "LinearGLU")),     # repeated class -> name counters
    (2, 1, ("Sum", "ConcatFC")),
    (3, 1, ("ScaleDotAttn", "Sum", "ConcatFC")),  # ego-like node_steps=3
])
def test_fused_multi_step_cell_matches_composite(node_steps, node_multiplier,
                                                 ops):
    """found_node_cell_multi_fused == FoundNodeCell composite eval forward
    for chained inner steps and node_multiplier out_conv (NTU/ego found
    shapes the single-step kernel could not host)."""
    from bmnas_tpu.models.foundnet import FoundNodeCell
    from bmnas_tpu.ops.kernels.node_mixed import (
        found_cell_params_from_flax,
        found_cell_steps_cfg,
        found_node_cell_multi_fused,
    )

    B, L, C = 3, 8, 16
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    # chained edges: step i consumes states (i, i+1) -> exercises chaining
    inner_edges = tuple(
        e for i in range(node_steps) for e in (("skip", i), ("skip", i + 1)))
    cell = FoundNodeCell(inner_edges=inner_edges, inner_steps=ops,
                         node_steps=node_steps,
                         node_multiplier=node_multiplier,
                         C=C, L=L, drpt=0.0)
    variables = cell.init(jax.random.PRNGKey(0), x, y, True)
    if "batch_stats" in variables:
        variables = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                RNG.rand(*a.shape).astype(np.float32) * 0.5),
            variables)
    want = cell.apply(variables, x, y, False)

    p = found_cell_params_from_flax(variables, ops, C, L, node_multiplier)
    cfg = found_cell_steps_cfg(inner_edges, ops)
    got = found_node_cell_multi_fused(x, y, p, cfg,
                                      multiplier=node_multiplier,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # and through the module's own fused_eval switch (identical params)
    fused_cell = cell.clone(fused_eval=True)
    got2 = fused_cell.apply(variables, x, y, False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_fallback_logs_reason(caplog):
    """A genotype outside the fusable set must fall back to the composite
    WITH a log line (VERDICT r2 item 5: no silent no-op)."""
    import logging

    from bmnas_tpu.models.foundnet import FoundNodeCell

    B, L, C = 2, 4, 8
    x = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    y = jnp.asarray(RNG.randn(B, L, C).astype(np.float32))
    cell = FoundNodeCell(inner_edges=(("fc_relu", 0), ("skip", 1)),
                         inner_steps=("Sum",), node_steps=1,
                         node_multiplier=1, C=C, L=L, drpt=0.0,
                         fused_eval=True)
    variables = cell.init(jax.random.PRNGKey(0), x, y, True)
    with caplog.at_level(logging.INFO, logger="bmnas_tpu"):
        out = cell.apply(variables, x, y, False)
    assert out.shape == (B, L, C)
    assert any("composite fallback" in r.message for r in caplog.records)
