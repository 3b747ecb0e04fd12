"""Unit tests for genotype schema, parse rules, and pickle compatibility.

The parse rules (pair-product scoring, non-repeat constraint, none-exclusion)
are ported from reference model_search.py:111-182 / node_search.py:110-163 and
verified here against hand-crafted weight matrices with known answers.
"""
import numpy as np
import pytest

from bmnas_tpu.genotype import (
    Genotype,
    StepGenotype,
    PRIMITIVES,
    STEP_STEP_PRIMITIVES,
    derive_genotype,
    load_genotype,
    parse_inner_node,
    parse_outer_edges,
    save_genotype,
    softmax,
)


pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

def one_hot_rows(n_rows, hot_col, n_cols=2, hot=0.9):
    w = np.full((n_rows, n_cols), (1 - hot) / (n_cols - 1))
    w[:, hot_col] = hot
    return w


class TestOuterParse:
    def test_picks_pair_with_highest_product(self):
        # 4 input nodes, 1 step -> 4 rows of (none, skip) weights.
        w = np.array([
            [0.9, 0.1],   # node 0: skip weight 0.1
            [0.2, 0.8],   # node 1: skip weight 0.8
            [0.3, 0.7],   # node 2: skip weight 0.7
            [0.95, 0.05], # node 3
        ])
        gene = parse_outer_edges(w, steps=1, num_input_nodes=4)
        # best product pair is (1,2): 0.8*0.7
        assert gene == [("skip", 1), ("skip", 2)]

    def test_non_repeat_constraint(self):
        # 3 input nodes, 2 steps. Step rows: step0 has 3 rows, step1 has 4.
        w0 = np.array([[0.1, 0.9], [0.2, 0.8], [0.9, 0.1]])
        # step 1 weights: make (0,1) again the best pair; but both 0 and 1
        # are now selected -> pair (0,1) is excluded, the best pair with at
        # least one fresh node must be chosen instead.
        w1 = np.array([[0.1, 0.9], [0.2, 0.8], [0.5, 0.5], [0.5, 0.5]])
        w = np.concatenate([w0, w1], axis=0)
        gene = parse_outer_edges(w, steps=2, num_input_nodes=3)
        assert gene[:2] == [("skip", 0), ("skip", 1)]
        # step 1: candidate pairs with a fresh node: (0,2):0.9*0.5, (1,2):0.8*0.5
        assert gene[2:] == [("skip", 0), ("skip", 2)]

    def test_none_column_never_selected(self):
        # even when 'none' dominates, the op picked is the best non-none.
        w = one_hot_rows(2, hot_col=0, hot=0.99)
        gene = parse_outer_edges(w, steps=1, num_input_nodes=2)
        assert all(op == "skip" for op, _ in gene)

    def test_candidates_are_input_nodes_only(self):
        # 2 input nodes, 2 steps: step 1 has 3 states but only nodes {0,1}
        # are eligible ("sample strategy v3"), so the pair must repeat (0,1)
        # is impossible (both selected) -> wait, with only 2 input nodes the
        # pair (0,1) is the only pair; the reference then yields an empty
        # candidate list only if both are selected AND there is no other pair.
        # With num_input_nodes=2 the reference would crash at step 1; use 3.
        w = np.concatenate([
            np.array([[0.1, 0.9], [0.1, 0.9], [0.1, 0.9]]),
            np.array([[0.1, 0.9], [0.1, 0.9], [0.1, 0.9], [0.9, 0.1]]),
        ])
        gene = parse_outer_edges(w, steps=2, num_input_nodes=3)
        for _, idx in gene:
            assert idx < 3  # never an intermediate state index


class TestInnerParse:
    def test_top2_edges_and_argmax_op(self):
        # node_steps=1: 2 edge rows; gamma row of 4.
        betas = np.array([[0.3, 0.7], [0.6, 0.4]])
        gammas = np.array([[0.1, 0.2, 0.6, 0.1]])
        sg = parse_inner_node(betas, gammas, node_steps=1, node_multiplier=1)
        assert sg.inner_edges == [("skip", 0), ("skip", 1)]
        assert sg.inner_steps == ["LinearGLU"]
        assert sg.inner_concat == [2]

    def test_edge_ranking_by_max_nonnone(self):
        # node_steps=2: rows = 2 (step0: states x,y) + 3 (step1: x,y,s0)
        betas = np.array([
            [0.5, 0.5], [0.5, 0.5],            # step0
            [0.9, 0.1], [0.3, 0.7], [0.2, 0.8] # step1: ranks s2>y>x by skip w
        ])
        gammas = np.array([[0.9, 0.03, 0.03, 0.04], [0.0, 1.0, 0.0, 0.0]])
        sg = parse_inner_node(betas, gammas, node_steps=2, node_multiplier=1)
        assert sg.inner_edges[:2] == [("skip", 0), ("skip", 1)]
        # step1 top-2 by skip weight: state2 (0.8), state1 (0.7)
        assert sg.inner_edges[2:] == [("skip", 2), ("skip", 1)]
        assert sg.inner_steps == ["Sum", "ScaleDotAttn"]
        assert sg.inner_concat == [3]

    def test_gamma_tie_breaks_to_first(self):
        betas = np.array([[0.5, 0.5], [0.5, 0.5]])
        gammas = np.array([[0.25, 0.25, 0.25, 0.25]])
        sg = parse_inner_node(betas, gammas, node_steps=1, node_multiplier=1)
        assert sg.inner_steps == ["Sum"]  # strict > comparison keeps first


class TestDeriveGenotype:
    def test_default_ntu_shape(self):
        # NTU defaults: steps=2, multiplier=2, 8 inputs, node_steps=1.
        rng = np.random.RandomState(0)
        alphas = 1e-3 * rng.randn(8 + 9, 2)
        betas = [1e-3 * rng.randn(2, 2) for _ in range(2)]
        gammas = [1e-3 * rng.randn(1, 4) for _ in range(2)]
        g = derive_genotype(alphas, betas, gammas, steps=2, multiplier=2,
                            num_input_nodes=8, node_steps=1, node_multiplier=1)
        assert len(g.edges) == 4
        assert g.concat == [8, 9]
        assert len(g.steps) == 2
        for sg in g.steps:
            assert isinstance(sg, StepGenotype)
            assert len(sg.inner_edges) == 2
            assert len(sg.inner_steps) == 1

    def test_softmax_rowwise(self):
        x = np.array([[0.0, 1.0], [2.0, 2.0]])
        s = softmax(x)
        np.testing.assert_allclose(s.sum(-1), [1.0, 1.0])
        assert s[1, 0] == pytest.approx(0.5)


class TestPickleCompat:
    def _sample(self):
        return Genotype(
            edges=[("skip", 1), ("skip", 4)],
            concat=[8, 9],
            steps=[StepGenotype(inner_edges=[("skip", 0), ("skip", 1)],
                                inner_steps=["ScaleDotAttn"],
                                inner_concat=[2])],
        )

    def test_round_trip(self, tmp_path):
        g = self._sample()
        p = str(tmp_path / "g.pkl")
        save_genotype(g, p)
        g2 = load_genotype(p)
        assert g2 == g
        assert isinstance(g2, Genotype)
        assert isinstance(g2.steps[0], StepGenotype)

    def test_stream_references_reference_module(self, tmp_path):
        # The emitted pickle must resolve classes via the reference module
        # path so reference-side tooling can read our genotype files.
        p = str(tmp_path / "g.pkl")
        save_genotype(self._sample(), p)
        blob = open(p, "rb").read()
        assert b"models.search.darts.genotypes" in blob

    def test_loads_reference_style_pickle(self, tmp_path):
        # Simulate a pickle produced by the reference: same module path.
        import pickle as _p
        import sys
        import types
        mod_root = types.ModuleType("models")
        mod_search = types.ModuleType("models.search")
        mod_darts = types.ModuleType("models.search.darts")
        mod_geno = types.ModuleType("models.search.darts.genotypes")
        from collections import namedtuple
        RefG = namedtuple("Genotype", "edges steps concat")
        RefS = namedtuple("StepGenotype", "inner_edges inner_steps inner_concat")
        RefG.__module__ = "models.search.darts.genotypes"
        RefS.__module__ = "models.search.darts.genotypes"
        mod_geno.Genotype = RefG
        mod_geno.StepGenotype = RefS
        sys.modules.update({
            "models": mod_root, "models.search": mod_search,
            "models.search.darts": mod_darts,
            "models.search.darts.genotypes": mod_geno,
        })
        try:
            ref = RefG(edges=[("skip", 0), ("skip", 3)], concat=[6, 7],
                       steps=[RefS([("skip", 0), ("skip", 1)], ["Sum"], [2])])
            p = str(tmp_path / "ref.pkl")
            with open(p, "wb") as f:
                _p.dump(ref, f, protocol=2)
        finally:
            for k in ("models", "models.search", "models.search.darts",
                      "models.search.darts.genotypes"):
                sys.modules.pop(k, None)
        g = load_genotype(p)
        assert isinstance(g, Genotype)
        assert g.edges == [("skip", 0), ("skip", 3)]
        assert g.steps[0].inner_steps == ["Sum"]


class TestReferenceFixtureRoundTrip:
    """SURVEY §4 item 5: the commented reference sample genotype at
    main_darts_found_ntu.py:243, committed as a binary pickle fixture
    (tests/fixtures/reference_best_genotype.pkl) authored with plain
    pickle.dump of namedtuples at models.search.darts.genotypes — the exact
    stream the reference's darts/utils.py:96-99 produces."""

    FIXTURE = "tests/fixtures/reference_best_genotype.pkl"

    def _load(self):
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "reference_best_genotype.pkl")
        return load_genotype(path)

    def test_fixture_loads_with_exact_structure(self):
        g = self._load()
        assert isinstance(g, Genotype)
        assert g.edges == [("skip", 3), ("skip", 7)]
        assert g.concat == [8]
        (s,) = g.steps
        assert isinstance(s, StepGenotype)
        assert s.inner_edges == [("skip", 1), ("skip", 0)]
        assert s.inner_steps == ["cat_conv_relu"]
        assert s.inner_concat == [2]

    def test_save_reload_identical(self, tmp_path):
        g = self._load()
        p = str(tmp_path / "rt.pkl")
        save_genotype(g, p)
        g2 = load_genotype(p)
        assert g2 == g

    def test_found_net_compiles_and_runs(self):
        """The fixture (incl. its legacy 'cat_conv_relu' inner op) must
        compile into a FoundFusionNetwork and produce a finite forward."""
        import jax
        import jax.numpy as jnp
        from bmnas_tpu.models.foundnet import FoundFusionNetwork

        g = self._load()
        net = FoundFusionNetwork.from_genotype(
            g, steps=1, multiplier=1, num_input_nodes=8, num_keep_edges=2,
            node_steps=1, node_multiplier=1, C=8, L=4, drpt=0.0)
        feats = [jnp.ones((2, 4, 8)) * 0.1 * (i + 1) for i in range(8)]  # (B,L,C)
        variables = net.init(jax.random.PRNGKey(0), feats, train=False)
        out = net.apply(variables, feats, train=False)
        assert out.shape[0] == 2 and bool(jnp.isfinite(out).all())

    def test_fixture_plots(self, tmp_path):
        from bmnas_tpu.visualize import plot_genotype
        g = self._load()
        base = str(tmp_path / "fix")
        plot_genotype(g, base, task="ntu", num_input_nodes=8,
                      num_keep_edges=2, node_steps=1, node_multiplier=1)
        import os
        assert os.path.exists(base + ".pdf") or os.path.exists(base + ".dot")


def test_save_does_not_shadow_reference_package(tmp_path):
    """save_genotype's reference-path pickle shim must not leave a stub
    'models' package in sys.modules: a persistent empty-__path__ stub would
    make any later `import models.search...` of the real reference fail with
    ModuleNotFoundError (regression: broke test_full_model_parity when run
    after any test that saved a genotype)."""
    import sys

    from bmnas_tpu.genotype import Genotype, StepGenotype, save_genotype

    preexisting = "models" in sys.modules
    g = Genotype(edges=[("skip", 0)],
                 steps=[StepGenotype(inner_edges=[("skip", 0)],
                                     inner_steps=["Sum"], inner_concat=[2])],
                 concat=[2])
    save_genotype(g, str(tmp_path / "g.pkl"))
    if not preexisting:
        assert "models" not in sys.modules
        assert "models.search.darts.genotypes" not in sys.modules
