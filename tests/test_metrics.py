"""Metric tests; sklearn (if available) is the oracle for F1 semantics."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from bmnas_tpu.utils.metrics import (
    accuracy_counts,
    add_counts,
    f1_from_counts,
    f1_score_np,
    multilabel_counts,
    zero_multilabel_counts,
)

try:
    from sklearn.metrics import f1_score as sk_f1
    HAVE_SKLEARN = True
except Exception:
    HAVE_SKLEARN = False

RNG = np.random.RandomState(42)


pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

def random_multilabel(b=64, c=23, p=0.2):
    y_true = (RNG.rand(b, c) < p).astype(np.float32)
    y_pred = (RNG.rand(b, c) < p).astype(np.float32)
    return y_true, y_pred


@pytest.mark.skipif(not HAVE_SKLEARN, reason="sklearn not installed")
@pytest.mark.parametrize("average", ["weighted", "macro", "samples"])
def test_matches_sklearn(average):
    y_true, y_pred = random_multilabel()
    want = sk_f1(y_true, y_pred, average=average, zero_division=1)
    got = f1_score_np(y_true, y_pred, average=average, zero_division=1)
    assert got == pytest.approx(want, rel=1e-9)


@pytest.mark.skipif(not HAVE_SKLEARN, reason="sklearn not installed")
def test_zero_support_class_weighted_and_macro():
    # class 3 never true and never predicted -> f1 = zero_division = 1
    y_true = np.zeros((8, 4), np.float32)
    y_pred = np.zeros((8, 4), np.float32)
    y_true[:, 0] = 1
    y_pred[:4, 0] = 1
    for avg in ["weighted", "macro"]:
        want = sk_f1(y_true, y_pred, average=avg, zero_division=1)
        got = f1_score_np(y_true, y_pred, average=avg, zero_division=1)
        assert got == pytest.approx(want, rel=1e-9)


def test_accumulated_counts_equal_direct():
    y_true, y_pred = random_multilabel(b=96)
    acc = zero_multilabel_counts(23)
    for i in range(0, 96, 32):
        c = multilabel_counts(jnp.asarray(y_pred[i:i+32]), jnp.asarray(y_true[i:i+32]))
        acc = add_counts(acc, c)
    host = {k: np.asarray(v) for k, v in acc.items()}
    for avg in ["weighted", "macro", "samples"]:
        assert f1_from_counts(host, avg) == pytest.approx(
            f1_score_np(y_true, y_pred, avg), rel=1e-6)


def test_accuracy_counts():
    logits = jnp.asarray([[1.0, 2.0], [3.0, 0.5], [0.1, 0.2]])
    labels = jnp.asarray([1, 0, 0])
    c = accuracy_counts(logits, labels)
    assert float(c["correct"]) == 2.0
    assert float(c["count"]) == 3.0


@pytest.mark.quick
class TestPreflightAccumulate:
    """search/loop._make_preflight_accumulate: the one-time first-chunk sync
    that turns an async RESOURCE_EXHAUSTED into a minutes-in failure
    (R5HYBRID full-scale NTU postmortem: 50 min of epoch 0 before the OOM
    surfaced at the end-of-phase metric fetch)."""

    def test_accumulates_like_plain_accumulate(self):
        from bmnas_tpu.search.loop import _make_preflight_accumulate
        acc = _make_preflight_accumulate()
        a = {"loss_sum": np.float32(1.0), "correct": np.int32(3)}
        b = {"loss_sum": np.float32(2.0), "correct": np.int32(4)}
        total = acc(None, a)
        total = acc(total, b)
        assert float(total["loss_sum"]) == 3.0
        assert int(total["correct"]) == 7

    def test_first_chunk_fetch_failure_is_rewritten(self):
        from bmnas_tpu.search.loop import _make_preflight_accumulate

        class Exploding:
            def __array__(self, *a, **k):
                raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

        acc = _make_preflight_accumulate()
        with pytest.raises(RuntimeError, match="device_cache_budget_gb"):
            acc(None, {"loss_sum": Exploding()})

    def test_sync_happens_once(self):
        from bmnas_tpu.search.loop import _make_preflight_accumulate
        calls = []

        class Counting:
            def __init__(self, v):
                self.v = v
            def __add__(self, other):
                return Counting(self.v + other.v)
            def __array__(self, *a, **k):
                calls.append(1)
                return np.asarray(self.v, np.float32)

        acc = _make_preflight_accumulate()
        total = acc(None, {"loss_sum": Counting(1.0)})
        total = acc(total, {"loss_sum": Counting(2.0)})
        assert len(calls) == 1  # only the first chunk pays the round-trip
