"""Property tests for the Misra-Gries fold (operators/sketches.py):
the undercount bound and the heavy-hitter superset guarantee must hold
for ANY stream and ANY batching — hypothesis searches for counter-
examples the zipf fixtures would never produce (adversarial batch
splits, ties at the compression boundary, singleton floods)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_mini_spark.operators.sketches import mg_fold

# streams of small-alphabet tokens (collisions guaranteed), chopped
# into arbitrary batch sizes by a separate strategy
_stream = st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=400)
_k = st.integers(min_value=2, max_value=12)


def _run_batched(stream: list[int], cuts: list[int], k: int) -> dict[str, int]:
    counters: dict[str, int] = {}
    prev = 0
    for cut in [*sorted(c % (len(stream) + 1) for c in cuts), len(stream)]:
        batch = stream[prev:cut]
        prev = cut
        counters = mg_fold(counters, dict(Counter(str(x) for x in batch)), k)
    return counters


@settings(max_examples=300, deadline=None)
@given(stream=_stream, cuts=st.lists(st.integers(min_value=0), max_size=8), k=_k)
def test_undercount_bound(stream, cuts, k):
    """For every item: 0 <= true_count − counter <= N/(k+1), with
    counter(x) = 0 for items not in the sketch — the MG guarantee that
    makes the candidate union a provable heavy-hitter superset."""
    counters = _run_batched(stream, cuts, k)
    true = Counter(str(x) for x in stream)
    n = len(stream)
    for item, c_true in true.items():
        c_est = counters.get(item, 0)
        assert 0 <= c_est <= c_true
        assert c_true - c_est <= n / (k + 1)
    # no phantom counters
    assert set(counters) <= set(true)
    assert len(counters) <= k + 1


@settings(max_examples=300, deadline=None)
@given(stream=_stream, cuts=st.lists(st.integers(min_value=0), max_size=8), k=_k)
def test_heavy_hitter_superset(stream, cuts, k):
    """Any item with frequency STRICTLY above N/(k+1) must survive in
    the sketch — the property heavy_hitters_exact relies on before its
    exact recount."""
    counters = _run_batched(stream, cuts, k)
    true = Counter(str(x) for x in stream)
    n = len(stream)
    for item, c_true in true.items():
        if c_true > n / (k + 1):
            assert item in counters, (item, c_true, n, k)


@settings(max_examples=100, deadline=None)
@given(stream=_stream, k=_k, seed=st.integers(min_value=0, max_value=2**31))
def test_batching_independence_of_guarantee(stream, k, seed):
    """The guarantee (not the counter values) must hold under BOTH the
    one-batch and per-element batchings — the partition-layout
    independence heavy_hitters_exact's union argument needs."""
    one = mg_fold({}, dict(Counter(str(x) for x in stream)), k)
    per = {}
    for x in stream:
        per = mg_fold(per, {str(x): 1}, k)
    true = Counter(str(x) for x in stream)
    n = len(stream)
    for counters in (one, per):
        for item, c_true in true.items():
            if c_true > n / (k + 1):
                assert item in counters


@settings(max_examples=300, deadline=None)
@given(
    stream=_stream,
    cuts=st.lists(st.integers(min_value=0), max_size=8),
    k=_k,
    denom=st.integers(min_value=2, max_value=12),
)
def test_candidates_then_exact_recount_equals_naive(stream, cuts, k, denom):
    """The FULL sketch-then-verify pipeline — MG candidates from any
    batching, exact recount restricted to candidates, threshold
    freq·denom > N — must equal the naive exact answer whenever
    denom < k+1. This is the end-to-end property heavy_hitters_mg and
    stream_mg_incremental claim: incremental candidate maintenance
    never changes the final answer."""
    if denom >= k + 1:
        return  # outside the operator's declared precondition
    counters = _run_batched(stream, cuts, k)
    true = Counter(str(x) for x in stream)
    n = len(stream)
    naive = {item for item, c in true.items() if c * denom > n}
    via_sketch = {item for item in counters if true[item] * denom > n}
    assert via_sketch == naive
