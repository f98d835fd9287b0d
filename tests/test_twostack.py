"""TwoStackLite engine vs the brute-force NaiveOracle (reference
TwoStackLiteAggregatorTest semantics: exact agreement with naive recompute
on sorted events/queries)."""

import numpy as np
import pytest

from raywin.api import Aggregation, Operation, TimeUnit, Window
from raywin.aggregator.twostack import two_stack_aggregate
from raywin.aggregator.windowing import NaiveOracle

HOUR = 3600 * 1000
DAY = 24 * HOUR
BASE = 1_700_000_000_000


def _mk_events(rng, n):
    ts = np.sort(rng.integers(0, 10 * DAY, n)) + BASE
    vals = rng.normal(50, 20, n).round(2)
    vals[rng.random(n) < 0.08] = np.nan  # null guard path
    return ts, vals


@pytest.mark.parametrize(
    "op,args,window",
    [
        (Operation.SUM, {}, Window(1, TimeUnit.DAYS)),
        (Operation.COUNT, {}, Window(6, TimeUnit.HOURS)),
        (Operation.AVERAGE, {}, Window(2, TimeUnit.DAYS)),
        (Operation.MIN, {}, Window(1, TimeUnit.DAYS)),
        (Operation.MAX, {}, None),  # unbounded
        (Operation.LAST_K, {"k": 3}, Window(12, TimeUnit.HOURS)),
        (Operation.UNIQUE_COUNT, {}, Window(3, TimeUnit.DAYS)),
        (Operation.HISTOGRAM, {}, Window(1, TimeUnit.DAYS)),
    ],
)
def test_two_stack_matches_naive(op, args, window):
    rng = np.random.default_rng(5)
    ev_ts, ev_vals = _mk_events(rng, 400)
    q_ts = np.sort(rng.integers(0, 10 * DAY, 120)) + BASE
    agg = Aggregation(op, "v", windows=[window] if window else None, arg_map=args)
    part = agg.unpack()[0]

    if op is Operation.HISTOGRAM:
        ev_vals = np.where(np.isnan(ev_vals), np.nan, np.round(ev_vals / 20))
        vals_list = [None if np.isnan(v) else str(int(v)) for v in ev_vals]
    else:
        vals_list = [None if np.isnan(v) else float(v) for v in ev_vals]

    got = two_stack_aggregate(ev_ts, vals_list, q_ts, part)

    oracle = NaiveOracle([part])
    events = [
        {"ts": int(t), "v": v} for t, v in zip(ev_ts, vals_list) if v is not None
    ]
    exp = [row[part.output_column] for row in oracle.aggregate(events, [int(q) for q in q_ts])]

    assert len(got) == len(exp)
    for g, e, q in zip(got, exp, q_ts):
        if e is None:
            assert g is None, q
        elif isinstance(e, float):
            assert g == pytest.approx(e, rel=1e-9), q
        else:
            assert g == e, q


def test_two_stack_amortized_shape():
    """Every event enters the back once and flips to the front at most once —
    total op-merge work is O(n + q), independent of window length."""
    calls = {"n": 0}

    from raywin.aggregator import scalar_ops

    class CountingSum(scalar_ops.Sum):
        def merge(self, a, b):
            calls["n"] += 1
            return super().merge(a, b)

    import raywin.aggregator.twostack as ts_mod

    orig = ts_mod.make_scalar_op
    ts_mod.make_scalar_op = lambda part: CountingSum()
    try:
        n = 3000
        rng = np.random.default_rng(1)
        ev_ts = np.sort(rng.integers(0, 30 * DAY, n)) + BASE
        vals = [1.0] * n
        q_ts = np.sort(rng.integers(0, 30 * DAY, n)) + BASE
        part = Aggregation(Operation.SUM, "v", windows=[Window(7, TimeUnit.DAYS)]).unpack()[0]
        two_stack_aggregate(ev_ts, vals, q_ts, part)
    finally:
        ts_mod.make_scalar_op = orig
    # linear bound with a small constant (push + flip + per-query merge)
    assert calls["n"] < 4 * (2 * n)
