"""Vectorized partition kernel vs the brute-force NaiveOracle.

Mirrors the reference's layer-1 test strategy
(aggregator/src/test/scala/ai/chronon/aggregator/test/SawtoothAggregatorTest.scala:99-175):
random events + random query timestamps, every operation x window, exact or
allclose comparison per (query, column).
"""

import math

import numpy as np
import pandas as pd
import pytest

from raywin.api import Aggregation, Operation, TimeUnit, Window
from raywin.aggregator.kernel import PartitionAggregator
from raywin.aggregator.windowing import FiveMinuteResolution, NaiveOracle

WINDOWS = [Window(1, TimeUnit.HOURS), Window(1, TimeUnit.DAYS), Window(7, TimeUnit.DAYS), Window(30, TimeUnit.DAYS), Window(-1)]

BASE_TS = 1_600_000_000_000  # fixed epoch anchor


def gen_data(seed=7, n_events=2000, n_queries=300, n_keys=12, span_days=40, null_rate=0.01):
    rng = np.random.default_rng(seed)
    span = span_days * 24 * 3600 * 1000
    ev = pd.DataFrame(
        {
            "user": rng.integers(0, n_keys, n_events).astype(str),
            "ts": BASE_TS + rng.integers(0, span, n_events),
            "value": rng.normal(50, 20, n_events),
            "qty": rng.integers(1, 100, n_events),
            "tag": rng.choice(["a", "b", "c"], n_events),
            "seq": np.arange(n_events),
        }
    )
    ev.loc[rng.random(n_events) < null_rate, "value"] = np.nan
    q = pd.DataFrame(
        {
            "user": rng.integers(0, n_keys + 2, n_queries).astype(str),  # some unmatched keys
            "ts": BASE_TS + rng.integers(0, span, n_queries),
        }
    )
    # exact-tie cases: query ts equal to an event ts of the same key
    for i in range(0, 20):
        q.loc[i, "user"] = ev.loc[i, "user"]
        q.loc[i, "ts"] = ev.loc[i, "ts"]
    return ev, q


def _check(part_col, kernel_out, oracle_out, op):
    assert len(kernel_out) == len(oracle_out)
    for i, (k, o) in enumerate(zip(kernel_out, oracle_out)):
        if o is None:
            assert k is None or (isinstance(k, float) and math.isnan(k)), f"{part_col}[{i}]: {k} != None"
            continue
        if isinstance(o, float):
            if math.isnan(o):
                assert k is None or math.isnan(k), f"{part_col}[{i}]: {k} != NaN"
            else:
                assert k is not None and not (isinstance(k, float) and math.isnan(k)), f"{part_col}[{i}]: None != {o}"
                assert math.isclose(float(k), o, rel_tol=1e-9, abs_tol=1e-9), f"{part_col}[{i}]: {k} != {o}"
        elif isinstance(o, list):
            assert list(k) == o or all(
                math.isclose(a, b, rel_tol=1e-9) for a, b in zip(k, o)
            ) and len(k) == len(o), f"{part_col}[{i}]: {k} != {o}"
        elif isinstance(o, dict):
            kd = dict(k)
            assert set(kd) == set(o), f"{part_col}[{i}]: {k} != {o}"
            for key in o:
                a, b = kd[key], o[key]
                if isinstance(b, float):
                    assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), f"{part_col}[{i}][{key}]: {a} != {b}"
                else:
                    assert a == b, f"{part_col}[{i}][{key}]: {a} != {b}"
        else:
            assert k == o, f"{part_col}[{i}]: {k!r} != {o!r}"


def run_case(aggs, ev=None, q=None, seed=7):
    if ev is None:
        ev, q = gen_data(seed)
    parts = [p for a in aggs for p in a.unpack()]
    agg = PartitionAggregator(["user"], parts, FiveMinuteResolution, tie_breaker="seq")
    out = agg.aggregate(ev, q)

    oracle = NaiveOracle(parts, FiveMinuteResolution)
    # oracle computed per key
    ev_rows_by_key = {}
    for row in ev.replace({np.nan: None}).to_dict("records"):
        ev_rows_by_key.setdefault(row["user"], []).append(row)
    for part in parts:
        col = out[part.output_column].tolist()
        expected = []
        for u, t in zip(out["user"], out["ts"]):
            res = NaiveOracle([part], FiveMinuteResolution).aggregate(
                ev_rows_by_key.get(u, []), [int(t)]
            )[0]
            expected.append(res[part.output_column])
        _check(part.output_column, col, expected, part.operation)
    return out


@pytest.mark.parametrize("op,col", [
    (Operation.SUM, "value"),
    (Operation.COUNT, "value"),
    (Operation.AVERAGE, "value"),
    (Operation.SUM, "qty"),
    (Operation.MIN, "value"),
    (Operation.MAX, "value"),
    (Operation.VARIANCE, "value"),
    (Operation.SKEW, "value"),
    (Operation.KURTOSIS, "value"),
    (Operation.FIRST, "value"),
    (Operation.LAST, "value"),
    (Operation.LAST, "tag"),
    (Operation.UNIQUE_COUNT, "tag"),
    (Operation.BOUNDED_UNIQUE_COUNT, "tag"),
    (Operation.HISTOGRAM, "tag"),
    (Operation.MIN, "tag"),
    (Operation.MAX, "tag"),
])
def test_op_vs_oracle(op, col):
    run_case([Aggregation(op, col, windows=WINDOWS)])


@pytest.mark.parametrize("op", [Operation.LAST_K, Operation.FIRST_K, Operation.TOP_K, Operation.BOTTOM_K])
def test_k_ops_vs_oracle(op):
    run_case([Aggregation(op, "value", windows=WINDOWS, arg_map={"k": 4})])


def test_bucketed_vs_oracle():
    run_case([Aggregation(Operation.SUM, "value", windows=WINDOWS[:3], buckets=["tag"])])
    run_case([Aggregation(Operation.AVERAGE, "qty", windows=[Window(7, TimeUnit.DAYS)], buckets=["tag"])])


def test_small_hand_case():
    """Exact-tie: event at query ts must be EXCLUDED (strict head,
    reference JoinTest.scala:409-411)."""
    ev = pd.DataFrame(
        {"user": ["u", "u", "u"], "ts": [1000, 2000, 3000], "value": [1.0, 2.0, 4.0], "seq": [0, 1, 2]}
    )
    q = pd.DataFrame({"user": ["u", "u", "u", "u"], "ts": [1000, 2000, 3000, 4000]})
    parts = Aggregation(Operation.SUM, "value").unpack()
    agg = PartitionAggregator(["user"], parts, FiveMinuteResolution)
    out = agg.aggregate(ev, q).sort_values("ts")
    got = out["value_sum"].tolist()
    assert math.isnan(got[0]) and got[1:] == [1.0, 3.0, 7.0]


def test_window_tail_rounding():
    """Tail boundary is round(q - w, hop): an event just inside the rounded
    hop start is included even though q - w is after it."""
    from raywin.api import MILLIS_HOUR

    # 1d window -> 1h tail hop (Resolution.scala:37-47)
    q_ts = BASE_TS + 30 * 60 * 1000 + 24 * 3600 * 1000  # w + 30min past base
    ev_ts = ((q_ts - 24 * 3600 * 1000) // MILLIS_HOUR) * MILLIS_HOUR  # rounded tail start
    ev = pd.DataFrame({"user": ["u", "u"], "ts": [ev_ts, ev_ts - 1], "value": [5.0, 100.0], "seq": [0, 1]})
    q = pd.DataFrame({"user": ["u"], "ts": [q_ts]})
    parts = Aggregation(Operation.SUM, "value", windows=[Window(1, TimeUnit.DAYS)]).unpack()
    out = PartitionAggregator(["user"], parts, FiveMinuteResolution).aggregate(ev, q)
    assert out["value_sum_1d"].tolist() == [5.0]  # ev_ts-1 is outside the rounded tail


def test_arrow_tables_path_matches_pandas_path():
    """aggregate_tables (Arrow-native ingestion: dictionary_encode key
    factorization, lazy per-column numpy, Table.take reorder) must be
    bitwise-identical to the pandas aggregate() path, including null keys
    (which route the factorization through the object fallback) and
    string/list passthrough payload."""
    import pyarrow as pa

    from raywin.pipelines.group_by import _to_arrow_column, output_type

    ev, q = gen_data(seed=11, n_events=3000, n_queries=500)
    q = q.copy()
    q["url"] = [f"u/{i % 37}" for i in range(len(q))]
    q["emb"] = [[float(i % 5), float(i % 3)] for i in range(len(q))]
    parts = []
    for agg_spec in [
        Aggregation(Operation.SUM, "value", windows=[Window(7, TimeUnit.DAYS)]),
        Aggregation(Operation.AVERAGE, "qty", windows=[Window(-1)]),
        Aggregation(Operation.LAST, "tag", windows=[Window(30, TimeUnit.DAYS)]),
        Aggregation(Operation.COUNT, "qty", windows=[Window(1, TimeUnit.DAYS)]),
    ]:
        parts.extend(agg_spec.unpack())
    for with_null_key in (False, True):
        ev_c, q_c = ev.copy(), q.copy()
        if with_null_key:
            ev_c.loc[ev_c.index[:5], "user"] = None
            q_c.loc[q_c.index[:3], "user"] = None
        agg = PartitionAggregator(["user"], parts, FiveMinuteResolution, tie_breaker="seq")
        out_pd = agg.aggregate(ev_c, q_c)
        rt = pa.Table.from_pandas(ev_c, preserve_index=False)
        lt = pa.Table.from_pandas(
            q_c[["user", "ts", "url", "emb"]], preserve_index=False
        )
        q_order, results = agg.aggregate_tables(rt, lt)
        taken = lt.take(q_order)
        input_types = {"value": pa.float64(), "qty": pa.int64(), "tag": pa.string()}
        assert list(taken.column("ts").to_numpy()) == out_pd["ts"].tolist()
        assert list(taken.column("url").to_pylist()) == out_pd["url"].tolist()
        for p in parts:
            got = _to_arrow_column(results[p.output_column], output_type(p, input_types[p.input_column]))
            want = _to_arrow_column(
                out_pd[p.output_column].to_numpy(), output_type(p, input_types[p.input_column])
            )
            assert got.equals(want), p.output_column
