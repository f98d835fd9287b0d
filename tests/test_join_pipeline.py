"""Join backfill vs DuckDB oracle: multi-part, key mapping, prefixes,
left-row-count preservation (reference JoinTest.scala:389-433)."""

import duckdb
import numpy as np
import pytest

from raywin.api import (
    Accuracy,
    Aggregation,
    Derivation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    TimeUnit,
    Window,
)
from raywin.pipelines.join import backfill_join

SF_DIR = "/root/testdata/sf0.001"


def _user_gb():
    return GroupBy(
        sources=[
            EventSource(
                table=f"{SF_DIR}/events.parquet",
                query=Query(
                    selects={"user_id": "user_id", "value": "value"},
                    time_column="epoch_ms(ts)",
                ),
            )
        ],
        key_columns=["user_id"],
        aggregations=[
            Aggregation(Operation.SUM, "value", windows=[Window(7, TimeUnit.DAYS)]),
            Aggregation(Operation.COUNT, "value"),
        ],
        accuracy=Accuracy.TEMPORAL,
        name="user_stats",
    )


def _type_gb():
    return GroupBy(
        sources=[
            EventSource(
                table=f"{SF_DIR}/events.parquet",
                query=Query(
                    selects={"etype": "event_type", "value": "value"},
                    time_column="epoch_ms(ts)",
                ),
            )
        ],
        key_columns=["etype"],
        aggregations=[Aggregation(Operation.AVERAGE, "value", windows=[Window(1, TimeUnit.DAYS)])],
        accuracy=Accuracy.TEMPORAL,
        name="type_stats",
    )


def test_join_backfill(ray_session):
    join = Join(
        left=EventSource(
            table=f"{SF_DIR}/events.parquet",
            query=Query(
                selects={
                    "event_id": "event_id",
                    "user_id": "user_id",
                    "event_type": "event_type",
                },
                time_column="epoch_ms(ts)",
            ),
        ),
        join_parts=[
            JoinPart(group_by=_user_gb()),
            JoinPart(group_by=_type_gb(), key_mapping={"event_type": "etype"}, prefix="t"),
        ],
        derivations=[
            Derivation("*", "*"),
            Derivation("sum_per_count", "user_stats_value_sum_7d / user_stats_value_count"),
        ],
        name="enriched_events",
    )
    out = backfill_join(join, num_buckets=8).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    oracle = con.execute(
        """
        WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts, value FROM events)
        SELECT l.event_id, l.user_id, l.event_type, l.ts,
          (SELECT sum(r.value) FROM e r WHERE r.user_id = l.user_id
             AND r.ts < l.ts AND r.ts >= (l.ts - 7*86400000) // 3600000 * 3600000)
             AS user_stats_value_sum_7d,
          (SELECT nullif(count(r.value), 0) FROM e r WHERE r.user_id = l.user_id AND r.ts < l.ts)
             AS user_stats_value_count,
          (SELECT avg(r.value) FROM e r WHERE r.event_type = l.event_type
             AND r.ts < l.ts AND r.ts >= (l.ts - 86400000) // 3600000 * 3600000)
             AS t_type_stats_value_average_1d
        FROM e l
        """
    ).df()
    oracle["sum_per_count"] = oracle["user_stats_value_sum_7d"] / oracle["user_stats_value_count"]

    assert len(out) == len(oracle)  # left row count preserved
    merged = oracle.merge(out, on=["event_id"], suffixes=("_o", "_k"), how="inner")
    assert len(merged) == len(oracle)
    for col in [
        "user_stats_value_sum_7d",
        "user_stats_value_count",
        "t_type_stats_value_average_1d",
        "sum_per_count",
    ]:
        a = merged[f"{col}_o"].astype(float)
        b = merged[f"{col}_k"].astype(float)
        ok = (a.isna() & b.isna()) | np.isclose(a, b, rtol=1e-9, atol=1e-12)
        assert ok.all(), f"{col}:\n{merged[~ok][['event_id', col + '_o', col + '_k']].head()}"
