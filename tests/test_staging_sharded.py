"""Distributed StagingQuery: step_days sharding (the reference's stepDays
execution, StagingQuery.scala:58-89) must equal the single-node run."""

import pandas as pd

from raywin.pipelines.staging import StagingQuery, render_query, run_staging_query

SF_DIR = "/root/testdata/sf0.001"


def _sq():
    return StagingQuery(
        name="rev",
        query="""
            SELECT o_orderdate, count(*) AS n, sum(o_totalprice) AS rev
            FROM orders
            WHERE o_orderdate BETWEEN DATE '{{ start_date }}' AND DATE '{{ end_date }}'
            GROUP BY o_orderdate
        """,
    )


def test_sharded_equals_single_node(ray_session):
    tables = {"orders": f"{SF_DIR}/orders.parquet"}
    single = (
        run_staging_query(_sq(), "1995-01-01", "1995-12-31", tables)
        .to_pandas().sort_values("o_orderdate").reset_index(drop=True)
    )
    # 7-day steps: 53 shards, boundary days must appear exactly once
    sharded = (
        run_staging_query(_sq(), "1995-01-01", "1995-12-31", tables, step_days=7)
        .to_pandas().sort_values("o_orderdate").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(single, sharded)
    assert len(single) > 0


def test_render_inclusive_bounds():
    sql = render_query(_sq(), "1995-03-01", "1995-03-07", {})
    assert "BETWEEN DATE '1995-03-01' AND DATE '1995-03-07'" in sql
