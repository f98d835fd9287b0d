"""Wheel-gated Lance round-trip: the container has no `lance` wheel, so these
tests SKIP here — they exist so the first real deployment (where the wheel is
present; BASELINE mandates a Lance image lake) is not the first execution of
the read_table/write_table Lance paths."""

from __future__ import annotations

import pyarrow as pa
import pytest

lance = pytest.importorskip("lance")


def test_lance_round_trip(tmp_path, ray_session):
    import ray.data

    from raywin.sources.io import read_table, table_schema, write_table

    path = str(tmp_path / "roundtrip.lance")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["a", "b", "c"]),
                "w": pa.array([4, 8, 16], pa.int32()),
                "caption": pa.array(["x", "y", "z"]),
            }
        )
    )
    write_table(ds, path)
    schema = table_schema(path)
    assert set(schema.names) == {"image_id", "w", "caption"}
    back = read_table(path, columns=["image_id", "w"]).to_pandas()
    assert sorted(back["image_id"]) == ["a", "b", "c"]
    assert set(back.columns) == {"image_id", "w"}


def test_lance_scan_source(tmp_path, ray_session):
    import ray.data

    from raywin.api import EventSource, Query
    from raywin.sources.io import scan_source, write_table

    path = str(tmp_path / "events.lance")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 2, 1], pa.int64()),
                "event_ts": pa.array([10_000, 20_000, 30_000], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0]),
            }
        )
    )
    write_table(ds, path)
    src = EventSource(
        table=path,
        query=Query(
            selects={"user_id": "user_id", "value": "value"},
            time_column="event_ts",
        ),
    )
    out = scan_source(src).to_pandas()
    assert len(out) == 3
    assert {"user_id", "value", "ts"} <= set(out.columns)
