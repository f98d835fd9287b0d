"""Local csv/json loader + single-file exporter (sources/local.py).

Mirrors the reference's LocalDataLoader/LocalTableExporter behavior:
string 'yyyy-MM-dd HH:mm:ss' ts -> epoch millis, ds-partitioned parquet
output, round-trip through export formats.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raywin.sources.io import read_table, table_schema
from raywin.sources.local import (
    export_table,
    load_directory,
    load_local_table,
    read_local,
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "purchases.csv"
    p.write_text(
        "user,amount,ts,ds\n"
        "a,10,2023-01-01 00:00:00,2023-01-01\n"
        "b,20,2023-01-01 12:30:00,2023-01-01\n"
        "a,30,2023-01-02 06:00:00,2023-01-02\n"
    )
    return str(p)


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"user": "a", "n": 1}\n'
        '{"user": "b", "n": 2}\n'
    )
    return str(p)


def test_read_local_csv_ts_conversion(ray_session, csv_file):
    tbl = pa.concat_tables(
        read_local(csv_file).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    assert tbl.num_rows == 3
    ts = sorted(tbl["ts"].to_pylist())
    # 2023-01-01 00:00:00 UTC
    assert ts[0] == 1672531200000
    assert pa.types.is_integer(tbl.schema.field("ts").type)
    # io.read_table routes local files through the same path
    via_io = pa.concat_tables(
        read_table(csv_file, columns=["user", "ts"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    assert via_io.column_names == ["user", "ts"]
    assert pa.types.is_integer(table_schema(csv_file).field("ts").type)


def test_load_local_table_partitions_by_ds(ray_session, csv_file, tmp_path):
    out = load_local_table(csv_file, str(tmp_path / "warehouse"))
    assert os.path.basename(out) == "purchases"
    # ds-partitioned directories exist
    parts = sorted(d for d in os.listdir(out) if d.startswith("ds="))
    assert parts == ["ds=2023-01-01", "ds=2023-01-02"]
    # idempotent: second call short-circuits
    assert load_local_table(csv_file, str(tmp_path / "warehouse")) == out


def test_load_directory_and_jsonl(ray_session, csv_file, jsonl_file, tmp_path):
    src = os.path.dirname(csv_file)
    tables = load_directory(src, str(tmp_path / "wh2"))
    assert set(tables) == {"purchases", "events"}
    tbl = pq.read_table(tables["events"])
    assert tbl.num_rows == 2
    assert set(tbl.column_names) == {"user", "n"}


def test_export_table_single_file(ray_session, csv_file, tmp_path):
    wh = load_local_table(csv_file, str(tmp_path / "wh3"))
    for fmt in ("parquet", "csv", "json"):
        out = export_table(wh, str(tmp_path / f"out.{fmt}"))
        assert os.path.isfile(out)
    back = pq.read_table(str(tmp_path / "out.parquet"))
    assert back.num_rows == 3


def test_write_table_conventions(ray_session, tmp_path):
    """write_table: partition dirs, within-block sort, file-count sizing."""
    import glob

    import numpy as np
    import ray.data

    from raywin.sources.io import write_table

    rng = np.random.default_rng(3)
    tbl = pa.table(
        {
            "ds": pa.array(np.where(rng.random(4000) < 0.5, "2024-01-01", "2024-01-02")),
            "k": pa.array(rng.integers(0, 100, 4000)),
            "v": pa.array(rng.normal(0, 1, 4000)),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = str(tmp_path / "t1")
    write_table(ds, out, partition_cols=["ds"], sort_cols=["k"],
                target_rows_per_file=1000)
    parts = sorted(os.path.basename(p) for p in glob.glob(out + "/ds=*"))
    assert parts == ["ds=2024-01-01", "ds=2024-01-02"]
    files = glob.glob(out + "/ds=*/*.parquet")
    assert 1 <= len(files) <= 8  # ~4 target files, split across 2 partitions
    for f in files:
        ks = pq.read_table(f, columns=["k"])["k"].to_numpy()
        assert (np.diff(ks) >= 0).all(), f"{f} not sorted within file"
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 4000


def test_parquet_column_range_stats_only(tmp_path):
    """parquet_column_range reads row-group footers, not data pages, and
    matches the true min/max across a multi-file directory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raywin.sources.io import parquet_column_range

    rng = np.random.default_rng(5)
    d = tmp_path / "tbl"
    d.mkdir()
    all_ts = []
    for i in range(3):
        ts = rng.integers(10_000, 99_999, 1000)
        all_ts.append(ts)
        pq.write_table(
            pa.table({"ts": ts, "v": rng.normal(size=1000)}),
            d / f"part-{i}.parquet",
            row_group_size=250,
        )
    cat = np.concatenate(all_ts)
    assert parquet_column_range(str(d), "ts") == (int(cat.min()), int(cat.max()))
    assert parquet_column_range(str(d / "part-0.parquet"), "ts") == (
        int(all_ts[0].min()),
        int(all_ts[0].max()),
    )
    assert parquet_column_range(str(d), "nope") is None
