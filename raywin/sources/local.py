"""Local CSV/JSON loaders + single-file table exporter (dev tooling).

Re-expresses the reference's LocalDataLoader (spark/.../LocalDataLoader.
scala:27-111) and LocalTableExporter (LocalTableExporter.scala:25-77):

- ``load_local_table``: csv / json / jsonl file -> parquet table dir the
  rest of the engine scans (ds-partitioned when a ``ds`` column exists).
  A string ``ts`` column ('yyyy-MM-dd HH:mm:ss') converts to epoch millis,
  matching the reference's readability affordance
  (LocalDataLoader.scala:49-56).
- ``export_table``: any table/Dataset -> ONE local csv / json / parquet
  file (the reference coalesces to 1 partition the same way).  This is a
  deliberately driver-side DEV tool — production output stays partitioned
  parquet via the backfill writer.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

_LOAD_EXTS = (".csv", ".json", ".jsonl")


def _ts_to_millis(col: pa.ChunkedArray | pa.Array):
    """'yyyy-MM-dd HH:mm:ss' strings OR reader-inferred timestamps ->
    epoch-millis int64 (pyarrow's csv/json readers eagerly infer timestamp
    types, so both shapes reach us)."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        col = pc.strptime(col, format="%Y-%m-%d %H:%M:%S", unit="ms")
        t = col.type
    if pa.types.is_timestamp(t):
        return pc.cast(pc.cast(col, pa.timestamp("ms")), pa.int64())
    return None


def _convert_ts(batch: pa.Table) -> pa.Table:
    if "ts" in batch.column_names:
        ms = _ts_to_millis(batch["ts"])
        if ms is not None:
            batch = batch.set_column(batch.column_names.index("ts"), "ts", ms)
    if "ds" in batch.column_names and not pa.types.is_string(batch["ds"].type):
        # partition column stays a 'yyyy-MM-dd' string, as in the reference
        batch = batch.set_column(
            batch.column_names.index("ds"),
            "ds",
            pc.cast(batch["ds"], pa.string()),
        )
    return batch


def local_schema(path: str) -> pa.Schema:
    """Inferred Arrow schema of a local csv/json file, post ts conversion."""
    ext = os.path.splitext(path)[1]
    if ext == ".csv":
        import pyarrow.csv as pacsv

        schema = pacsv.open_csv(path).schema
    elif ext in (".json", ".jsonl"):
        import pyarrow.json as pajson

        schema = pajson.read_json(path).schema
    else:
        raise ValueError(f"unsupported local table extension {ext!r} for {path}")
    if "ts" in schema.names and (
        pa.types.is_string(schema.field("ts").type)
        or pa.types.is_large_string(schema.field("ts").type)
        or pa.types.is_timestamp(schema.field("ts").type)
    ):
        schema = schema.set(schema.get_field_index("ts"), pa.field("ts", pa.int64()))
    if "ds" in schema.names and not pa.types.is_string(schema.field("ds").type):
        schema = schema.set(schema.get_field_index("ds"), pa.field("ds", pa.string()))
    return schema


def read_local(path: str):
    """Scan a local csv / json / jsonl file as a Dataset (schema inferred,
    string ts converted to epoch millis)."""
    import ray.data

    ext = os.path.splitext(path)[1]
    if ext == ".csv":
        ds = ray.data.read_csv(path)
    elif ext in (".json", ".jsonl"):
        ds = ray.data.read_json(path)
    else:
        raise ValueError(f"unsupported local table extension {ext!r} for {path}")
    return ds.map_batches(_convert_ts, batch_format="pyarrow")


def load_local_table(path: str, out_dir: str, table_name: str | None = None) -> str:
    """Load a csv/json/jsonl file into a parquet table directory and return
    its path; partitions by ``ds`` when the column exists."""
    name = table_name or os.path.basename(path).rsplit(".", 1)[0]
    out = os.path.join(out_dir, name)
    if os.path.exists(out):  # session.catalog.tableExists short-circuit
        return out
    ds = read_local(path)
    first = ds.take_batch(1, batch_format="pyarrow")
    if "ds" in first.column_names:
        ds.write_parquet(out, partition_cols=["ds"])
    else:
        ds.write_parquet(out)
    return out


def load_directory(dir_path: str, out_dir: str) -> dict[str, str]:
    """Recursively load every csv/json/jsonl under a directory
    (LocalDataLoader.loadDataRecursively): returns {table_name: path}."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(dir_path):
        for f in sorted(files):
            if f.endswith(_LOAD_EXTS):
                p = os.path.join(root, f)
                name = f.rsplit(".", 1)[0]
                out[name] = load_local_table(p, out_dir, name)
    return out


def export_table(source, out_path: str) -> str:
    """Export a table path or Dataset to ONE local file; format from the
    output extension (csv / json / parquet)."""
    import ray.data

    if isinstance(source, str):
        from .io import read_table

        source = read_table(source)
    fmt = os.path.splitext(out_path)[1].lstrip(".").lower()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tbl = pa.concat_tables(
        source.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if fmt == "parquet":
        import pyarrow.parquet as pq

        pq.write_table(tbl, out_path)
    elif fmt == "csv":
        import pyarrow.csv as pacsv

        pacsv.write_csv(tbl, out_path)
    elif fmt == "json":  # jsonl, one object per line (Spark's json output)
        df = tbl.to_pandas()
        df.to_json(out_path, orient="records", lines=True)
    else:
        raise ValueError(f"unsupported export format {fmt!r}")
    return out_path
