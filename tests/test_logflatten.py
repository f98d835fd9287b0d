"""Log flattener: schema-version union, null-fill, typed decode.

Mirrors the reference's LogFlattenerJob semantics (schema evolution via
per-row schema_hash, union output schema, null-fill for missing fields)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raywin.pipelines.logflatten import FlattenLogs, flatten_logs, union_log_schema

V1 = json.dumps({"keys": [["user_id", "long"]], "values": [["s", "double"]]})
V2 = json.dumps(
    {"keys": [["user_id", "long"]], "values": [["s", "double"], ["flag", "bool"]]}
)


def test_union_schema_and_conflict():
    by_hash, schema = union_log_schema([("v1", V1), ("v2", V2)])
    assert set(by_hash) == {"v1", "v2"}
    assert schema.field("s").type == pa.float64()
    assert schema.field("flag").type == pa.bool_()
    assert schema.field("ts").type == pa.int64()
    bad = json.dumps({"keys": [], "values": [["s", "string"]]})
    with pytest.raises(TypeError):
        union_log_schema([("v1", V1), ("v3", bad)])


def test_flatten_batch_null_fill():
    stage = FlattenLogs([("v1", V1), ("v2", V2)])
    batch = pa.table(
        {
            "schema_hash": ["v1", "v2", "vX"],
            "key_json": ['{"user_id": 7}', '{"user_id": 8}', '{"user_id": 9}'],
            "value_json": ['{"s": 1.5}', '{"s": 2.5, "flag": true}', '{"s": 9.0}'],
            "ts": pa.array([10, 20, 30], pa.int64()),
            "ds": ["2025-01-01"] * 3,
        }
    )
    out = stage(batch)
    assert out.schema == stage.out_schema
    assert out["user_id"].to_pylist() == [7, 8, None]  # vX: unknown version
    assert out["s"].to_pylist() == [1.5, 2.5, None]
    assert out["flag"].to_pylist() == [None, True, None]  # v1 lacks the field
    assert out["ts"].to_pylist() == [10, 20, 30]


def test_flatten_logs_end_to_end(ray_session, tmp_path):
    logs = str(tmp_path / "logs.parquet")
    schemas = str(tmp_path / "schemas.parquet")
    pq.write_table(
        pa.table(
            {
                "join_name": ["j", "j", "other"],
                "schema_hash": ["v1", "v2", "v1"],
                "key_json": ['{"user_id": 1}', '{"user_id": 2}', '{"user_id": 3}'],
                "value_json": ['{"s": 0.5}', '{"s": 1.0, "flag": false}', '{"s": 2.0}'],
                "ts": pa.array([100, 200, 300], pa.int64()),
                "ds": ["2025-01-01"] * 3,
            }
        ),
        logs,
    )
    pq.write_table(
        pa.table({"schema_hash": ["v1", "v2"], "schema_json": [V1, V2]}), schemas
    )
    df = flatten_logs(logs, schemas, join_name="j").to_pandas()
    assert len(df) == 2  # the 'other' join's row is filtered out
    assert sorted(df["user_id"]) == [1, 2]
    assert set(df.columns) == {"user_id", "s", "flag", "ts", "ds", "schema_hash"}
