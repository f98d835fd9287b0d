"""Config compiler (raywin/repo.py): lossless to_conf/from_conf round-trip,
directory compilation with validation + duplicate detection, CLI mode, and
run.py loading a compiled artifact."""

import json
import os

import pytest

from raywin.api import (
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    TimeUnit,
    Window,
    semantic_hash,
)
from raywin.pipelines.staging import StagingQuery
from raywin.repo import compile_repo, from_conf, load_compiled, to_conf


def _gb(name="rt_gb", table="/tmp/ev.parquet"):
    return GroupBy(
        sources=[EventSource(table=table, query=Query(selects={"v": "v"}))],
        key_columns=["k"],
        aggregations=[
            Aggregation(Operation.SUM, "v", windows=[Window(7, TimeUnit.DAYS)]),
            Aggregation(Operation.LAST_K, "v", windows=[Window(-1)], arg_map={"k": 3}),
        ],
        accuracy=Accuracy.TEMPORAL,
        name=name,
    )


def test_round_trip_group_by_and_join():
    gb = _gb()
    assert from_conf(to_conf(gb)) == gb
    join = Join(
        left=EventSource(table="/tmp/left.parquet", query=Query()),
        join_parts=[JoinPart(group_by=gb, prefix="p1")],
        name="rt_join",
    )
    back = from_conf(to_conf(join))
    assert back == join
    # semantic hash is stable through the round trip
    assert semantic_hash(back) == semantic_hash(join)
    sq = StagingQuery(query="SELECT 1", name="rt_sq", tables={"t": "/tmp/t"})
    assert from_conf(to_conf(sq)) == sq


CONF_MODULE = '''
from raywin.api import (Accuracy, Aggregation, EventSource, GroupBy,
                        Operation, Query, TimeUnit, Window)

user_gb = GroupBy(
    sources=[EventSource(table="{table}", query=Query())],
    key_columns=["k"],
    aggregations=[Aggregation(Operation.SUM, "v", windows=[Window(1, TimeUnit.DAYS)])],
    accuracy=Accuracy.TEMPORAL,
    name="compiled_user_gb",
)
'''


@pytest.fixture()
def conf_dir(tmp_path):
    d = tmp_path / "confs"
    d.mkdir()
    (d / "team_a.py").write_text(CONF_MODULE.format(table=str(tmp_path / "ev.parquet")))
    (d / "_helpers.py").write_text("raise RuntimeError('must not be imported')")
    return str(d)


def test_compile_repo_writes_artifacts(conf_dir, tmp_path):
    out = str(tmp_path / "compiled")
    report = compile_repo(conf_dir, out)
    assert not report["errors"]
    assert len(report["compiled"]) == 1
    path = report["compiled"][0]
    assert path.endswith(os.path.join("groupby", "team_a.user_gb.json"))
    tree = json.load(open(path))
    assert tree["__type__"] == "GroupBy" and "__semantic_hash__" in tree
    gb = load_compiled(path)
    assert gb.name == "compiled_user_gb"
    assert gb.agg_parts()[0].operation is Operation.SUM


def test_compile_repo_flags_duplicates_and_bad_modules(conf_dir, tmp_path):
    d = tmp_path / "confs"
    (d / "team_b.py").write_text(
        CONF_MODULE.format(table=str(tmp_path / "ev.parquet"))
    )  # same conf name again
    (d / "broken.py").write_text("import nonexistent_module_xyz")
    report = compile_repo(str(d), str(tmp_path / "c2"))
    assert len(report["compiled"]) == 1  # first wins, duplicate flagged
    assert any("duplicate conf name" in e for errs in report["errors"].values() for e in errs)
    assert "broken" in report["errors"]


def test_cli_validate_compiled_with_ray(ray_session, conf_dir, tmp_path, capsys):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raywin.run import main

    # materialize the source table so validation passes end-to-end
    t = pa.table({"k": pa.array(["a", "b"]), "ts": pa.array([1, 2]), "v": pa.array([1.0, 2.0])})
    pq.write_table(t, str(tmp_path / "ev.parquet"))
    out = str(tmp_path / "compiled")
    assert main(["--mode", "compile", "--conf", conf_dir, "--output", out]) == 0
    artifact = json.loads(capsys.readouterr().out)["compiled"][0]
    rc = main(["--mode", "validate", "--conf", artifact])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0 and not report["errors"], report
