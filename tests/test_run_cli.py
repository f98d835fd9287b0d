"""Driver CLI: conf loading, analyze/validate modes, join-backfill to parquet."""

import json
import os
import sys
import textwrap


def _write_conf(tmp_path, sf_dir):
    conf = tmp_path / "confs_cli.py"
    conf.write_text(textwrap.dedent(f"""
        from raywin.api import (Accuracy, Aggregation, EventSource, GroupBy,
                                Join, JoinPart, Operation, Query, TimeUnit, Window)

        user_gb = GroupBy(
            sources=[EventSource(
                table="{sf_dir}/events.parquet",
                query=Query(selects={{"user_id": "user_id", "value": "value"}},
                            time_column="epoch_ms(ts)"),
            )],
            key_columns=["user_id"],
            aggregations=[Aggregation(Operation.SUM, "value",
                                      windows=[Window(7, TimeUnit.DAYS)])],
            accuracy=Accuracy.TEMPORAL,
            name="cli_user_gb",
        )
        the_join = Join(
            left=EventSource(
                table="{sf_dir}/events.parquet",
                query=Query(selects={{"event_id": "event_id", "user_id": "user_id"}},
                            time_column="epoch_ms(ts)"),
            ),
            join_parts=[JoinPart(group_by=user_gb)],
            name="cli_join",
        )
    """))
    return conf


def test_run_cli_join_backfill(ray_session, tmp_path, monkeypatch, capsys):
    from raywin.run import main

    sf_dir = "/root/testdata/sf0.001"
    _write_conf(tmp_path, sf_dir)
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, str(tmp_path))
    try:
        out_dir = str(tmp_path / "out")
        rc = main(["--mode", "join-backfill", "--conf", "confs_cli:the_join",
                   "--output", out_dir, "--num-buckets", "8"])
        assert rc == 0
        payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert payload["rows"] == 1000
        assert any(f.endswith(".parquet") for f in os.listdir(out_dir))

        rc = main(["--mode", "validate", "--conf", "confs_cli:the_join"])
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        assert report["errors"] == []

        rc = main(["--mode", "analyze", "--conf", "confs_cli:user_gb"])
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        assert "value_sum_7d" in report["output_schema"]
    finally:
        sys.path.remove(str(tmp_path))
