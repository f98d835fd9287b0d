"""Query.setups: UDF macros registered once per worker connection
(reference api.thrift:46-48 setups)."""


def test_setups_macro_in_selects(ray_session):
    from raywin.api import EventSource, Query
    from raywin.sources.io import scan_source

    src = EventSource(
        table="/root/testdata/sf0.001/events.parquet",
        query=Query(
            setups=["CREATE MACRO double_it(x) AS x * 2"],
            selects={"event_id": "event_id", "v2": "double_it(value)"},
            time_column="epoch_ms(ts)",
        ),
    )
    ds = scan_source(src)
    df = ds.to_pandas()
    assert set(df.columns) == {"event_id", "v2", "ts"}
    assert len(df) == 1000

    import pyarrow.parquet as pq

    raw = pq.read_table("/root/testdata/sf0.001/events.parquet",
                        columns=["event_id", "value"]).to_pandas()
    merged = df.merge(raw, on="event_id")
    assert (abs(merged["v2"] - 2 * merged["value"]) < 1e-12).all()
