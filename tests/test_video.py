"""Video frame-sampling: qvid container seek semantics, the SQL-reproducible
stride rule, FrameSampleStage invariants, and the pluggable-codec seam.
Reference posture: chronon carries payloads as opaque thrift binary columns
(api/thrift/api.thrift); frame sampling is brief-mandated net-new surface,
so these tests pin it against direct recomputation rather than a reference
oracle (the driver-gate DuckDB oracle lives in pipelines/catalog.py)."""

import numpy as np
import pyarrow as pa
import pytest

from raywin.stages.video import (
    FrameSampleStage,
    make_frames,
    make_frames_for,
    qvid_decode_frames,
    qvid_encode,
    qvid_probe,
    qvid_roundtrip_pixels,
    sample_indices,
    sample_stride,
)
from raywin.stages.images import make_caption, pixel_features, psnr


def test_qvid_roundtrip_and_seek():
    frames = make_frames("vid_rt", 9, 8, 8)
    blob = qvid_encode(frames)
    assert qvid_probe(blob) == (9, 8, 8)
    full = qvid_decode_frames(blob, range(9))
    np.testing.assert_array_equal(full, qvid_roundtrip_pixels(frames))
    # quantizer sits comfortably above the 40 dB invariant
    assert psnr(frames, full) >= 40.0
    # arbitrary-order subset decode equals the corresponding full rows
    sub = qvid_decode_frames(blob, [7, 0, 4])
    np.testing.assert_array_equal(sub, full[[7, 0, 4]])
    with pytest.raises(IndexError):
        qvid_decode_frames(blob, [9])


def test_seek_reads_only_requested_frames():
    """Truncating the container after frame 0's payload must still decode
    frame 0 — proof the seek path never touches later frames' bytes."""
    frames = make_frames("vid_seek", 6, 8, 8)
    blob = qvid_encode(frames)
    import struct

    off0, len0 = struct.unpack_from(">II", blob, 16)
    data_start = 16 + 6 * 8
    truncated = blob[: data_start + off0 + len0]
    got = qvid_decode_frames(truncated, [0])
    np.testing.assert_array_equal(got[0], qvid_roundtrip_pixels(frames)[0])
    with pytest.raises(Exception):
        qvid_decode_frames(truncated, [5])


def test_sample_stride_rule_matches_sql_predicate():
    """sample_indices must equal {i : i % ceil(n/k) == 0} — the DuckDB
    oracle recomputes the sample set with exactly that predicate."""
    for n in (1, 2, 3, 4, 7, 8, 24, 100):
        for k in (1, 2, 4, 5, 24, 100):
            s = sample_stride(n, k)
            assert s == -(-n // k)
            idx = sample_indices(n, k)
            expect = [i for i in range(n) if i % s == 0]
            assert idx.tolist() == expect
            assert len(idx) <= k
            assert idx[0] == 0
    # k >= n samples every frame
    assert sample_indices(5, 8).tolist() == [0, 1, 2, 3, 4]


def _video_batch(specs):
    """specs: list of (video_id, n_frames).  Builds the stage input table."""
    ids, blobs, caps = [], [], []
    for vid, nf in specs:
        ids.append(vid)
        blobs.append(qvid_encode(make_frames(vid, nf, 8, 8)))
        caps.append(make_caption(vid))
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(["qvid"] * len(ids), pa.string()),
            "caption": pa.array(caps, pa.string()),
            "ts": pa.array(np.arange(len(ids), dtype=np.int64)),
        }
    )


def test_frame_sample_stage_matches_direct_recompute():
    batch = _video_batch([("vid_a", 10), ("vid_b", 3), ("vid_c", 24)])
    out = FrameSampleStage(4)(batch)
    assert "bytes" not in out.column_names  # payload dropped
    assert out.column_names[-3:] == ["mean_lum", "contrast", "edge_energy"]
    # per-video: sampled indices + features of the DECODED sampled frames
    got = out.to_pandas()
    for vid, nf in [("vid_a", 10), ("vid_b", 3), ("vid_c", 24)]:
        sub = got[got.video_id == vid].sort_values("frame_idx")
        idx = sample_indices(nf, 4)
        assert sub.frame_idx.tolist() == idx.tolist()
        assert (sub.n_frames == nf).all()
        decoded = qvid_roundtrip_pixels(make_frames_for(vid, idx, 8, 8))
        ml, ct, ee = pixel_features(decoded)
        np.testing.assert_array_equal(np.sort(sub.mean_lum.values), np.sort(ml))
        np.testing.assert_array_equal(np.sort(sub.contrast.values), np.sort(ct))
        np.testing.assert_array_equal(np.sort(sub.edge_energy.values), np.sort(ee))
    # passthrough scalar rides, replicated per sampled frame
    assert (got[got.video_id == "vid_b"].ts == 1).all()


def test_frame_sample_invariants_trip_on_corruption():
    batch = _video_batch([("vid_ok", 5)])
    # corrupt the pixels but keep a valid container: invariant must fire
    bad_frames = np.zeros((5, 8, 8, 3), dtype=np.uint8)
    bad = batch.set_column(
        batch.column_names.index("bytes"),
        "bytes",
        pa.array([qvid_encode(bad_frames)], pa.binary()),
    )
    with pytest.raises(AssertionError, match="PSNR"):
        FrameSampleStage(4)(bad)
    # corrupt the caption: byte-equality must fire
    bad_cap = batch.set_column(
        batch.column_names.index("caption"),
        "caption",
        pa.array(["wrong caption"], pa.string()),
    )
    with pytest.raises(AssertionError, match="caption"):
        FrameSampleStage(4)(bad_cap)
    # check_invariants=False is the production switch
    out = FrameSampleStage(4, check_invariants=False)(bad)
    assert out.num_rows == len(sample_indices(5, 4))


def test_frame_sample_empty_batch():
    out = FrameSampleStage(4)(_video_batch([]))
    assert out.num_rows == 0
    assert out.column_names[-5:] == [
        "frame_idx", "n_frames", "mean_lum", "contrast", "edge_energy",
    ]


def test_frame_sample_pluggable_container():
    """A library-backed container plugs in via (probe, decode_frames) —
    the Ray plumbing (batching, schema, sampling, invariants) is
    container-agnostic.  Fake format: raw concatenated RGB frames."""
    frames = make_frames("vid_plug", 6, 8, 8)
    blob = b"RAWV" + bytes([6, 8, 8]) + frames.tobytes()

    def probe(b):
        return b[4], b[5], b[6]

    def decode(b, idx):
        n, w, h = probe(b)
        arr = np.frombuffer(b[7:], np.uint8).reshape(n, h, w, 3)
        return arr[np.asarray(idx, dtype=np.int64)]

    batch = pa.table(
        {
            "video_id": pa.array(["vid_plug"], pa.string()),
            "bytes": pa.array([blob], pa.binary()),
        }
    )
    out = FrameSampleStage(3, probe=probe, decode_frames=decode)(batch)
    idx = sample_indices(6, 3)
    assert out["frame_idx"].to_pylist() == idx.tolist()
    ml, _, _ = pixel_features(frames[idx])
    np.testing.assert_array_equal(np.asarray(out["mean_lum"]), ml)


def test_video_catalog_query_green(ray_session):
    """The driver-gate path end to end: Ray pipeline vs DuckDB oracle."""
    import duckdb
    import pandas as pd

    from raywin.pipelines.catalog import (
        _video_frame_sample_sql,
        video_frame_sample,
    )

    got = (
        video_frame_sample("unused")
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(_video_frame_sample_sql())
        .df()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)
