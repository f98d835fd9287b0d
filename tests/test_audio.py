"""Audio windowed features: qaud container seek semantics, the shared
SQL-reproducible stride rule, AudioWindowStage invariants, and the
pluggable-codec seam.  Reference posture: chronon carries payloads as
opaque thrift binary columns (api/thrift/api.thrift); audio feature
extraction is brief-mandated net-new surface, so these tests pin it
against direct recomputation (the driver-gate DuckDB oracle lives in
pipelines/catalog.py)."""

import numpy as np
import pyarrow as pa
import pytest

from raywin.stages.audio import (
    AudioWindowStage,
    audio_features,
    make_pcm,
    make_pcm_for,
    qaud_decode_windows,
    qaud_encode,
    qaud_probe,
    qaud_roundtrip_pcm,
    snr_db,
)
from raywin.stages.images import make_caption
from raywin.stages.video import sample_indices


def test_qaud_roundtrip_and_seek():
    pcm = make_pcm("aud_rt", 9, 256)
    blob = qaud_encode(pcm)
    assert qaud_probe(blob) == (9, 256, 16000)
    full = qaud_decode_windows(blob, range(9))
    np.testing.assert_array_equal(full, qaud_roundtrip_pcm(pcm))
    # 12-bit quantizer sits comfortably above the 40 dB invariant
    assert snr_db(pcm, full).min() >= 40.0
    # arbitrary-order subset decode equals the corresponding full rows
    sub = qaud_decode_windows(blob, [7, 0, 4])
    np.testing.assert_array_equal(sub, full[[7, 0, 4]])
    with pytest.raises(IndexError):
        qaud_decode_windows(blob, [9])


def test_seek_reads_only_requested_windows():
    """Truncating the container after window 0's payload must still decode
    window 0 — proof the seek path never touches later windows' bytes."""
    pcm = make_pcm("aud_seek", 6, 256)
    blob = qaud_encode(pcm)
    import struct

    off0, len0 = struct.unpack_from(">II", blob, 16)
    data_start = 16 + 6 * 8
    truncated = blob[: data_start + off0 + len0]
    got = qaud_decode_windows(truncated, [0])
    np.testing.assert_array_equal(got[0], qaud_roundtrip_pcm(pcm)[0])
    with pytest.raises(Exception):
        qaud_decode_windows(truncated, [5])


def test_pcm_is_pure_function_of_id_and_window():
    """Windows are slices of one global sample stream: decoding windows
    [2, 5] directly equals rows 2 and 5 of the full clip."""
    full = make_pcm("aud_pure", 8, 128)
    sub = make_pcm_for("aud_pure", [2, 5], 128)
    np.testing.assert_array_equal(sub, full[[2, 5]])
    # different ids produce different signals
    assert not np.array_equal(full, make_pcm("aud_other", 8, 128))


def _audio_batch(specs, win=256):
    """specs: list of (audio_id, n_windows).  Builds the stage input."""
    ids, blobs, caps = [], [], []
    for aid, nw in specs:
        ids.append(aid)
        blobs.append(qaud_encode(make_pcm(aid, nw, win)))
        caps.append(make_caption(aid))
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(["qaud"] * len(ids), pa.string()),
            "caption": pa.array(caps, pa.string()),
            "ts": pa.array(np.arange(len(ids), dtype=np.int64)),
        }
    )


def test_audio_window_stage_matches_direct_recompute():
    batch = _audio_batch([("aud_a", 10), ("aud_b", 3), ("aud_c", 20)])
    out = AudioWindowStage(4)(batch)
    assert "bytes" not in out.column_names  # payload dropped
    assert out.column_names[-3:] == ["rms", "zcr", "spectral_centroid"]
    got = out.to_pandas()
    for aid, nw in [("aud_a", 10), ("aud_b", 3), ("aud_c", 20)]:
        sub = got[got.audio_id == aid].sort_values("window_idx")
        idx = sample_indices(nw, 4)
        assert sub.window_idx.tolist() == idx.tolist()
        assert (sub.n_windows == nw).all()
        decoded = qaud_roundtrip_pcm(make_pcm_for(aid, idx, 256))
        r, z, c = audio_features(decoded)
        np.testing.assert_array_equal(np.sort(sub.rms.values), np.sort(r))
        np.testing.assert_array_equal(np.sort(sub.zcr.values), np.sort(z))
        np.testing.assert_array_equal(
            np.sort(sub.spectral_centroid.values), np.sort(c)
        )
    # passthrough scalar rides, replicated per sampled window
    assert (got[got.audio_id == "aud_b"].ts == 1).all()


def test_audio_invariants_trip_on_corruption():
    batch = _audio_batch([("aud_ok", 5)])
    # corrupt the PCM but keep a valid container: SNR invariant must fire
    bad = batch.set_column(
        batch.column_names.index("bytes"),
        "bytes",
        pa.array([qaud_encode(np.zeros((5, 256), dtype=np.int16))], pa.binary()),
    )
    with pytest.raises(AssertionError, match="SNR"):
        AudioWindowStage(4)(bad)
    # corrupt the caption: byte-equality must fire
    bad_cap = batch.set_column(
        batch.column_names.index("caption"),
        "caption",
        pa.array(["wrong caption"], pa.string()),
    )
    with pytest.raises(AssertionError, match="caption"):
        AudioWindowStage(4)(bad_cap)
    # check_invariants=False is the production switch
    out = AudioWindowStage(4, check_invariants=False)(bad)
    assert out.num_rows == len(sample_indices(5, 4))


def test_audio_empty_batch():
    out = AudioWindowStage(4)(_audio_batch([]))
    assert out.num_rows == 0
    assert out.column_names[-5:] == [
        "window_idx", "n_windows", "rms", "zcr", "spectral_centroid",
    ]


def test_audio_pluggable_codec():
    """A library-backed codec plugs in via (probe, decode_windows) — the
    Ray plumbing is codec-agnostic.  Fake format: raw int16 windows."""
    pcm = make_pcm("aud_plug", 6, 64)

    blob = b"RAWA" + bytes([6, 64]) + pcm.tobytes()

    def probe(b):
        return b[4], b[5], 16000

    def decode(b, idx):
        n, w, _ = probe(b)
        arr = np.frombuffer(b[6:], np.int16).reshape(n, w)
        return arr[np.asarray(idx, dtype=np.int64)]

    batch = pa.table(
        {
            "audio_id": pa.array(["aud_plug"], pa.string()),
            "bytes": pa.array([blob], pa.binary()),
        }
    )
    out = AudioWindowStage(3, probe=probe, decode_windows=decode)(batch)
    idx = sample_indices(6, 3)
    assert out["window_idx"].to_pylist() == idx.tolist()
    r, _, _ = audio_features(pcm[idx])
    np.testing.assert_array_equal(np.asarray(out["rms"]), r)


def test_audio_catalog_query_green(ray_session):
    """The driver-gate path end to end: Ray pipeline vs DuckDB oracle."""
    import duckdb
    import pandas as pd

    from raywin.pipelines.catalog import (
        _audio_window_features_sql,
        audio_window_features,
    )

    got = (
        audio_window_features("unused")
        .to_pandas()
        .sort_values(["audio_id", "window_idx"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(_audio_window_features_sql())
        .df()
        .sort_values(["audio_id", "window_idx"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)
