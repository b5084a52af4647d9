from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nido_spark import multimodal as M


@pytest.fixture(scope="session")
def media(spark):
    return M.synth_media(spark, 60, seed=42).cache()


def test_synth_media_deterministic(spark, media):
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {
        r["media_id"]: bytes(r["payload"])
        for r in M.synth_media(spark, 60, seed=42, partitions=7).collect()
    }
    assert a == b
    assert len(a) == 60


def test_header_parse_matches_metadata(media):
    joined = (
        M.parse_headers(media)
        .join(media.select("media_id", "width", "height", "duration_ms"), "media_id")
        .collect()
    )
    for r in joined:
        assert r["header_valid"]
        assert r["hdr_width"] == (r["width"] or 0)
        assert r["hdr_height"] == (r["height"] or 0)
        assert r["hdr_duration_ms"] == (r["duration_ms"] or 0)
        assert r["payload_bytes"] >= 16 + 64


def test_media_stats(media):
    stats = {r["kind"]: r["n"] for r in M.media_stats(media).collect()}
    assert stats == {"image": 20, "audio": 20, "video": 20}


def test_extract_features_shape_and_determinism(media):
    feats = M.extract_features(media).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["features"]) == 8
        assert all(np.isfinite(x) for x in r["features"])
    again = {r["media_id"]: r["features"] for r in M.extract_features(media.repartition(5)).collect()}
    first = {r["media_id"]: r["features"] for r in feats}
    assert first == again


def test_sample_frames_layout(media):
    frames = M.sample_frames(media, every_ms=5000, frame_bytes=16).collect()
    assert frames  # audio/video rows exist
    meta = {r["media_id"]: r for r in media.collect()}
    by_media: dict[int, list] = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    for mid, fs in by_media.items():
        m = meta[mid]
        assert m["kind"] != "image"
        payload = bytes(m["payload"])
        n_expected = min(m["duration_ms"] // 5000 + 1, (len(payload) - 16) // 16)
        assert len(fs) == n_expected
        for f in sorted(fs, key=lambda r: r["frame_idx"]):
            start = 16 + f["frame_idx"] * 16
            assert bytes.fromhex(f["frame_hex"]) == payload[start:start + 16]
            assert f["ts_ms"] == f["frame_idx"] * 5000


def test_resize_media_deterministic_stride(media):
    thumbs = {r["media_id"]: r for r in M.resize_media(media, 8, 8).collect()}
    meta = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(thumbs) == set(meta)
    for mid, r in thumbs.items():
        body = meta[mid][16:]
        n = len(body)
        idx = [(i * (n - 1)) // 63 for i in range(64)]
        assert bytes.fromhex(r["thumb_hex"]) == bytes(body[j] for j in idx)
        assert (r["thumb_w"], r["thumb_h"]) == (8, 8)


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        M.real_decoder_stub(b"x" * 32, "image")


def test_set_decoder_swaps_pipeline(media):
    M.set_decoder(lambda payload, kind: np.array([float(len(payload))] * 8))
    try:
        out = M.extract_features(media.limit(3)).collect()
        for r in out:
            assert r["features"][0] > 16
            assert len(set(r["features"])) == 1
    finally:
        M.set_decoder(None)  # type: ignore[arg-type]
        M._DECODER = None
