"""Multimodal plumbing: binary media columns through mapInPandas —
schemas, fan-out shapes, deterministic fake decode (the codec itself is
stubbed; the Spark-side contract is what's under test)."""

from __future__ import annotations

import numpy as np

from rindex_spark.operators.multimodal import (
    deterministic_fake_decoder,
    extract_features,
    generate_media,
    resize_features,
    sample_frames,
)


def test_extract_features_deterministic(spark):
    media = generate_media(spark, 50)
    a = extract_features(media).orderBy("media_id").collect()
    b = extract_features(generate_media(spark, 50, partitions=7)).orderBy("media_id").collect()
    assert a == b  # pure function of media_id, any partitioning
    assert all(r["feat_dim"] == 16 and len(r["feature"]) == 16 for r in a)
    # matches the in-process decoder bit-for-bit
    row = next(r for r in a if r["media_id"] == 3)
    payload = (np.arange(64, dtype=np.uint8) * ((3 % 251) + 1) % 256).astype(np.uint8).tobytes()
    exp = deterministic_fake_decoder(payload, "image")
    assert np.array_equal(np.array(row["feature"], dtype=np.float32), exp)


def test_sample_frames_shape(spark):
    media = generate_media(spark, 20, kind="video")
    frames = sample_frames(media, frame_bytes=16, every_ms=40).collect()
    # 64-byte payloads, duration_ms=0 -> max_frames bound by payload: 4
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id) == 20
    for mid, rows in by_id.items():
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        assert all(len(r["frame"]) == 16 for r in rows)
        assert all(r["ts_ms"] == r["frame_idx"] * 40 for r in rows)


def test_resize_features_pools(spark):
    media = generate_media(spark, 10)
    feats = extract_features(media)
    small = resize_features(feats, out_dim=4).collect()
    assert all(r["feat_dim"] == 4 and len(r["feature"]) == 4 for r in small)
    # pooling 16 -> 4 averages adjacent blocks of 4
    full = {r["media_id"]: np.array(r["feature"], dtype=np.float64) for r in feats.collect()}
    for r in small:
        exp = np.array(
            [c.mean() for c in np.array_split(full[r["media_id"]], 4)], dtype=np.float32
        )
        assert np.allclose(np.array(r["feature"], dtype=np.float32), exp)
