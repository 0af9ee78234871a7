"""Multimodal plumbing tests: schemas, batch shapes, fan-out,
determinism, and the gated real-decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from xml_to_sqlite3_spark.operators import multimodal as M
from xml_to_sqlite3_spark.operators import similarity as S


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(
            media_id=1,
            kind="image",
            data=b"\x89PNG-fake-bytes-1",
            meta=Row(width=640, height=480, sample_rate=None, duration_ms=None, format="png"),
        ),
        Row(
            media_id=2,
            kind="image",
            data=b"\x89PNG-fake-bytes-2",
            meta=Row(width=800, height=600, sample_rate=None, duration_ms=None, format="png"),
        ),
        Row(
            media_id=3,
            kind="video",
            data=b"RIFF-fake-video",
            meta=Row(width=1920, height=1080, sample_rate=None, duration_ms=3500, format="mp4"),
        ),
        Row(
            media_id=4,
            kind="audio",
            data=b"fake-audio-pcm",
            meta=Row(width=None, height=None, sample_rate=16000, duration_ms=2000, format="wav"),
        ),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_real_decode_is_gated(media):
    with pytest.raises(NotImplementedError, match="PIL"):
        M.decode_image(media)


def test_fake_decode_deterministic(media):
    a = {r["media_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in M.fake_decode_image(media).collect()}
    b = {r["media_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in M.fake_decode_image(media).collect()}
    assert a == b
    assert all(0 <= v < 1 for t in a.values() for v in t)
    assert a[1] != a[2]  # different bytes -> different stats


def test_resize_plan_rewrites_meta(media):
    out = M.resize_plan(media, 224, 224).select("media_id", "meta.width", "meta.height", "meta.format").collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    fmts = {r["media_id"]: r["format"] for r in out}
    assert fmts[3] == "mp4"  # untouched fields survive


def test_frame_sampling_fanout(media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    # only the video row fans out: 3500ms at 1000ms -> frames at 0,1000,2000,3000
    assert len(frames) == 4
    assert all(r["media_id"] == 3 for r in frames)
    assert [r["ts_ms"] for r in sorted(frames, key=lambda r: r["frame_index"])] == [0, 1000, 2000, 3000]
    assert len({r["frame_md5"] for r in frames}) == 4


def test_features_feed_similarity(media):
    feats = M.extract_features(media, dim=16)
    assert dict(feats.dtypes)["embedding"] == "array<float>"
    out = S.cosine_topk(
        feats.filter("media_id = 1"), feats, k=2,
        query_id="media_id", corpus_id="media_id", vec_col="embedding",
    ).collect()
    assert len(out) == 2
    assert all(r["query_id"] == 1 and r["neighbor_id"] != 1 for r in out)
