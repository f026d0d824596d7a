"""Multimodal plumbing: canonical schema lift, 1:1 decode, and the
row-exploding frame-sample stage (decode stubbed — no media libs in this
container; batch shapes/schema/projection are the real thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    attach_binary_meta, decode_stub_features, frame_sample,
)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return attach_binary_meta(
        docs.select("doc_id", F.col("text").cast("binary").alias("payload")),
        bytes_col="payload", id_col="doc_id", modality="video")


def test_frame_sample_explodes_rows(spark, sf_dir):
    media = _media(spark, sf_dir)
    n_media = media.count()
    frames = frame_sample(media, n_frames=4, frame_interval_ms=500)
    rows = frames.collect()
    assert len(rows) == n_media * 4
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, fr in by_media.items():
        assert sorted(r["frame_idx"] for r in fr) == [0, 1, 2, 3]
        assert sorted(r["ts_ms"] for r in fr) == [0, 500, 1000, 1500]
        assert all(len(r["feature"]) == 8 for r in fr)
        # features are per-frame (byte-window) — frames of one video differ
        assert len({tuple(r["feature"]) for r in fr}) > 1


def test_frame_sample_projects_payload_away(spark, sf_dir):
    frames = frame_sample(_media(spark, sf_dir), n_frames=2)
    assert "payload" not in frames.columns
    assert frames.schema["feature"].dataType.simpleString() == "array<float>"


def test_frame_sample_deterministic(spark, sf_dir):
    a = {(r["media_id"], r["frame_idx"], tuple(r["feature"]))
         for r in frame_sample(_media(spark, sf_dir)).collect()}
    b = {(r["media_id"], r["frame_idx"], tuple(r["feature"]))
         for r in frame_sample(_media(spark, sf_dir).repartition(5)).collect()}
    assert a == b


def test_decode_features_normalized(spark, sf_dir):
    feats = decode_stub_features(_media(spark, sf_dir)).collect()
    for r in feats:
        assert abs(sum(r["feature"]) - 1.0) < 1e-3
        assert r["n_bytes"] > 0
