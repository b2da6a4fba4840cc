"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic stubs."""

import hashlib

from pyspark.sql import functions as F

from awesome_spark_search.multimodal import (
    extract_features,
    media_metadata,
    resize_images,
    sample_frames,
    synth_media,
    FEATURE_DIM,
)


def test_extract_features_shapes(spark):
    media = synth_media(spark, 32)
    rows = extract_features(media).collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0


def test_extract_features_deterministic(spark):
    media = synth_media(spark, 16)
    a = {r["media_id"]: r["payload_sha256"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["payload_sha256"] for r in extract_features(media).collect()}
    assert a == b


def test_resize_only_images_and_fixed_size(spark):
    media = synth_media(spark, 30)
    n_images = media.filter(F.col("kind") == "image").count()
    rows = resize_images(media, width=8, height=4).collect()
    assert len(rows) == n_images > 0
    for r in rows:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(bytes(r["payload"])) == 32
        assert hashlib.sha256(bytes(r["payload"])).hexdigest() == r["payload_sha256"]


def test_resize_plan_prunes_payload_of_other_kinds(spark, tmp_path):
    # written to parquet, the image filter + column projection must reach
    # the scan: non-image payload bytes never enter the Python stage
    p = str(tmp_path / "media")
    synth_media(spark, 30).write.parquet(p)
    media = spark.read.parquet(p)
    plan = resize_images(media)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "kind" in plan


def test_sample_frames_video_only(spark):
    media = synth_media(spark, 30)
    rows = sample_frames(media, every_ms=5000, max_frames=4).collect()
    vids = {r["media_id"] for r in rows}
    kinds = {r["media_id"]: r["kind"] for r in media.select("media_id", "kind").collect()}
    assert vids and all(kinds[v] == "video" for v in vids)
    for r in rows:
        assert r["ts_ms"] == r["frame_idx"] * 5000
        assert len(bytes(r["frame_payload"])) == 32


def test_media_metadata_aspect_ratio(spark):
    media = synth_media(spark, 12)
    rows = media_metadata(media).collect()
    for r in rows:
        if r["height"]:
            assert abs(r["aspect_ratio"] - round(r["width"] / r["height"], 4)) < 1e-9
