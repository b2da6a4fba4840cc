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


# ---- decoder contract (stub vs strict vs injected) ------------------------


def test_strict_mode_raises_decoder_unavailable(spark):
    """Production contract: decoder='strict' must fail LOUDLY at plan build
    (never silently fake-decode) in every kernel."""
    import pytest

    from awesome_spark_search.multimodal import (
        DecoderUnavailable,
        resample_audio,
    )

    media = synth_media(spark, 6)
    for kernel in (
        lambda: extract_features(media, decoder="strict"),
        lambda: resize_images(media, 8, 8, decoder="strict"),
        lambda: sample_frames(media, decoder="strict"),
        lambda: resample_audio(media, decoder="strict"),
    ):
        with pytest.raises(DecoderUnavailable):
            kernel()


def test_injected_decoder_flows_through_all_four_kernels(spark):
    """A user-supplied decoder (the PIL/torchaudio/ffmpeg adapter slot) must
    reach every kernel's inner loop and determine its output."""
    import numpy as np

    from awesome_spark_search.multimodal import FEATURE_DIM, resample_audio

    media = synth_media(spark, 12)

    feat = extract_features(
        media, decoder=lambda b, kind: np.full(FEATURE_DIM, 0.25, dtype=np.float32)
    ).collect()
    assert all(r["feature"] == [0.25] * FEATURE_DIM for r in feat)

    rs = resize_images(
        media, 4, 2, decoder=lambda b, w, h: b"\x07" * (w * h)
    ).collect()
    assert rs and all(bytes(r["payload"]) == b"\x07" * 8 for r in rs)

    fr = sample_frames(
        media, decoder=lambda b, ts: ts.to_bytes(4, "big")
    ).collect()
    assert fr and all(
        bytes(r["frame_payload"]) == r["ts_ms"].to_bytes(4, "big") for r in fr
    )

    au = resample_audio(
        media, decoder=lambda b, rate, mx: np.full(5, 3, dtype=np.int16)
    ).collect()
    assert au and all(r["n_samples"] == 5 and abs(r["rms"] - 3.0) < 1e-6 for r in au)


def test_bad_decoder_value_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        extract_features(synth_media(spark, 2), decoder="nope")


# ---- real stdlib container probe ------------------------------------------


def test_probe_payload_parses_real_png_and_wav():
    from awesome_spark_search.multimodal import probe_payload
    from awesome_spark_search.multimodal import make_png as _tiny_png, make_wav as _tiny_wav

    png = probe_payload(_tiny_png(w=17, h=9, bit_depth=8))
    assert (png["container"], png["width"], png["height"], png["bit_depth"]) == (
        "png", 17, 9, 8,
    )
    wav = probe_payload(_tiny_wav(rate=8000, channels=2, bits=16, n_frames=4000))
    assert (wav["container"], wav["channels"], wav["sample_rate"],
            wav["bit_depth"], wav["duration_ms"]) == ("wav", 2, 8000, 16, 500)
    assert probe_payload(b"garbage bytes")["container"] == "unknown"


def test_probe_media_distributed(spark):
    from awesome_spark_search.multimodal import MEDIA_SCHEMA, probe_media
    from awesome_spark_search.multimodal import make_png as _tiny_png, make_wav as _tiny_wav

    rows = [
        (0, "image", "image/png", bytearray(_tiny_png(5, 4)), None, None, None),
        (1, "audio", "audio/wav", bytearray(_tiny_wav(16000, 1, 16, 16000)),
         None, None, None),
        (2, "video", "video/mp4", bytearray(b"\x00\x01\x02"), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in probe_media(media).collect()}
    assert (got[0]["container"], got[0]["width"], got[0]["height"]) == ("png", 5, 4)
    assert (got[1]["container"], got[1]["sample_rate"], got[1]["duration_ms"]) == (
        "wav", 16000, 1000,
    )
    assert got[2]["container"] == "unknown"
