"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic stubs."""

import numpy as np
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


def test_decode_png_golden_pixels():
    """REAL stdlib PNG decode: the make_png fixture is solid (0x10,0x20,0x30)
    RGB with filter-0 rows — every decoded pixel must equal that triple."""
    import numpy as np

    from awesome_spark_search.multimodal import decode_png, make_png

    img = decode_png(make_png(4, 3))
    assert img.shape == (3, 4, 3)
    assert (img == np.array([0x10, 0x20, 0x30], dtype=np.uint8)).all()


def test_decode_png_all_filter_types_roundtrip():
    """Encode a random RGB image applying each PNG scanline filter
    (None/Sub/Up/Average/Paeth, spec-side forward filtering done here in the
    test) and assert decode_png reconstructs the exact pixels."""
    import struct
    import zlib

    import numpy as np

    from awesome_spark_search.multimodal import _PNG_SIG, decode_png

    rng = np.random.default_rng(11)
    h, w, nch = 7, 5, 3
    img = rng.integers(0, 256, (h, w * nch), dtype=np.uint8).astype(np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int64)
    for y in range(h):
        ftype = y % 5
        row = img[y]
        filt = np.zeros(w * nch, dtype=np.int64)
        for x in range(w * nch):
            a = row[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pred = paeth(a, b, c)
            filt[x] = (row[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert np.array_equal(got, img.astype(np.uint8).reshape(h, w, nch))


def test_real_png_resize_through_spark_kernel(spark):
    """media_resize with the REAL injected decoder: PNG payloads decode and
    nearest-neighbor resample inside the mapInPandas kernel; output is
    w*h*3 RGB bytes with the fixture's exact pixel values."""
    from awesome_spark_search.multimodal import (
        MEDIA_SCHEMA,
        make_png,
        png_resize_kernel,
        resize_images,
    )

    rows = [
        (0, "image", "image/png", bytearray(make_png(6, 4)), 6, 4, None),
        (1, "image", "image/png", bytearray(make_png(3, 3)), 3, 3, None),
        (2, "audio", "audio/wav", bytearray(b"\x00" * 16), None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, width=2, height=2, decoder=png_resize_kernel).collect()
    assert {r["media_id"] for r in out} == {0, 1}  # audio never crosses
    for r in out:
        assert len(bytes(r["payload"])) == 2 * 2 * 3
        assert bytes(r["payload"]) == b"\x10\x20\x30" * 4  # solid fixture color


def _wav_from_samples(samples, rate, channels=1, bits=16):
    """Hand-built PCM WAV around explicit int16 samples (interleaved)."""
    import struct

    arr = np.asarray(samples, dtype="<i2")
    data = arr.tobytes() if bits == 16 else (
        ((arr.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    )
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    import struct as _s
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_decode_wav_golden_samples():
    """decode_wav reconstructs exact int16 frames, rate, and channel shape
    from a hand-built PCM container (16-bit stereo and 8-bit mono)."""
    from awesome_spark_search.multimodal import DecoderUnavailable, decode_wav

    stereo = [100, -200, 300, -400, 500, -600]  # 3 frames x 2 ch
    frames, rate = decode_wav(_wav_from_samples(stereo, 44100, channels=2))
    assert rate == 44100 and frames.shape == (3, 2)
    assert frames.flatten().tolist() == stereo

    # 8-bit WAV is unsigned; decode rescales to signed int16 (x-128)<<8
    frames8, rate8 = decode_wav(
        _wav_from_samples([0, 256, -256, 32512], 8000, bits=8)
    )
    assert rate8 == 8000
    assert frames8.flatten().tolist() == [0, 256, -256, 32512]

    import pytest as _pytest
    with _pytest.raises(DecoderUnavailable):
        decode_wav(b"RIFX" + b"\x00" * 40)


def test_wav_resample_identity_and_linear_exactness():
    """Linear-interp resample: identity at equal rates; exact on a linear
    ramp at 2x upsample (every half-step lies on the ramp); stereo downmix
    is the channel mean."""
    from awesome_spark_search.multimodal import wav_resample_kernel

    ramp = list(range(0, 1000, 10))  # linear int16 ramp, 100 samples
    wav = _wav_from_samples(ramp, 8000)
    same = wav_resample_kernel(wav, 8000, 4096)
    assert same.tolist() == ramp

    up = wav_resample_kernel(wav, 16000, 4096)
    assert len(up) == 200
    assert up[::2].tolist() == ramp          # original points preserved
    assert up[1:-1:2].tolist() == [r + 5 for r in ramp[:-1]]  # midpoints

    stereo = [0, 100, 200, 300, 400, 500]    # ch means: 50, 250, 450
    mix = wav_resample_kernel(_wav_from_samples(stereo, 8000, channels=2), 8000, 4096)
    assert mix.tolist() == [50, 250, 450]

    assert len(wav_resample_kernel(wav, 16000, 64)) == 64  # max_samples cap


def test_real_wav_resample_through_spark_kernel(spark):
    """resample_audio with the REAL injected kernel: WAV payloads decode and
    resample inside mapInPandas; constant-signal RMS survives the rate
    change exactly and image rows never cross the Python boundary."""
    from awesome_spark_search.multimodal import (
        MEDIA_SCHEMA,
        make_png,
        resample_audio,
        wav_resample_kernel,
    )

    const = [256] * 300  # make_wav-style constant signal
    rows = [
        (0, "audio", "audio/wav", bytearray(_wav_from_samples(const, 8000)),
         None, None, None),
        (1, "image", "image/png", bytearray(make_png(4, 4)), 4, 4, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resample_audio(
        media, sample_rate=16000, max_samples=4096, decoder=wav_resample_kernel
    ).collect()
    assert [r["media_id"] for r in out] == [0]
    r = out[0]
    assert r["sample_rate"] == 16000 and r["n_samples"] == 600
    assert abs(r["rms"] - 256.0) < 1e-4
    wave = np.frombuffer(bytes(r["payload"]), dtype=np.int16)
    assert (wave == 256).all()
