"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode/feature kernels are STUBS (the container has no image/audio
libraries — see ``_require_decoder``); everything Spark-side is real and
tested: schemas, Arrow batch shapes, mapInPandas iterator contracts,
partitioning. Swapping the stub for a real decoder (PIL/torchaudio/ffmpeg)
changes only the inner function body.

Scale: media bytes stay in a single binary column, processed by mapInPandas
(streaming Arrow batches — bounded memory per task regardless of corpus
size); metadata-only operations project away the binary column so Parquet
never reads the payload (columnar pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


class DecoderUnavailable(NotImplementedError):
    pass


def _require_decoder(kind: str):
    raise DecoderUnavailable(
        f"no {kind} decoder in this environment — plug PIL/torchaudio/ffmpeg "
        "into _decode_stub; the Spark pipeline around it is real and tested"
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake 'decode' so the pipeline is testable end-to-end:
    derives FEATURE_DIM floats from the sha256 of the payload. Replace with a
    real decoder in production (raises via _require_decoder there)."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: binary payload -> fixed-dim vector.
    One Arrow batch in, one out; never materializes the whole partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
                feats.append(_decode_stub(b, kind).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_sha256": shas,
                    "n_bytes": sizes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: derives w*h bytes from a rolling sha256 of
    the payload. Replace with PIL `Image.resize` in production
    (raises via _require_decoder there)."""
    out = bytearray()
    seed = hashlib.sha256(payload or b"").digest()
    block = seed
    while len(out) < w * h:
        block = hashlib.sha256(block).digest()
        out.extend(block)
    return bytes(out[: w * h])


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """mapInPandas image resize: only `kind == 'image'` rows are processed;
    the filter happens BEFORE the Python boundary so audio/video payload
    bytes never cross into Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _resize_stub(bytes(p) if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                    "payload_sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 5000,
                  max_frames: int = 8) -> DataFrame:
    """mapInPandas video frame sampling: one output row per sampled frame.
    Frame timestamps step by ``every_ms`` up to duration; the fake frame
    payload is sha256(payload || ts) — deterministic and schema-faithful.
    Replace the inner derivation with an ffmpeg seek+decode in production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for media_id, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload) if payload is not None else b""
                dur = int(dur) if pd.notna(dur) else 0
                n = min(max_frames, max(1, dur // every_ms + 1))
                for i in range(n):
                    ts = i * every_ms
                    ids.append(media_id)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(
                        hashlib.sha256(b + ts.to_bytes(8, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_payload": frames,
                }
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(run, FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.FloatType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resample_audio(media: DataFrame, sample_rate: int = 16000,
                   max_samples: int = 4096) -> DataFrame:
    """mapInPandas audio resample stub: only `kind == 'audio'` rows cross the
    Python boundary. The fake kernel derives a deterministic int16 waveform
    from the payload bytes and reports its RMS; swap for torchaudio/librosa
    resampling in production (raises via _require_decoder there)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rms, payloads = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                wave = np.frombuffer(
                    (b * (max_samples * 2 // max(len(b), 1) + 1))[: max_samples * 2],
                    dtype=np.int16,
                )
                ids.append(media_id)
                ns.append(len(wave))
                rms.append(float(np.sqrt(np.mean(wave.astype(np.float64) ** 2))) if len(wave) else 0.0)
                payloads.append(wave.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series([sample_rate] * len(ids), dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float32"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(run, AUDIO_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — payload column pruned at the Parquet scan."""
    return media.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms"
    ).withColumn(
        "aspect_ratio",
        F.when(
            (F.col("height").isNotNull()) & (F.col("height") > 0),
            F.round(F.col("width") / F.col("height"), 4),
        ),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                f"application/x-{kind}",
                bytearray(payload),
                64 + i % 7 if kind != "audio" else None,
                48 + i % 5 if kind != "audio" else None,
                1000 * (i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
