"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata (training-data pipeline extension, see build brief).

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``DecodeUnavailable`` / a deterministic fake — but every Spark-side
piece is real and tested: the schema, the Arrow batch shape through
``mapInPandas``, partition-size control for large binaries, and the
feature-extraction UDF signatures.

At scale: binary payloads dominate partition size — callers should set
``spark.sql.files.maxPartitionBytes`` down (e.g. 32 MB) for tables with
multi-MB blobs, and metadata-only transforms must select away the binary
column (column pruning keeps the scan light).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),     # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])


class DecodeUnavailable(NotImplementedError):
    """Real decoding needs codec libraries not present in this container.

    On a production cluster, swap `_decode_stub` for a Pillow/torchaudio/
    pyav call — the Spark plumbing (schemas, batching, partitioning) is
    unchanged.
    """


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: bytes → fixed-shape float feature block.

    Stands in for decode→resize→normalize. sha256-seeded so tests are
    reproducible and content-sensitive (different payload → different
    features), without any codec dependency.
    """
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2 ** 32)
    rng = np.random.RandomState(seed)
    shape = {"image": (8, 8, 3), "audio": (16, 4), "video": (4, 8, 8)}[kind]
    return rng.rand(*shape).astype(np.float32)


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("content_sha1", T.StringType(), False),
])


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: decode(stub) → flatten → feature
    vector + content hash. Narrow; binary column never shuffles."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                payload = bytes(payload)
                feat = _decode_stub(payload, kind).ravel()
                rows.append((int(mid), kind, feat.tolist(), len(payload),
                             hashlib.sha1(payload).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.select("media_id", "kind", "payload") \
        .mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts).
    Timestamp fan-out is pure JVM (sequence+explode); the decode of each
    frame is the stubbed step."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
            F.lit(every_ms))).alias("frame_ts_ms"),
    )


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    import random as _random
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = _random.Random(f"{seed}:{i}")
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(256 + i % 128))
        rows.append((i, kind, f"application/x-{kind}", payload,
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     5000 if kind != "image" else None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
