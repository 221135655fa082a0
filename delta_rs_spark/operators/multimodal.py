"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct. Decode / feature-extraction runs as Arrow-batched
`mapInPandas` — the real seam a cluster deployment would use (schema,
batching, partitioning are all real here). The codec itself is STUBBED
(`decode_stub`) because no image/audio libraries exist in this container:
it derives deterministic pseudo-features from the bytes, and raises
`NotImplementedError` when asked for a real codec.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum32", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def decode_stub(payload: bytes, codec: str = "fake") -> dict:
    """Deterministic stand-in for an image decoder.

    A real deployment swaps this for PIL/ffmpeg inside the same mapInPandas;
    the Spark-side contract (bytes in → feature dict out) is unchanged.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} requires image/audio libraries not present in this "
            "environment; only the deterministic 'fake' codec is available"
        )
    checksum = 0
    for b in payload:
        checksum = (checksum * 31 + b) % (1 << 32)
    return {
        "n_bytes": len(payload),
        "checksum32": checksum,
        "fake_width": (len(payload) % 640) + 1,
        "fake_height": ((len(payload) * 7) % 480) + 1,
    }


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: utf-8 bytes of the text column, with typed metadata —
    the shape a real corpus with inline media would have."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("codec"),
            F.length(F.col(text_col)).alias("orig_chars"),
        ).alias("media_meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` keeps the batch shape: each pandas chunk holds a bounded
    number of payloads (spark.sql.execution.arrow.maxRecordsPerBatch), so
    executor memory stays flat no matter how large the corpus is.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


MULTIMODAL_ORACLE_SQL = """
WITH payloads AS (
  SELECT doc_id, encode(text) AS payload FROM documents
)
SELECT doc_id,
       octet_length(payload) AS n_bytes,
       octet_length(payload) % 640 + 1 AS fake_width,
       (octet_length(payload) * 7) % 480 + 1 AS fake_height
FROM payloads ORDER BY doc_id
"""


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("target_width", T.IntegerType()),
        T.StructField("target_height", T.IntegerType()),
    ]
)


def resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched 'resize': bytes in → (transformed) bytes out, 1:1 rows.

    The stub scales the payload length proportionally to the pixel-count
    ratio against the fake decoded dims — a real deployment swaps the body
    for PIL's `Image.resize` with the identical mapInPandas contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payloads = []
            for p in pdf["payload"]:
                d = decode_stub(p)
                ratio = (width * height) / max(d["fake_width"] * d["fake_height"], 1)
                n = max(int(len(p) * min(ratio, 1.0)), 1)
                out_payloads.append(bytes(p[:n]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": out_payloads,
                    "target_width": width,
                    "target_height": height,
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Arrow-batched 1→N expansion: sample 'frames' out of each payload.

    The row-expanding shape (one input row yields up to max_frames output
    rows inside the same pandas batch) is exactly how video frame sampling
    runs on a cluster — ffmpeg replaces the byte-slicing stub, the Spark
    contract stays."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(min(max(len(p), 1) // every_n_bytes + 1, max_frames)):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(bytes(p[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(batches, FRAME_SCHEMA)
