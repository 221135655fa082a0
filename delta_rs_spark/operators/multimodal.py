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
