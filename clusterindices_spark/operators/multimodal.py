"""Multimodal binary-column plumbing (task north star).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side machinery — schema, Arrow batching via mapInPandas, partitioning —
is real and tested; the actual media decode is STUBBED (decode libs are not
in this container): ``decode_binary(..., mode="real")`` raises
NotImplementedError, ``mode="fake"`` derives deterministic pseudo-metadata
from the bytes so the pipeline shape is exercised end-to-end.

``multimodal_meta`` is oracle-checked: byte-level metadata (length, first
byte) is SQL-computable in DuckDB over the same UTF-8 bytes, which validates
that the Arrow round-trip through pandas preserves the binary payload
byte-for-byte.

Scale: mapInPandas streams Arrow batches (no per-row Python); keep batches
~10k rows via spark.sql.execution.arrow.maxRecordsPerBatch. Binary payloads
make rows wide — repartition by size (bytes), not row count, before decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clusterindices_spark.sources.fixtures import load_table

DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, first_byte INT, fake_width INT, fake_height INT"
)


def with_binary_payload(d: DataFrame) -> DataFrame:
    """documents with an opaque binary column (UTF-8 bytes of text stand in
    for a media payload) + typed metadata, the multimodal table shape."""
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("media_lang"),
            F.col("source").alias("media_source"),
        ).alias("meta"),
    )


def decode_binary(binary_df: DataFrame, mode: str = "fake") -> DataFrame:
    """Arrow-batched 'decode' of a binary payload column via mapInPandas.

    mode="real" is the integration point for actual image/audio decoding
    (PIL/ffmpeg/etc.) and deliberately raises NotImplementedError here;
    mode="fake" computes deterministic metadata from the raw bytes.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {mode!r}")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            raise NotImplementedError(
                "media decode libs not available in this environment; "
                "plug PIL/torchaudio/ffmpeg here"
            )
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    # deterministic fake decode: pretend bytes are a square-ish
                    # image; real decode would read the actual header
                    "fake_width": payloads.map(
                        lambda b: int(len(b) ** 0.5)
                    ).astype("int32"),
                    "fake_height": payloads.map(
                        lambda b: (len(b) // max(int(len(b) ** 0.5), 1))
                    ).astype("int32"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _decode, schema=DECODE_SCHEMA
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the decode output: byte length + first byte
    must equal DuckDB's view of the same UTF-8 payload."""
    d = load_table(spark, sf_dir, "documents")
    return decode_binary(with_binary_payload(d)).select(
        "doc_id", "n_bytes", "first_byte"
    )


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
}

# first_byte is the first UTF-8 *byte*, not the first codepoint (they only
# coincide for ASCII). DuckDB can't index BLOBs, so derive the UTF-8 lead
# byte from the first codepoint: cp<128 → cp; <2048 → 0xC0|cp>>6;
# <65536 → 0xE0|cp>>12; else 0xF0|cp>>18. Empty text → -1, matching the
# Spark-side fake decode.
ORACLES = {
    "multimodal_meta": """
WITH cp AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         CASE WHEN length(text) = 0 THEN NULL
              ELSE unicode(substr(text, 1, 1)) END AS c
  FROM documents
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(CASE WHEN c IS NULL THEN -1
                 WHEN c < 128 THEN c
                 WHEN c < 2048 THEN 192 + c // 64
                 WHEN c < 65536 THEN 224 + c // 4096
                 ELSE 240 + c // 262144 END AS INT) AS first_byte
FROM cp
""",
}
