"""Non-parquet sources with explicit schemas (SURVEY.md §2B scan/source).

Schema is always passed explicitly — `inferSchema` triggers an extra full
scan (2× read at 100 TB) and can silently drift types between runs. CSV and
JSON are row formats with no column pruning or predicate pushdown; at scale
they are ingest formats only: land → convert to parquet (bucketed where a
hot join key exists) → query the parquet.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

# One tempdir for the WHOLE session, cleaned up at interpreter exit by
# TemporaryDirectory's finalizer. The roundtrip queries previously
# mkdtemp'd a fresh directory per plan construction and never removed it,
# so every gate/bench/driver invocation leaked a directory (ADVICE r6).
# Subpaths are keyed by (format, sf basename, full-path hash) so repeat
# invocations reuse and overwrite ONE location, two scale factors never
# collide, and two DIFFERENT fixture roots sharing a basename (/a/sf0.1
# vs /b/sf0.1) never overwrite each other's roundtrip data (ADVICE r7).
_SESSION_TMP: tempfile.TemporaryDirectory | None = None


def _roundtrip_path(kind: str, sf_dir: str) -> str:
    import hashlib

    global _SESSION_TMP
    if _SESSION_TMP is None:
        _SESSION_TMP = tempfile.TemporaryDirectory(prefix="ci-roundtrip-")
    norm = os.path.normpath(os.path.abspath(sf_dir))
    sf = os.path.basename(norm) or "sf"
    tag = hashlib.sha256(norm.encode()).hexdigest()[:8]
    return os.path.join(_SESSION_TMP.name, f"{kind}-{sf}-{tag}")


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV with an explicit DDL schema; malformed rows fail loudly
    (FAILFAST) — silent null-filling (PERMISSIVE default) corrupts
    aggregates downstream where nobody looks."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines with an explicit DDL schema (FAILFAST, as above)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_text_lines(
    spark: SparkSession, path: str, whole: bool = False
) -> DataFrame:
    """Plain-text source: one row per line (``value STRING``), or one row
    per FILE with ``wholetext`` — the raw-corpus ingest shape feeding the
    text/dedup operators. Line splitting happens in the scan (splittable
    by HDFS block unless wholetext); no schema to drift. (wholetext must
    go through the text() parameter: the option-string spelling is
    silently ignored by the reader.)"""
    return spark.read.text(path, wholetext=whole)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile source: (path, modificationTime, length, content BINARY)
    — the multimodal ingest shape (multimodal.py consumes exactly this
    (id, payload) form after a select). Each file is ONE row read in full:
    right for images/audio clips, wrong for large archives — Spark caps
    rows at spark.sql.sources.binaryFile.maxLength (Int.MaxValue). Filters
    on path/length/modificationTime push down to the file listing, so
    `length < N` prunes oversized blobs BEFORE any byte is read."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


# ---------------------------------------------------------------------------
# XML source (built into Spark 4 — no external package)
# ---------------------------------------------------------------------------


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """Write a DataFrame as XML (spark-xml merged into core in Spark 4)."""
    df.write.format("xml").option("rowTag", row_tag).mode("overwrite").save(path)


def read_xml(spark: SparkSession, path: str, schema: str, row_tag: str = "row") -> DataFrame:
    """Schema'd XML read — explicit DDL schema like every reader here
    (schema inference costs an extra pass and drifts under dirty data)."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )


def q_source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as a first-class source/sink (new in Spark 4 core): a
    deterministic orders slice is written as XML, read back with an
    explicit schema, and aggregated — the oracle runs the same aggregate
    on the original parquet, so the gate checks the full write→parse
    roundtrip is lossless for the typed columns. Scale: XML parse work is
    per-row and partition-parallel like any file source; at 100 TB the
    explicit schema is what keeps the scan single-pass."""
    from pyspark.sql import functions as F

    from clusterindices_spark.functions.aggregates import finite_or_null

    from clusterindices_spark.sources.fixtures import load_table

    o = load_table(spark, sf_dir, "orders").withColumn("o_totalprice", finite_or_null("o_totalprice")).where(
        F.col("o_orderkey") % 10 == 0
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = _roundtrip_path("xml", sf_dir)
    write_xml(o, path)
    back = read_xml(
        spark,
        path,
        "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"),
            6,
        ).alias("total_price"),
    )


def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as the second columnar source/sink (native in Spark, zero
    packages): a deterministic orders slice is written as ORC, read back,
    FILTERED (the predicate reaches the ORC reader as a pushed filter —
    ORC keeps min/max stripe statistics exactly like parquet, so the
    filter prunes stripes before decode), and aggregated. The oracle runs
    the same slice+filter+aggregate on the original parquet: the gate
    checks the write→read roundtrip is lossless AND the pushdown path
    returns exactly the unpushed semantics. Scale: columnar scan,
    stripe-parallel, identical posture to the parquet tables."""
    from pyspark.sql import functions as F

    from clusterindices_spark.functions.aggregates import finite_or_null
    from clusterindices_spark.sources.fixtures import load_table

    o = load_table(spark, sf_dir, "orders").withColumn("o_totalprice", finite_or_null("o_totalprice")).where(
        F.col("o_orderkey") % 7 == 0
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    path = _roundtrip_path("orc", sf_dir)
    o.write.mode("overwrite").orc(path)
    back = spark.read.schema(
        "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
    ).orc(path)
    return (
        back.where(F.col("o_totalprice") > 50_000.0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.round(
                F.sum(
                    F.col("o_totalprice").cast("decimal(18,6)")
                ).cast("double"),
                6,
            ).alias("total_price"),
        )
    )


def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as source/sink with an EXPLICIT schema both ways (inference
    costs a pass and drifts under dirty data): a customer slice writes as
    headered CSV and reads back typed; the aggregate's oracle runs on the
    original parquet, so the gate proves the text roundtrip preserves
    BIGINT/DOUBLE/STRING values exactly (Spark's CSV writer emits
    shortest-roundtrip doubles). FAILFAST mode — a malformed row is an
    error, not a silent null row. Scale: line-splittable scan, schema'd
    single pass."""
    from pyspark.sql import functions as F

    from clusterindices_spark.sources.fixtures import load_table

    from clusterindices_spark.functions.aggregates import finite_or_null

    c = load_table(spark, sf_dir, "customer").withColumn("c_acctbal", finite_or_null("c_acctbal")).where(
        F.col("c_custkey") % 5 == 0
    ).select("c_custkey", "c_mktsegment", "c_acctbal")
    path = _roundtrip_path("csv", sf_dir)
    # explicit NULL sentinel: CSV's default writes NULL and '' as the
    # same empty field, so the read merged the empty-string segment
    # group into the NULL group — a silent group-loss the parquet oracle
    # catches (fuzz gate seed 101001). \\N on write + matching read
    # nullValue keeps '' (quoted) and NULL (sentinel) distinct.
    c.write.mode("overwrite").option("header", True).option(
        "nullValue", "\\N"
    ).csv(path)
    back = (
        spark.read.schema("c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE")
        .option("header", True)
        .option("mode", "FAILFAST")
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_custkey").alias("min_key"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_bal"),
    )


def q_source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as source/sink — the lingua franca of training-data
    interchange (every public corpus ships as .jsonl): a documents slice
    (with its free-text column, exercising JSON string escaping) writes
    as JSONL and reads back through read_json's explicit schema +
    FAILFAST; the aggregate's oracle runs on the original parquet, so the
    gate proves write→escape→parse preserves STRING content byte-for-byte
    (token sum + char sum + text length extremes would all drift on any
    escaping loss). Scale: line-splittable scan, schema'd single pass —
    an ingest format (land → convert to parquet), per the module posture.
    """
    from pyspark.sql import functions as F

    from clusterindices_spark.sources.fixtures import load_table

    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 0
    ).select("doc_id", "lang", "text", "n_chars")
    path = _roundtrip_path("jsonl", sf_dir)
    d.write.mode("overwrite").json(path)
    back = read_json(
        spark, path, "doc_id BIGINT, lang STRING, text STRING, n_chars BIGINT"
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.sum(F.length("text")).alias("sum_text_len"),
        F.sum("n_chars").alias("sum_chars"),
        F.max(F.length("text")).cast("bigint").alias("max_text_len"),
    )


QUERIES = {
    "source_jsonl_roundtrip": q_source_jsonl_roundtrip,
    "source_xml_roundtrip": q_source_xml_roundtrip,
    "source_orc_roundtrip": q_source_orc_roundtrip,
    "source_csv_roundtrip": q_source_csv_roundtrip,
}

ORACLES = {
    "source_jsonl_roundtrip": """
SELECT lang,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MAX(length(text)) AS BIGINT) AS max_text_len
FROM documents WHERE doc_id % 3 = 0
GROUP BY lang
""",
    "source_xml_roundtrip": """
SELECT o_orderstatus,
       COUNT(*) AS n,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS total_price
FROM orders WHERE o_orderkey % 10 = 0
GROUP BY o_orderstatus
""",
    "source_orc_roundtrip": """
SELECT o_orderpriority,
       COUNT(*) AS n,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS total_price
FROM orders WHERE o_orderkey % 7 = 0 AND o_totalprice > 50000.0
GROUP BY o_orderpriority
""",
    "source_csv_roundtrip": """
SELECT c_mktsegment,
       COUNT(*) AS n,
       MIN(c_custkey) AS min_key,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS total_bal
FROM customer WHERE c_custkey % 5 = 0
GROUP BY c_mktsegment
""",
}

# fuzz wave-3 batch 3: non-finite prices are missing on both sides —
# the pushed-down ORC/parquet `>` predicate silently drops NaN where the
# in-memory evaluator keeps it (see relational_ext.py batch-3 note)
ORACLES["source_orc_roundtrip"] = ORACLES["source_orc_roundtrip"].replace(
    "FROM orders", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(o_totalprice) THEN o_totalprice END) AS o_totalprice) FROM orders)")

# fuzz wave-3 batch 4 (seeds 103005/103006): same non-finite policy
ORACLES["source_xml_roundtrip"] = ORACLES["source_xml_roundtrip"].replace(
    "FROM orders", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(o_totalprice) THEN o_totalprice END) AS o_totalprice) FROM orders)")

# fuzz wave-3 batch 5 (targeted degenerate-position seeds)
ORACLES["source_csv_roundtrip"] = ORACLES["source_csv_roundtrip"].replace(
    "FROM customer", "FROM (SELECT * REPLACE ((CASE WHEN isfinite(c_acctbal) THEN c_acctbal END) AS c_acctbal) FROM customer)")
