"""Structured-Streaming operators over the documents corpus — the
real-time leg of the training-data pipeline (the batch legs live in
queries/text.py and queries/dedup.py).

Rows-only in the oracle harness like every streaming query; the batch
twin ``text_decontamination`` carries the SQL oracle over the same
logical plan (tests/test_twin_invariant.py pins the mapping).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etlalchemy_spark.catalog import table_path


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet with the batch schema —
    same single-file/directory handling as ``read_events_stream``
    (pathGlobFilter matches leaf FILE names only)."""
    path = table_path(sf_dir, "documents")
    batch_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        return spark.readStream.schema(batch_schema).parquet(path)
    return (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def decontam_hit_counts(
    docs_stream: DataFrame, eval_shingles: DataFrame, k: int = 5
) -> DataFrame:
    """Streaming benchmark-decontamination scrub: each arriving doc is
    shingled NARROWLY (word_shingles is a pure expression pipeline, so
    it runs unchanged on a streaming DataFrame) and stream-static
    joined against the broadcast eval shingle set; the per-doc hit
    count aggregates in the streaming state. At 100 TB/day of ingest
    the eval set stays tiny and static — this is exactly the shape
    Structured Streaming executes without a stream-stream join or a
    corpus-sized shuffle. ``eval_shingles`` must be a static one-column
    (``te_shingle``) DataFrame."""
    from etlalchemy_spark.operators.dedup import word_shingles

    sh = word_shingles(docs_stream, "doc_id", "text", k=k)
    hits = sh.join(F.broadcast(eval_shingles), sh.shingle == F.col("te_shingle"))
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
