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


def run_incremental_dedup_stream(
    spark: SparkSession,
    ingest_dir: str,
    state_dir: str,
    doc_schema,
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """The STREAMING leg of the closed incremental-dedup loop
    (operators/dedup.py incremental_dedup_step): ingest arrives as
    parquet FILES dropped into ``ingest_dir`` — the real shape of a
    100 TB feed — and ``maxFilesPerTrigger=1`` makes each file one
    micro-batch. Per batch, foreachBatch runs ONE step against the
    PERSISTED band store (parquet under ``state_dir``): matches land
    append-only, the batch's band rows append to the store (appending
    new bands ≡ the step's returned union, without rewriting — or
    reading-while-overwriting — corpus-sized state), and the batch
    docs append to the store corpus for future candidate re-shingling.
    Every per-batch write is batch-sized; the store is only ever
    APPENDED to — exactly the steady-state cost shape of the batch op,
    now driven by Structured Streaming's trigger/checkpoint machinery.
    Replay invariance of the step (any batch slicing → the one-shot
    pair set) is what makes this sink correct under arbitrary file
    arrival order; tests/test_streaming.py pins stream ≡ one-shot."""
    import shutil

    from etlalchemy_spark.operators.dedup import incremental_dedup_step, lsh_band_store

    store_docs_p = os.path.join(state_dir, "store_docs")
    store_bands_p = os.path.join(state_dir, "store_bands")
    matches_p = os.path.join(state_dir, "matches")
    ckpt = os.path.join(state_dir, "ckpt")
    for p in (store_docs_p, store_bands_p, matches_p, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        if os.path.exists(store_bands_p):
            store = s.read.parquet(store_docs_p)
            store_bands = s.read.parquet(store_bands_p)
        else:
            store = s.createDataFrame([], doc_schema)
            store_bands = None
        matches, _ = incremental_dedup_step(
            store,
            batch_df,
            "doc_id",
            "text",
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            store_bands=store_bands,
        )
        matches.write.mode("append").parquet(matches_p)
        lsh_band_store(
            batch_df, "doc_id", "text", k=k, num_hashes=num_hashes, bands=bands
        ).write.mode("append").parquet(store_bands_p)
        batch_df.write.mode("append").parquet(store_docs_p)

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ingest_dir)
    )
    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(matches_p)
