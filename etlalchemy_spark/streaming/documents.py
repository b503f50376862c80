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


def _list_batch_dirs(spark: SparkSession, root: str) -> list[str]:
    """Enumerate ``batch=*`` subdirectories of ``root`` via the Hadoop
    FileSystem API — works on any Spark-supported filesystem, not just
    driver-local disk (``os.listdir`` would silently see nothing on
    object storage — ADVICE r7; same portability discipline as
    merge._delete_partition_dirs)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(root)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    return [
        st.getPath().toString()
        for st in fs.listStatus(p)
        if st.isDirectory() and st.getPath().getName().startswith("batch=")
    ]


def compact_batch_store(spark: SparkSession, root: str, n_files: int = 8) -> dict:
    """Maintenance mirror of similarity.compact_bucket_index for the
    per-batch stores this module writes (r7 verdict #3): after 10,000
    micro-batches a ``batch=<id>``-per-trigger store is 10,000
    directories, and every step's store read lists and opens all of
    them. Merge every ``batch=*`` directory into ONE ``batch=-1``
    directory of ``n_files`` well-sized files (micro-batch ids are
    non-negative, so -1 never collides with — and is never excluded
    as — a live batch id).

    MUST run at a checkpoint barrier (stream stopped, or every source
    batch committed — e.g. after an availableNow run terminates): the
    per-batch-dir layout is what makes replays exactly-once, and a
    batch re-delivered AFTER its rows were folded into ``batch=-1``
    would see its own rows as "store" and fabricate self-duplicate
    matches. Rewrite lands in a sibling directory first, is
    row-count-verified, and swaps in via the CHECKED rename protocol
    (layout.swap_directory — r8 review: the first cut deleted live
    dirs before renaming, so a mid-swap crash silently truncated the
    store; now a crash can only leave the store renamed aside, a loud
    missing-path failure with one-rename recovery). Returns
    {"dirs_before", "dirs_after", "rows"}."""
    from etlalchemy_spark.operators.layout import swap_directory

    dirs = _list_batch_dirs(spark, root)
    if not dirs:
        return {"dirs_before": 0, "dirs_after": 0, "rows": 0}
    df = spark.read.parquet(*dirs)
    rows = df.count()
    tmp = root.rstrip("/") + "__compacting"
    df.coalesce(max(1, n_files)).write.mode("overwrite").parquet(
        os.path.join(tmp, "batch=-1")
    )
    got = spark.read.parquet(os.path.join(tmp, "batch=-1")).count()
    if got != rows:
        raise IOError(
            f"compacted store at {tmp} holds {got} rows, expected {rows} — "
            "aborting before touching the live store"
        )
    swap_directory(spark, root, tmp)
    return {"dirs_before": len(dirs), "dirs_after": 1, "rows": rows}


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
    PERSISTED band store (parquet under ``state_dir``).

    Exactly-once under foreachBatch's at-least-once contract (r7
    review finding): every per-batch write lands in its OWN
    ``batch=<id>`` subdirectory with mode=overwrite, so a replayed
    batch (crash between the three writes, checkpoint re-delivery)
    simply overwrites its previous partial output instead of
    appending duplicates or wedging the disjointness guard; and the
    step reads the store EXCLUDING the current batch's subdirectories,
    so a replay can never see its own half-written bands as "store"
    (which would fabricate self-duplicate matches). Final state =
    union over batch dirs, identical no matter how many times any
    batch was delivered. Every per-batch write stays batch-sized;
    the store is only ever extended — the steady-state cost shape of
    the batch op, now driven by real trigger/checkpoint machinery.
    Replay invariance of the step (any batch slicing → the one-shot
    pair set) is what makes this sink correct under arbitrary file
    arrival order; tests/test_streaming.py pins stream ≡ one-shot and
    the mid-stream re-delivery case."""
    import shutil

    from etlalchemy_spark.operators.dedup import incremental_dedup_step, lsh_band_store

    store_docs_p = os.path.join(state_dir, "store_docs")
    store_bands_p = os.path.join(state_dir, "store_bands")
    matches_p = os.path.join(state_dir, "matches")
    ckpt = os.path.join(state_dir, "ckpt")
    for p in (store_docs_p, store_bands_p, matches_p, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def _read_store_excluding(s, root: str, batch_id: int, schema) -> DataFrame:
        dirs = [
            d for d in _list_batch_dirs(s, root) if not d.endswith(f"batch={batch_id}")
        ]
        if not dirs:
            return s.createDataFrame([], schema)
        return s.read.schema(schema).parquet(*dirs)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        new_bands = lsh_band_store(
            batch_df, "doc_id", "text", k=k, num_hashes=num_hashes, bands=bands
        )
        store = _read_store_excluding(s, store_docs_p, batch_id, doc_schema)
        store_bands = _read_store_excluding(
            s, store_bands_p, batch_id, new_bands.schema
        )
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
        # idempotent per-batch writes: overwrite THIS batch's own dirs
        matches.write.mode("overwrite").parquet(
            os.path.join(matches_p, f"batch={batch_id}")
        )
        new_bands.write.mode("overwrite").parquet(
            os.path.join(store_bands_p, f"batch={batch_id}")
        )
        batch_df.write.mode("overwrite").parquet(
            os.path.join(store_docs_p, f"batch={batch_id}")
        )

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
    return spark.read.parquet(*_list_batch_dirs(spark, matches_p))


def run_semantic_dedup_stream(
    spark: SparkSession,
    ingest_dir: str,
    state_dir: str,
    emb_schema,
    cents: DataFrame,
    version_tag: str,
    threshold: float = 0.3,
) -> DataFrame:
    """STREAMING leg of incremental SemDeDup (r8 verdict #8):
    embedding batches arrive as parquet files (maxFilesPerTrigger=1,
    availableNow), foreachBatch runs semantic_dedup_step against the
    persisted cell store under a FIXED codebook (``cents`` +
    ``version_tag`` — pinned upfront, exactly how production ships a
    SemDeDup codebook ahead of the stream). Exactly-once under
    at-least-once delivery via the same per-batch ``batch=<id>``
    overwrite-dir protocol as run_incremental_dedup_stream — and the
    step reads the store EXCLUDING the current batch's dir, so a
    replay never pairs a batch against its own half-written rows.
    The step is ORDER-INVARIANT (both pair directions emitted), so
    the final MIN(dup_of)/SUM(n_dups) aggregate over partials equals
    the one-shot drop list under ANY file arrival order; twin
    `dedup_semantic_incremental` carries the oracle."""
    import shutil

    from pyspark.sql import functions as F  # noqa: F811

    from etlalchemy_spark.operators.similarity import semantic_dedup_step

    store_p = os.path.join(state_dir, "store")
    drops_p = os.path.join(state_dir, "drops")
    ckpt = os.path.join(state_dir, "ckpt")
    for p in (store_p, drops_p, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        dirs = [
            d
            for d in _list_batch_dirs(s, store_p)
            if not d.endswith(f"batch={batch_id}")
        ]
        store = s.read.parquet(*dirs) if dirs else None
        drops, rows = semantic_dedup_step(
            store, batch_df, "vec_id", "embedding", cents, threshold, version_tag
        )
        drops.write.mode("overwrite").parquet(
            os.path.join(drops_p, f"batch={batch_id}")
        )
        rows.write.mode("overwrite").parquet(
            os.path.join(store_p, f"batch={batch_id}")
        )

    stream = (
        spark.readStream.schema(emb_schema)
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
    partials = spark.read.parquet(*_list_batch_dirs(spark, drops_p))
    return partials.groupBy("vec_id").agg(
        F.min("dup_of").alias("dup_of"), F.sum("n_dups").alias("n_dups")
    )
