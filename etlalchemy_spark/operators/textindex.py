"""Persisted inverted (full-text) index with incremental append —
the lexical twin of the ANN bucket index (operators/similarity.py:
append/probe/compact_bucket_index): build postings ONCE, answer
keyword queries by reading only the buckets the query terms hash to.

Store layout under ``store_path``:

- ``bucket=<b>/`` parquet partitions of postings rows
  (term, doc_id, tf, dl, idx_version) — bucket = pmod(xxhash64(term),
  n_buckets), so a probe for Q literal terms prunes the scan to at
  most Q partition directories regardless of corpus size.
- ``_stats/`` tiny per-batch aggregate rows (n_docs, sum_dl): the
  corpus size N and average document length that BM25 needs, summed at
  probe time over O(batches) rows — never a corpus rescan.
- ``_INDEX_VERSION`` sidecar (shared helpers from the ANN index): the
  tokenizer convention + bucket count are part of the version tag, so
  probing a store built with a different tokenization fails LOUDLY
  before any data is read.

Scoring mirrors ``text_bm25_search`` exactly (k1=1.2, b=0.75, the
RATIONAL idf core (N-df+0.5)/(df+0.5) — no libm log anywhere), and
df(term) comes from the fetched postings themselves: the store holds
every posting for a term or none, so the per-term count IS the
document frequency. The correctness gate (queries/text.py
``text_index_bm25_probe``) therefore asserts the strongest property an
index can have: the probe result is bit-identical to the full-scan
BM25 oracle over the raw corpus.

Append discipline: batches must be DISJOINT on doc_id (a replayed
batch would double tf/df silently) — enforced like the dedup band
store's guard with one column-pruned semi-join that stops at the
first few offenders. ``compact_text_index`` collapses the
files-per-bucket growth of many appends and re-audits every row's version tag.

Upstream reference (seanharr11/etlalchemy) has no retrieval surface;
this is part of the mandated LLM-pipeline layer (corpus search /
retrieval-eval loops) engineered for the 100 TB target: index cost is
one pass over each NEW batch, probe cost is |query terms| directories
+ O(batches) stats rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etlalchemy_spark.operators.similarity import (
    _write_index_version,
    read_index_version,
)

TOKEN_SPLIT = "[^a-z]+"  # text_bm25_search's convention, shared verbatim
BM25_K1 = 1.2
BM25_B = 0.75


def text_index_version(n_buckets: int) -> str:
    return f"txtidx:v1:split={TOKEN_SPLIT}:b{n_buckets}"


def _postings(docs: DataFrame, id_col: str, text_col: str, n_buckets: int):
    words = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
    dl = F.size(F.filter(words, lambda x: x != "")).cast("bigint")
    base = docs.select(
        F.col(id_col).alias("doc_id"), dl.alias("dl"), F.explode(words).alias("term")
    ).where(F.col("term") != "")
    tf = base.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    return tf.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))


def append_text_index(
    store_path: str,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
    check_disjoint: bool = True,
) -> None:
    """Tokenize ONE batch and append its postings under bucket
    partitions plus one tiny ``_stats`` aggregate row. Cost scales
    with the batch, never the indexed corpus. Batches must be disjoint
    on doc_id (``check_disjoint`` probes the store's pruned doc_id
    column and stops at the first offenders — the likeliest violation
    is a replayed batch, which would silently double tf and df)."""
    spark = docs.sparkSession
    tag = text_index_version(n_buckets)
    existing = read_index_version(spark, store_path)
    if existing is not None and existing != tag:
        raise ValueError(
            f"text index at {store_path} carries version {existing!r}; "
            f"refusing to append postings tokenized as {tag!r}"
        )
    if existing is not None and check_disjoint:
        overlap = [
            r[0]
            for r in spark.read.parquet(store_path)
            .select("doc_id")
            .join(
                docs.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
            )
            .limit(5)
            .collect()
        ]
        if overlap:
            raise ValueError(
                f"text index append overlaps the store on doc_id "
                f"(sample: {overlap}) — a replayed batch doubles tf/df; "
                "compact cannot repair double-counted stats"
            )
    rows = _postings(docs, id_col, text_col, n_buckets).withColumn(
        "idx_version", F.lit(tag)
    )
    # sidecar BEFORE data — the ANN index's crash-window ordering
    if existing is None:
        _write_index_version(spark, store_path, tag)
    rows.write.mode("append").partitionBy("bucket").parquet(store_path)
    words = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
    dl = F.size(F.filter(words, lambda x: x != "")).cast("bigint")
    docs.select(dl.alias("dl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    ).write.mode("append").parquet(store_path + "/_stats")


def probe_text_index(
    spark,
    store_path: str,
    terms: list[str],
    k: int = 20,
    n_buckets: int = 64,
) -> DataFrame:
    """BM25 top-k for literal ``terms`` against the persisted index:
    version-check the sidecar, prune the postings scan to the at most
    ``len(terms)`` bucket directories the terms hash to, derive
    df(term) from the fetched postings (complete by construction), N
    and avgdl from the O(batches) stats rows, and score with
    text_bm25_search's exact arithmetic — fixed-order per-term slot
    sum, rational idf, ties to the lowest doc_id."""
    tag = text_index_version(n_buckets)
    found = read_index_version(spark, store_path)
    if found != tag:
        raise ValueError(
            f"text index at {store_path} carries version {found!r}, "
            f"probe expects {tag!r}"
        )
    terms = list(dict.fromkeys(terms))  # preserve order, drop dups
    # the terms' buckets through the SAME in-engine expression the
    # writer used (a driver-side reimplementation of xxhash64 could
    # drift); |terms| rows, one tiny collect
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = sorted(
        {
            r["b"]
            for r in tdf.select(
                F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b")
            ).collect()
        }
    )
    postings = (
        spark.read.parquet(store_path)
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(terms))
    )
    stats = spark.read.parquet(store_path + "/_stats").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                (
                    ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (
                    (F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(BM25_K1)
                        * (
                            F.lit(1.0 - BM25_B)
                            + F.lit(BM25_B)
                            * (F.col("dl").cast("double") / F.col("avgdl"))
                        )
                    )
                )
            ).alias("s"),
        )
    )
    slots = [
        F.coalesce(F.max(F.when(F.col("term") == term, F.col("s"))), F.lit(0.0))
        for term in terms
    ]
    score = slots[0]
    for extra in slots[1:]:
        score = score + extra
    return (
        scored.groupBy("doc_id")
        .agg(score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def compact_text_index(spark, store_path: str) -> dict[str, int]:
    """Offline maintenance: many appends leave files-per-bucket
    tracking append history — rewrite each bucket as one well-sized
    file after auditing every row's version tag (null-safe, the ANN
    compactor's rule). Postings are NOT deduplicated: the append-time
    disjointness guard is what keeps (doc_id, term) unique, and
    silently dropping duplicates here would mask a double-counted
    ``_stats`` sidecar. Uses the checked rename swap from
    operators/layout.py — a crash leaves a LOUDLY missing path, never
    a truncated store."""
    from etlalchemy_spark.operators.layout import swap_directory

    tag = read_index_version(spark, store_path)
    if tag is None:
        raise ValueError(f"text index at {store_path} has no version sidecar")
    idx = spark.read.parquet(store_path)
    audit = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (~F.col("idx_version").eqNullSafe(F.lit(tag))).cast("long")
        ).alias("n_bad"),
    ).collect()[0]
    if audit["n_bad"]:
        raise ValueError(
            f"text index at {store_path} has {audit['n_bad']} rows whose "
            f"version is NULL or not {tag!r} — rebuild instead of compacting"
        )
    tmp = store_path + "__compact"
    idx.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    # carry the sidecar + stats into the replacement before the swap
    _write_index_version(spark, tmp, tag)
    spark.read.parquet(store_path + "/_stats").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp + "/_stats")
    swap_directory(spark, store_path, tmp)
    return {"rows": int(audit["n"])}
