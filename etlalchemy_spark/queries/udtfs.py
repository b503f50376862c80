"""Python UDTF surface (Spark 4 ``@udtf``) — the table-function slot in
SURVEY.md Table B's UDF/UDAF/UDTF row.

UDTFs run row-at-a-time in Python — the slow path. They are the right
tool only when one input row yields a VARIABLE number of structured
output rows and the expansion logic doesn't decompose into
explode/sequence/transform expressions. The sentence splitter here
needs running character offsets (a scan-carry over the row's text), the
canonical just-out-of-reach case for pure column expressions.

The splitter itself is deterministic, so the query still carries a SQL
oracle: DuckDB regexp functions rebuild the same (doc, sentence-index,
length) table — the UDTF's structure is verified, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t


@udtf(returnType="sent_idx int, sentence string, start_pos int")
class SentenceSplit:
    """Split on '.', '!', '?' runs; yield trimmed sentences with their
    character offsets in the original text."""

    def eval(self, doc_id: int, text: str):  # noqa: D102 (driver-called)
        if text is None:
            return
        import re

        idx = 0
        for m in re.finditer(r"[^.!?]+", text):
            sent = m.group(0).strip()
            if sent:
                yield idx, sent, m.start()
                idx += 1


_SENT_SQL = """
SELECT doc_id, sent_idx, len(sentence) AS sent_len
FROM (
  SELECT doc_id,
         CAST(UNNEST(generate_series(1, len(sents))) - 1 AS INT) AS sent_idx,
         trim(UNNEST(sents)) AS sentence
  FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '[.!?]'),
                       s -> len(trim(s)) > 0) AS sents
    FROM documents
  )
)
"""


@register("udtf_sentence_split", oracle=_SENT_SQL, tags=("text", "udtf"))
def udtf_sentence_split(spark, sf_dir):
    """Sentence segmentation via Python UDTF with offsets; the oracle
    recomputes (doc, index, length) with DuckDB list functions. Arrow
    batches amortize the Python crossing; at scale this parallelizes
    per input partition like any projection."""
    docs = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("sentence_split", SentenceSplit)
    out = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split(d.doc_id, d.text) s
        """
    )
    return out.select("doc_id", "sent_idx", F.length("sentence").alias("sent_len"))


_SQL_UDF_SQL = """
SELECT band, COUNT(*) AS n_parts,
       CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS total_price
FROM (
  SELECT CASE WHEN p_retailprice < 930 THEN 'low'
              WHEN p_retailprice < 970 THEN 'mid'
              ELSE 'high' END AS band,
         p_retailprice
  FROM part
)
GROUP BY band
"""


@register("udf_sql_scalar", oracle=_SQL_UDF_SQL, tags=("sql", "udf"))
def udf_sql_scalar(spark, sf_dir):
    """SQL-defined scalar UDF (Spark 4 CREATE FUNCTION ... RETURN): the
    price-banding logic is declared once as a catalog function and
    INLINED by the analyzer into the calling query — the plan is the
    same CASE expression a hand-written projection produces (whole-
    stage codegen, no Python boundary, unlike every interpreted UDF).
    This is the scalable replacement for the reference's per-row
    Python cleaning hooks (D1): shared logic without leaving the JVM."""
    from etlalchemy_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 930 THEN 'low'
                    WHEN p < 970 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return spark.sql(
        """
        SELECT band, COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4)))
                    AS DECIMAL(38,4)) :: DOUBLE AS total_price
        FROM (SELECT price_band(p_retailprice) AS band, p_retailprice FROM part)
        GROUP BY band
        """
    )


@udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
class UserGapStats:
    """Per-partition stateful table function: consumes one user's
    events in ts order, emits one summary row at partition end."""

    def __init__(self):
        self._uid = None
        self._prev = None
        self._n = 0
        self._gmax = None

    def eval(self, row):  # noqa: D102 (engine-called per input row)
        self._uid = row["user_id"]
        self._n += 1
        ts = row["ts"]
        if self._prev is not None:
            d = ts - self._prev
            us = (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
            self._gmax = us if self._gmax is None else max(self._gmax, us)
        self._prev = ts

    def terminate(self):  # noqa: D102
        if self._uid is not None:
            yield self._uid, self._n, self._gmax


_GAP_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, COUNT(*) AS n_events, CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id
"""


@register("udtf_table_arg_partitioned", oracle=_GAP_SQL, tags=("udtf", "events"))
def udtf_table_arg_partitioned(spark, sf_dir):
    """Spark 4 polymorphic UDTF over a TABLE argument with analyzer-
    managed partitioning: ``gap_stats(TABLE(events) PARTITION BY
    user_id ORDER BY ts, event_id)`` — the ENGINE shuffles/sorts each
    user's rows to one UDTF instance (same exchange a window function
    gets), the Python class keeps O(1) running state per partition and
    emits one row from terminate(). This is the custom-stateful-
    operator escape hatch when neither built-ins nor pandas grouped-map
    fit; the oracle recomputes the gaps with LAG."""
    # Explicit keyed repartition at defaultParallelism ahead of the
    # analyzer-managed PARTITION BY exchange: AQE coalesces that
    # exchange by BYTES, fusing the row-at-a-time Python eval onto 4
    # of 32 cores — the pandas_grouped_mad pathology (AQE cannot cost
    # an opaque Python stage). Scales via defaultParallelism;
    # alternating same-session A/B 1.45 -> 0.79 s.
    ev = t(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    ev.createOrReplaceTempView("_udtf_events")
    spark.udtf.register("user_gap_stats", UserGapStats)
    return spark.sql(
        "SELECT * FROM user_gap_stats"
        "(TABLE(_udtf_events) PARTITION BY user_id ORDER BY (ts, event_id))"
    )


# --- n-gram generator UDTF (r10) -----------------------------------------------------

@udtf(returnType="n int, start_idx int, ngram string")
class NgramGenerator:
    """Emit all word n-grams for n in 1..max_n with their start index —
    one input row fans out to a variable number of rows depending on
    doc length, the UDTF-shaped expansion. (An explode expression
    could build this too; the UDTF variant exists to pin the
    LATERAL-correlated table-function surface with a full value
    oracle, not just the sentence splitter's.)"""

    def eval(self, doc_id: int, text: str, max_n: int):  # noqa: D102
        if text is None:
            return
        import re

        words = re.findall(r"[a-z0-9]+", text.lower())
        for n in range(1, max_n + 1):
            for i in range(len(words) - n + 1):
                yield n, i + 1, " ".join(words[i : i + n])


_NGRAM_UDTF_SQL = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents WHERE doc_id < 100
),
g AS (
  SELECT doc_id, n,
         UNNEST(list_transform(generate_series(1, len(ws) - n + 1),
                i -> array_to_string(ws[CAST(i AS INT):CAST(i AS INT) + CAST(n - 1 AS INT)], ' ')))
           AS ngram
  FROM w, (VALUES (1), (2), (3)) t(n)
  WHERE len(ws) >= n
)
SELECT CAST(n AS INT) AS n, ngram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY n, ngram
HAVING COUNT(*) >= 3
"""


@register("udtf_ngram_generator", oracle=_NGRAM_UDTF_SQL, tags=("text", "udtf"))
def udtf_ngram_generator(spark, sf_dir):
    """Word n-gram generation (n = 1..3) through a LATERAL-correlated
    Python UDTF, aggregated to corpus counts (r10) — the third UDTF
    surface row beside the sentence splitter and the TABLE-argument
    variant. The UDTF fans each doc out to a length-dependent number
    of rows (Arrow-batched per partition — parallelism is the scan's);
    the DuckDB oracle rebuilds identical n-grams with list slices, so
    every emitted VALUE is verified, not just counts. The aggregate
    keeps only n-grams seen >= 3 times (the vocabulary-building
    shape), bounding the result to frequent types."""
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("_udtf_ngram_docs")
    spark.udtf.register("ngram_gen", NgramGenerator)
    out = spark.sql(
        """
        SELECT g.n, g.ngram
        FROM _udtf_ngram_docs d, LATERAL ngram_gen(d.doc_id, d.text, 3) g
        """
    )
    return (
        out.groupBy("n", "ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .where(F.col("cnt") >= 3)
        .select(F.col("n").cast("int").alias("n"), "ngram", "cnt")
    )
