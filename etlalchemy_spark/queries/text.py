"""Text-analysis queries over the documents table (language ID, quality
scoring, token counting, fingerprinting) — all oracle-checked: the
operators are formulated on exact integer counts, md5, and double
ratios of identical operands.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.text import (
    bpe_ish_token_count,
    lang_id,
    lang_scores,
    md5_fingerprint,
    quality_features,
    quality_score,
    shingle_min_fingerprint,
    token_count,
)
from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import cut, shingle_ctes, t

_TOKENS_SQL = """
SELECT doc_id,
       CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+'))
         + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_bpe_ish,
       LENGTH(text) AS n_chars_measured
FROM documents
"""


@register("text_token_count", oracle=_TOKENS_SQL, tags=("text",))
def text_token_count(spark, sf_dir):
    """Whitespace + BPE-ish token counting (operators.text)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).cast("bigint").alias("n_bpe_ish"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
    )


_QUALITY_SQL = """
WITH f AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens,
         len(list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
             w -> w IN ('the','a','an','and','or','of','to','in','is','it'))) AS n_stop,
         len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
         len(regexp_extract_all(text, '[A-Z]')) AS n_upper
  FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS avg_token_len,
       CAST(n_punct AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS punct_ratio,
       CAST(n_upper AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS upper_ratio,
       CAST(n_stop AS DOUBLE) / CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS stopword_ratio,
       (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.4
       + (CASE WHEN CAST(n_stop AS DOUBLE) / CAST(GREATEST(n_tokens, 1) AS DOUBLE) >= 0.05
               THEN 1.0 ELSE 0.0 END) * 0.3
       + (1.0 - LEAST(CAST(n_punct AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE) * 10, 1.0)) * 0.2
       + (1.0 - LEAST(CAST(n_upper AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE) * 10, 1.0)) * 0.1
         AS quality
FROM f
"""


@register("text_quality_score", oracle=_QUALITY_SQL, tags=("text", "bench"))
def text_quality_score(spark, sf_dir):
    """Corpus quality features + composite score (operators.text)."""
    docs = t(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["upper_ratio"].alias("upper_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        quality_score(feats).alias("quality"),
    )


_LANG_SQL = """
WITH s AS (
  SELECT doc_id, lang AS labeled_lang,
    len(list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
        w -> w IN ('der','die','und','ist','nicht'))) AS s_de,
    len(list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
        w -> w IN ('the','and','of','to','in'))) AS s_en,
    len(list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
        w -> w IN ('el','la','que','de','los'))) AS s_es,
    len(list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
        w -> w IN ('le','la','et','est','les'))) AS s_fr,
    len(list_filter(regexp_split_to_array(lower(TRIM(text)), '\\s+'),
        w -> w IN ('的','是','了','在','我'))) AS s_zh
  FROM documents
)
SELECT doc_id, labeled_lang,
  CASE WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) < 1 THEN 'und'
       WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
       WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
       WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
       WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
       ELSE 'zh' END AS predicted_lang
FROM s
"""


@register("text_lang_id", oracle=_LANG_SQL, tags=("text",))
def text_lang_id(spark, sf_dir):
    """Marker-word language ID vs the labeled lang column (argmax with
    alphabetical tie-break, 'und' when no markers hit)."""
    # map-bound marker-word scoring over every row — spread past the
    # single-row-group scan fusion (footer-guarded; the r13 lang-id
    # family treatment, this query had been missed)
    docs = _spread_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )


_LANG_AGG_SQL = f"""
WITH p AS ({_LANG_SQL})
SELECT labeled_lang, predicted_lang, COUNT(*) AS n
FROM p GROUP BY labeled_lang, predicted_lang
"""


@register("text_lang_confusion", oracle=_LANG_AGG_SQL, tags=("text",))
def text_lang_confusion(spark, sf_dir):
    """Confusion matrix of labeled vs predicted language."""
    return (
        text_lang_id(spark, sf_dir)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_FP_SQL = """
WITH n AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
)
SELECT doc_id,
       md5(norm) AS content_fp,
       list_aggregate(
         list_transform(generate_series(1, GREATEST(LENGTH(norm) - 7, 1)),
                        i -> md5(substr(norm, CAST(i AS INT), 8))),
         'min') AS shingle_fp
FROM n
"""


@register("text_fingerprint", oracle=_FP_SQL, tags=("text",))
def text_fingerprint(spark, sf_dir):
    """Document fingerprints: whole-content md5 + min-md5 over 8-char
    shingles (rolling-hash style, robust to small edits). Spread to
    full parallelism first: ~one md5 PER CHARACTER of text, by far the
    heaviest map stage in the text family, and the gate-scale table is
    one parquet partition (18.2 s -> 1.3 s at sf0.1 from the
    repartition alone, r13 optimization round)."""
    docs = _spread_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        md5_fingerprint(F.col("text")).alias("content_fp"),
        shingle_min_fingerprint(F.col("text"), k=8).alias("shingle_fp"),
    )


_SENT_SQL = """
SELECT doc_id, n_pos, n_neg,
       CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tok AS DOUBLE) AS sentiment
FROM (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN ('fast', 'big'))) AS n_pos,
         len(list_filter(toks, x -> x IN ('slow', 'small'))) AS n_neg,
         len(toks) AS n_tok
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
)
"""


@register("text_sentiment_lexicon", oracle=_SENT_SQL, tags=("text",))
def text_sentiment_lexicon(spark, sf_dir):
    """Lexicon sentiment (SURVEY §7 phase 3): ±word-list hit counts
    normalized by token count, entirely array expressions —
    size(filter(tokens, IN lexicon)) — so the lexicon ships inside the
    codegen'd plan, no UDF, no join. Swap the literal lists for a
    broadcast join when the lexicon outgrows a literal (~10k words)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    n_pos = F.size(F.filter(toks, lambda x: x.isin("fast", "big")))
    n_neg = F.size(F.filter(toks, lambda x: x.isin("slow", "small")))
    return docs.select(
        "doc_id",
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        ((n_pos - n_neg).cast("double") / F.size(toks).cast("double")).alias("sentiment"),
    )


_BIGRAM_SQL = """
SELECT bigram, COUNT(*) AS n
FROM (
  SELECT UNNEST(list_transform(
           generate_series(1, GREATEST(len(words) - 1, 0)),
           i -> words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT) + 1]
         )) AS bigram
  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS words FROM documents)
)
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 25
"""


@register("text_top_bigrams", oracle=_BIGRAM_SQL, tags=("text", "topk"))
def text_top_bigrams(spark, sf_dir):
    """Corpus-wide top-25 bigrams: sequence/transform/explode (no
    UDF), count, total-ordered top-k. The n-gram language-model
    frequency table in one shuffle + TakeOrdered."""
    docs = _spread_docs(spark, sf_dir)  # bigram build is map-bound
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
    )
    return (
        docs.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(25)
    )


_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM documents
  ) WHERE t <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
), nn AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * (CAST(nn.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN nn
)
SELECT doc_id, term, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
"""


@register("text_tfidf_topterms", oracle=_TFIDF_SQL, tags=("text", "bench"))
def text_tfidf_topterms(spark, sf_dir):
    """Top-3 characteristic terms per document by TF-IDF with a
    RATIONAL idf (N/df instead of log(N/df)): log() rounding is
    libm-specific, a single double division is correctly rounded
    everywhere — same ranking, hash-exact scores. One explode + two
    hash aggregates; the small per-term document-frequency table joins
    back broadcast-style, and the rank window partitions by doc."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # NOTE deriving df from tf (tf rows are the distinct pairs) looks
    # like it should share tf's shuffle, but measured SLOWER (1.32 s vs
    # 1.10 s median at sf0.1): the reuse doesn't materialize and the
    # dfreq broadcast then serializes behind the full (doc,term)
    # aggregate, while the two-branch form computes both aggregates
    # concurrently with map-side partials. The df branch dedups each
    # doc's terms NARROWLY (array_distinct before the explode, same
    # move as word_shingles) so it is one shuffle, not an exploded
    # (doc, term) distinct followed by the per-term count (0.84 s →
    # 0.61 s median at sf0.1). Same one-row-per-doc_id precondition as
    # word_shingles: duplicate doc_id rows would count df per ROW
    # while the oracle counts DISTINCT doc_id.
    dfreq = (
        d.select(
            F.explode(
                F.array_distinct(F.split(F.lower("text"), "[^a-z]+"))
            ).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "score")
    )


_BOILERPLATE_SQL = f"""
WITH {shingle_ctes(5)}
SELECT shingle, COUNT(*) AS n_docs
FROM sh GROUP BY shingle HAVING COUNT(*) >= 2
"""


@register("text_boilerplate_shingles", oracle=_BOILERPLATE_SQL, tags=("text", "dedup"))
def text_boilerplate_shingles(spark, sf_dir):
    """Boilerplate detection: 5-word shingles occurring in >= 2
    distinct documents (headers/footers/templates in a real corpus).
    Same shingle pipeline as MinHash (split → sequence → transform →
    explode, per-doc distinct), one hash aggregate over the shingle —
    at scale you'd shingle-hash first (word_shingles hashed=True) so
    the shuffle carries 8 bytes, not strings."""
    from etlalchemy_spark.operators.dedup import word_shingles

    d = _spread_docs(spark, sf_dir)  # shingle build is map-bound
    sh = word_shingles(d, "doc_id", "text", k=5)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )


_PII_SQL = """
WITH src AS (
  SELECT c_custkey,
         c_name || ' call ' ||
         printf('%02d-%03d-%03d-%04d',
                c_custkey % 90 + 10, c_custkey % 900 + 100,
                c_nationkey % 900 + 100, c_custkey % 9000 + 1000) ||
         ' acct ' || CAST(c_custkey * 7919 + c_nationkey AS VARCHAR) AS raw
  FROM customer
)
SELECT c_custkey,
       regexp_replace(
         regexp_replace(raw, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
         '[0-9]+', '#', 'g') AS redacted,
       CAST(length(regexp_extract_all(raw, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       CAST(length(regexp_extract_all(raw, '[0-9]+')) AS BIGINT) AS n_digit_runs
FROM src
"""


@register("text_pii_redaction", oracle=_PII_SQL, tags=("text", "privacy"))
def text_pii_redaction(spark, sf_dir):
    """PII redaction for training-data pipelines: mask phone-shaped
    tokens with a typed placeholder, then collapse any residual digit
    run, and count what was redacted per record (audit column). Pure
    narrow regexp expression work — JVM codegen, no UDF, no shuffle;
    at 100 TB this runs scan-speed and the audit counts roll up
    map-side. The phone pattern (NN-NNN-NNN-NNNN) matches identically
    under Java regex and RE2. The fixture carries no real PII, so the
    contact string is synthesized deterministically in-plan (printf on
    key columns) — the redaction expressions are the operator."""
    c = t(spark, sf_dir, "customer")
    phone_pat = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    k, nk = F.col("c_custkey"), F.col("c_nationkey")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d", k % 90 + 10, k % 900 + 100, nk % 900 + 100, k % 9000 + 1000
    )
    acct = (k * 7919 + nk).cast("string")
    raw = F.concat_ws(
        "", F.col("c_name"), F.lit(" call "), phone, F.lit(" acct "), acct
    )
    return c.select(
        "c_custkey",
        raw.alias("raw"),
    ).select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), phone_pat, "[PHONE]"), "[0-9]+", "#"
        ).alias("redacted"),
        F.regexp_count(F.col("raw"), F.lit(phone_pat)).cast("bigint").alias("n_phones"),
        F.regexp_count(F.col("raw"), F.lit("[0-9]+")).cast("bigint").alias("n_digit_runs"),
    )


_CHUNK_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents
)
SELECT doc_id,
       start,
       (start - 1) // 10 AS chunk_ord,
       array_to_string(words[CAST(start AS INT):CAST(start AS INT)+19], ' ') AS chunk_text,
       len(words[CAST(start AS INT):CAST(start AS INT)+19]) AS n_tokens
FROM (
  SELECT doc_id, words,
         UNNEST(generate_series(1, GREATEST(len(words) - 10, 1), 10)) AS start
  FROM w
)
"""


@register("text_chunk_sliding_window", oracle=_CHUNK_SQL, tags=("text",))
def text_chunk_sliding_window(spark, sf_dir):
    """Sliding-window document chunking for training pipelines: 20-word
    chunks, stride 10 (50% overlap), ragged tail kept. Pure expression
    work — split once, generate the start offsets as an array, explode,
    slice — so chunking runs scan-speed with no UDF and no shuffle; the
    chunk explosion is the only row growth (~n/10 chunks per doc),
    which downstream tokenize/pack stages stream through."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(F.col("words"))
    # upper bound n-10 (not n-19): the last start must reach >= n-19 on
    # the stride-10 grid or the tail words of a (n-20)%10 != 0 doc
    # would never land in any chunk — silent data loss
    starts = F.sequence(F.lit(1), F.greatest(n - 10, F.lit(1)), F.lit(10))
    chunk = F.slice(F.col("words"), F.col("start").cast("int"), 20)
    return (
        d.select("doc_id", words.alias("words"))
        .select("doc_id", "words", F.explode(starts.cast("array<bigint>")).alias("start"))
        .select(
            "doc_id",
            "start",
            F.expr("(start - 1) div 10").alias("chunk_ord"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("bigint").alias("n_tokens"),
        )
    )


_REPEAT_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents
),
grams AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, GREATEST(len(words) - 2, 1)),
                i -> array_to_string(words[CAST(i AS INT):CAST(i AS INT)+2], ' '))) AS g
  FROM w
)
SELECT doc_id,
       COUNT(*) AS n_grams,
       COUNT(DISTINCT g) AS n_distinct,
       1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS repetition_ratio
FROM grams GROUP BY doc_id
"""


@register("text_repetition_ratio", oracle=_REPEAT_SQL, tags=("text",))
def text_repetition_ratio(spark, sf_dir):
    """Within-document 3-gram repetition ratio (1 - distinct/total) —
    the Gopher-style quality rule that drops boilerplate-heavy or
    looping documents before training. Same shingle expression pipeline
    as dedup (split → sequence → transform → explode), one hash agg
    keyed by doc with a distinct count inside; everything partial-
    aggregates map-side because the explode keeps doc rows together."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(F.col("words"))
    starts = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(F.col("words"), i, 3), " "))
    return (
        d.select("doc_id", words.alias("words"))
        .select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_distinct("g").alias("n_distinct"),
            (
                F.lit(1.0)
                - F.count_distinct("g").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("repetition_ratio"),
        )
    )


_BUCKET_BATCH_SQL = """
WITH tok AS (
  SELECT doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens,
         n_tokens // 64 AS bucket,
         (n_tokens // 64 + 1) * 64 AS bucket_cap
  FROM tok
)
SELECT bucket, bucket_cap,
       COUNT(*) AS n_docs,
       SUM(n_tokens) AS sum_tokens,
       (COUNT(*) + 31) // 32 AS n_batches,
       COUNT(*) * bucket_cap - SUM(n_tokens) AS pad_waste_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) * bucket_cap AS DOUBLE) AS utilization
FROM b GROUP BY bucket, bucket_cap
"""


@register("text_length_bucket_batching", oracle=_BUCKET_BATCH_SQL, tags=("text",))
def text_length_bucket_batching(spark, sf_dir):
    """Length-bucketed batch packing audit: assign each document to a
    64-token length bucket (the padding target), then report per-bucket
    batch count (batch=32), padding waste, and utilization — the
    distributed alternative to greedy sequence packing (which is
    inherently sequential): bucketing is a pure narrow expression, the
    stats one hash agg, and the utilization numbers tell you whether a
    finer bucket grid is worth it before you ever tokenize for real."""
    d = t(spark, sf_dir, "documents")
    n = token_count(F.col("text")).cast("bigint")
    b = d.select(
        "doc_id",
        n.alias("n_tokens"),
        (n / 64).cast("bigint").alias("bucket"),
        (((n / 64).cast("bigint") + 1) * 64).alias("bucket_cap"),
    )
    return b.groupBy("bucket", "bucket_cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        ((F.count(F.lit(1)) + 31) / 32).cast("bigint").alias("n_batches"),
        (F.count(F.lit(1)) * F.first("bucket_cap") - F.sum("n_tokens")).alias(
            "pad_waste_tokens"
        ),
        (
            F.sum("n_tokens").cast("double")
            / (F.count(F.lit(1)) * F.first("bucket_cap")).cast("double")
        ).alias("utilization"),
    )


def _corpus_pipeline_sql() -> str:
    from etlalchemy_spark.queries.sampling import _bucket_sql

    b = _bucket_sql("doc_id", "sp:")
    return f"""
WITH tok AS (
  SELECT doc_id, text,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
  FROM documents
),
rep AS (
  SELECT doc_id,
         1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rep_ratio
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(generate_series(1, GREATEST(len(words) - 2, 1)),
                  i -> array_to_string(words[CAST(i AS INT):CAST(i AS INT)+2], ' '))) AS g
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents)
  ) GROUP BY doc_id
),
q AS (
  SELECT t.doc_id, t.text
  FROM tok t JOIN rep r ON t.doc_id = r.doc_id
  WHERE t.n_tokens >= 10 AND r.rep_ratio < 0.5
),
d AS (
  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
),
s AS (
  SELECT doc_id,
         CASE WHEN {b} < 800000 THEN 'split_train'
              WHEN {b} < 900000 THEN 'split_val'
              ELSE 'split_test' END AS split
  FROM d
)
SELECT 'raw' AS stage, COUNT(*) AS n_docs FROM documents
UNION ALL SELECT 'quality', COUNT(*) FROM q
UNION ALL SELECT 'exact_dedup', COUNT(*) FROM d
UNION ALL SELECT split, COUNT(*) FROM s GROUP BY split
"""


@register("text_corpus_clean_pipeline", oracle=_corpus_pipeline_sql(), tags=("text", "dedup", "sampling"))
def text_corpus_clean_pipeline(spark, sf_dir):
    """End-to-end corpus cleaning audit — the composition the engine
    exists for: quality gate (min length + trigram repetition) → exact
    content dedup (md5 groupBy, keep lowest id) → deterministic
    train/val/test split, reporting survivors per stage. Every stage is
    the already-oracle-proven operator (quality_features shape,
    dedup_exact, hash_bucket split) composed in ONE lazy plan: the
    corpus is scanned once for tokens and once for shingles, dedup
    shuffles a 32-byte hash, the split is a pure function of doc_id —
    no stage materializes or collects anything."""
    from etlalchemy_spark.operators.sampling import hash_bucket
    from etlalchemy_spark.operators.text import md5_fingerprint, token_count

    docs = t(spark, sf_dir, "documents")
    # raw (non-distinct) trigrams: word_shingles dedups, repetition needs totals
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(F.col("words"))
    starts = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(F.col("words"), i, 3), " "))
    rep = (
        docs.select("doc_id", words.alias("words"))
        .select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id")
        .agg(
            (
                F.lit(1.0)
                - F.count_distinct("g").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("rep_ratio")
        )
    )
    tok = docs.select("doc_id", "text", token_count(F.col("text")).alias("n_tokens"))
    q = (
        tok.join(rep, "doc_id")
        .where((F.col("n_tokens") >= 10) & (F.col("rep_ratio") < 0.5))
        .select("doc_id", "text")
    )
    d = q.groupBy(md5_fingerprint(F.col("text"))).agg(F.min("doc_id").alias("doc_id"))
    bkt = hash_bucket(F.col("doc_id"), salt="sp:")
    s = d.select(
        F.when(bkt < 800000, "split_train")
        .when(bkt < 900000, "split_val")
        .otherwise("split_test")
        .alias("split")
    )
    cnt = F.count(F.lit(1)).alias("n_docs")
    return (
        docs.agg(F.lit("raw").alias("stage"), cnt)
        .unionByName(q.agg(F.lit("quality").alias("stage"), cnt))
        .unionByName(d.agg(F.lit("exact_dedup").alias("stage"), cnt))
        .unionByName(s.groupBy(F.col("split").alias("stage")).agg(cnt))
    )


_OOV_SQL = """
WITH w AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
),
freq AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
vocab AS (SELECT word FROM freq ORDER BY n DESC, word LIMIT 20)
SELECT doc_id,
       COUNT(*) AS n_words,
       COUNT(CASE WHEN v.word IS NULL THEN 1 END) AS n_oov,
       CAST(COUNT(CASE WHEN v.word IS NULL THEN 1 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM w LEFT JOIN vocab v ON w.word = v.word
GROUP BY doc_id
"""


@register("text_oov_rate", oracle=_OOV_SQL, tags=("text",))
def text_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per document against the corpus top-20
    vocabulary (frequency-ranked, ties alphabetical): the vocabulary-
    coverage filter in tokenizer training. The vocab is a top-k over
    the word-frequency aggregate (TakeOrderedAndProject, k rows) and
    broadcasts into a left join against the exploded words — the
    corpus explode is the only big intermediate, touched once, and the
    per-doc aggregate reuses its partitioning."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    freq = w.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.orderBy(F.col("n").desc(), "word")
        .limit(20)
        .select(F.col("word").alias("vword"))
    )
    oov = F.count(F.when(F.col("vword").isNull(), 1)).alias("n_oov")
    return (
        w.join(F.broadcast(vocab), w.word == F.col("vword"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            oov,
            (
                F.count(F.when(F.col("vword").isNull(), 1)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("oov_rate"),
        )
    )


# --- concat-then-chunk packing (pretraining data prep) -----------------------

from etlalchemy_spark.queries.sampling import _bucket_sql  # noqa: E402

_PACK_W = 2048

_PACK_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         COALESCE(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END, 0) AS n_tok,
         {_bucket_sql("doc_id", "pack:")} AS h
  FROM documents
), pref AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM tok
)
SELECT doc_id, n_tok, start_offset,
       start_offset // {_PACK_W} AS window_id,
       start_offset % {_PACK_W} AS within_offset
FROM pref
"""


@register("text_concat_chunk_packing", oracle=_PACK_SQL, tags=("text", "scale"))
def text_concat_chunk_packing(spark, sf_dir):
    """Concat-then-chunk packing — the canonical pretraining data-prep
    step: documents are laid head-to-tail in a DETERMINISTIC shuffled
    order (portable md5 hash of doc_id, reproducible in any engine and
    on any cluster), each gets its global token offset in the
    concatenated stream, and from the offset the context window that
    contains its first token (window_id = offset div W, W=2048) plus
    the position inside it. The global offset is an exclusive prefix
    sum over the shuffle order computed with the range-bucketed
    two-phase decomposition (operators/prefix.py) — per-bucket local
    window + broadcast bucket offsets, no single-partition WindowExec,
    so the layout step scales to a 100 TB corpus. Oracle: the serial
    SUM ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING formulation."""
    from etlalchemy_spark.operators.prefix import running_global_sum
    from etlalchemy_spark.operators.sampling import hash_bucket
    from etlalchemy_spark.operators.text import token_count

    # NULL text packs as 0 tokens (token_count returns NULL for NULL
    # input, which would poison the prefix sum and diverge from the
    # oracle's NULL-skipping window SUM)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(token_count(F.col("text")), F.lit(0)).cast("bigint").alias("n_tok"),
        hash_bucket(F.col("doc_id"), salt="pack:").alias("h"),
    )
    run = running_global_sum(
        docs, F.col("h"), ["doc_id"], F.col("n_tok"), alias="_run", n_buckets=16
    )
    out = run.withColumn(
        "start_offset", (F.col("_run") - F.col("n_tok")).cast("bigint")
    )
    return out.select(
        "doc_id",
        "n_tok",
        "start_offset",
        F.expr(f"start_offset div {_PACK_W}").alias("window_id"),
        (F.col("start_offset") % _PACK_W).alias("within_offset"),
    )


# --- benchmark decontamination (train-vs-eval n-gram overlap) ---------------

_DECONTAM_SQL = f"""
WITH tr AS (
  SELECT doc_id, text
  FROM documents WHERE {_bucket_sql("doc_id", "sp:")} < 800000
), te AS (
  SELECT doc_id, text
  FROM documents WHERE {_bucket_sql("doc_id", "sp:")} >= 900000
), {shingle_ctes(5, relation="tr", words_cte="wtr", sh_cte="shtr")},
{shingle_ctes(5, relation="te", words_cte="wte", sh_cte="shte_full")},
shte AS (
  SELECT DISTINCT shingle FROM shte_full
)
SELECT a.doc_id,
       COUNT(*) AS n_shingles,
       COUNT(b.shingle) AS n_contaminated,
       CAST(COUNT(b.shingle) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS contamination_ratio
FROM shtr a LEFT JOIN shte b USING (shingle)
GROUP BY a.doc_id
HAVING COUNT(b.shingle) > 0
"""


@register("text_decontamination", oracle=_DECONTAM_SQL, tags=("text", "dedup"))
def text_decontamination(spark, sf_dir):
    """Benchmark decontamination — flag training documents sharing any
    word 5-gram with the held-out eval split (the n-gram-overlap scrub
    every pretraining pipeline runs before training). The splits reuse
    the content-addressed ``sp:`` hash of ``sample_train_test_split``
    (train = bucket < 80%, eval = the 10% test tail), so membership is
    a pure function of the row on any engine. Scale shape: the eval
    side is tiny at any corpus size (benchmarks are thousands of docs,
    the corpus is billions), so its distinct shingle set BROADCASTS;
    the train corpus is shingled narrowly and the only shuffle is the
    per-doc count aggregate — no corpus-vs-corpus join anywhere."""
    from etlalchemy_spark.operators.dedup import spread, word_shingles
    from etlalchemy_spark.operators.sampling import hash_bucket

    d = spread(t(spark, sf_dir, "documents"), "doc_id")
    b = hash_bucket(F.col("doc_id"), salt="sp:")
    train = d.where(b < 800000)
    test = d.where(b >= 900000)
    tr_sh = word_shingles(train, "doc_id", "text", k=5)
    te_sh = (
        word_shingles(test, "doc_id", "text", k=5)
        .select(F.col("shingle").alias("te_shingle"))
        .distinct()
    )
    flagged = tr_sh.join(
        F.broadcast(te_sh), tr_sh.shingle == F.col("te_shingle"), "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("te_shingle").alias("n_contaminated"),
            (
                F.count("te_shingle").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("contamination_ratio"),
        )
        .where(F.col("n_contaminated") > 0)
    )


# --- BM25 retrieval scoring --------------------------------------------------

_BM25_TERMS = ("vector", "stream", "window", "merge", "filter")

_BM25_CASES = "\n         + ".join(
    f"COALESCE(MAX(CASE WHEN term = '{term}' THEN s END), 0.0)"
    for term in _BM25_TERMS
)

_BM25_SQL = f"""
WITH dl AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS BIGINT) AS dl
  FROM documents
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         COUNT(*) AS n_docs
  FROM dl
), toks AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM documents
  ) WHERE t IN {_BM25_TERMS!r}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term,
         ((CAST(stats.n_docs - dfreq.df AS DOUBLE) + 0.5)
            / (CAST(dfreq.df AS DOUBLE) + 0.5))
         * ((CAST(tf.tf AS DOUBLE) * 2.2)
            / (CAST(tf.tf AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
), per_doc AS (
  SELECT doc_id,
         {_BM25_CASES} AS score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, score FROM per_doc ORDER BY score DESC, doc_id LIMIT 20
"""


@register("text_bm25_search", oracle=_BM25_SQL, tags=("text", "similarity"))
def text_bm25_search(spark, sf_dir):
    """BM25 top-20 retrieval over the corpus for a fixed 5-term query
    (k1=1.2, b=0.75) — the standard lexical ranking next to
    ``text_tfidf_topterms``'s per-doc characteristic terms. Like tfidf,
    the idf keeps the RATIONAL core (N-df+0.5)/(df+0.5) instead of its
    log: log() rounding is libm-specific while a division is correctly
    rounded everywhere — same ranking, hash-exact scores. The per-doc
    sum over query terms is a fixed-order chain of per-term MAX slots
    (COALESCE(...,0) + ...), so the double addition order is identical
    in both engines regardless of row order. Scale shape: tokens are
    filtered to the 5 query terms BEFORE any shuffle, so the tf/df
    aggregates touch a sliver of the corpus; the per-doc length pass is
    a narrow expression (no explode); corpus stats and df broadcast;
    the top-20 is a TakeOrderedAndProject, never a global sort."""
    # spread: both corpus passes (token explode+filter, per-doc length)
    # are map-bound over the single-row-group scan — each measured
    # ~750 ms on one core in the r13 RRF node profile
    d = _spread_docs(spark, sf_dir)
    words = F.split(F.lower("text"), "[^a-z]+")
    base = d.select(
        "doc_id",
        F.size(F.filter(words, lambda x: x != "")).cast("bigint").alias("dl"),
        F.explode(words).alias("term"),
    ).where(F.col("term").isin(*_BM25_TERMS))
    dl = d.select(
        "doc_id",
        F.size(F.filter(words, lambda x: x != "")).cast("bigint").alias("dl"),
    )
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = base.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
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
                    (F.col("tf").cast("double") * F.lit(2.2))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(1.2)
                        * (
                            F.lit(0.25)
                            + F.lit(0.75)
                            * (F.col("dl").cast("double") / F.col("avgdl"))
                        )
                    )
                )
            ).alias("s"),
        )
    )
    slots = [
        F.coalesce(
            F.max(F.when(F.col("term") == term, F.col("s"))), F.lit(0.0)
        )
        for term in _BM25_TERMS
    ]
    score = slots[0]
    for extra in slots[1:]:
        score = score + extra
    return (
        scored.groupBy("doc_id")
        .agg(score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# --- corpus snapshot diff (dataset versioning) ------------------------------

_SNAPDIFF_SQL = f"""
WITH v1 AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents WHERE {_bucket_sql("doc_id", "add:")} >= 50000
), v2 AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(
           CASE WHEN {_bucket_sql("doc_id", "rev:")} < 100000
                THEN text || ' rev2' ELSE text END)), '\\s+', ' ', 'g')) AS fp
  FROM documents WHERE {_bucket_sql("doc_id", "rm:")} >= 50000
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.fp <> b.fp
"""


@register("text_corpus_snapshot_diff", oracle=_SNAPDIFF_SQL, tags=("text", "etl"))
def text_corpus_snapshot_diff(spark, sf_dir):
    """Corpus snapshot diff — the dataset-versioning op between two
    corpus versions: added / removed / changed doc ids by whole-content
    fingerprint compare (changed = present in both, normalized-md5
    differs). The versions are simulated deterministically from the one
    fixture corpus (content-addressed hash slices: 5% absent from v1 =
    'added', 5% dropped from v2 = 'removed', 10% of v2 revised =
    'changed'), so the query is reproducible on any engine. Scale
    shape: each side reduces to (doc_id, 16-byte fp) narrowly before
    the single full-outer equi-join on doc_id — the join payload is
    fingerprints, never document bodies, and unchanged docs (the
    overwhelming majority between real snapshots) are filtered by the
    fp compare without leaving the join stage."""
    from etlalchemy_spark.operators.sampling import hash_bucket
    from etlalchemy_spark.operators.text import md5_fingerprint

    d = t(spark, sf_dir, "documents")
    v1 = d.where(hash_bucket(F.col("doc_id"), "add:") >= 50000).select(
        F.col("doc_id").alias("id1"), md5_fingerprint(F.col("text")).alias("fp1")
    )
    rev = F.when(
        hash_bucket(F.col("doc_id"), "rev:") < 100000,
        F.concat(F.col("text"), F.lit(" rev2")),
    ).otherwise(F.col("text"))
    v2 = d.where(hash_bucket(F.col("doc_id"), "rm:") >= 50000).select(
        F.col("doc_id").alias("id2"), md5_fingerprint(rev).alias("fp2")
    )
    j = v1.join(v2, v1.id1 == v2.id2, "full_outer")
    status = (
        F.when(F.col("id1").isNull(), "added")
        .when(F.col("id2").isNull(), "removed")
        .otherwise("changed")
    )
    return (
        j.where(
            F.col("id1").isNull()
            | F.col("id2").isNull()
            | (F.col("fp1") != F.col("fp2"))
        )
        .select(
            F.coalesce(F.col("id1"), F.col("id2")).alias("doc_id"),
            status.alias("status"),
        )
    )


_CHARGRAM_SQL = """
WITH tg AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, GREATEST(length(lower(text)) - 2, 0)),
                i -> substr(lower(text), CAST(i AS INT), 3))) AS g
  FROM documents
),
vocab AS (
  SELECT g, COUNT(*) AS c FROM tg GROUP BY g
)
SELECT t.doc_id,
       COUNT(*) AS n_trigrams,
       CAST(SUM(v.c) AS BIGINT) AS sum_freq,
       CAST(SUM(v.c) AS DOUBLE) / COUNT(*) AS mean_freq
FROM tg t JOIN vocab v ON t.g = v.g
GROUP BY t.doc_id
"""


@register("text_chargram_quality", oracle=_CHARGRAM_SQL, tags=("text",))
def text_chargram_quality(spark, sf_dir):
    """Character-trigram frequency quality score — the integer-exact
    cousin of a KenLM perplexity filter: each document's character
    trigrams are scored by their CORPUS frequency and averaged; docs
    whose mean trigram frequency sits far below the corpus norm are
    gibberish/mojibake candidates, far above are boilerplate. Two
    corpus passes: (1) trigram counts, (2) per-doc frequency sums —
    and the join between them BROADCASTS at any corpus size, because
    the trigram vocabulary is bounded by charset³, not by data volume
    (the property that makes this filter 100 TB-practical where a
    word-level LM vocab would shuffle). Integer count sums keep it
    oracle-exact; only the final mean divides in double."""
    d = _spread_docs(spark, sf_dir)  # trigram explode is map-bound
    low = F.lower(F.col("text"))
    # guard: Spark's sequence(1, 0) REVERSES (step defaults to -1)
    # instead of yielding empty like DuckDB's generate_series — a
    # <3-char doc must contribute zero trigrams on both engines
    grams = F.when(
        F.length(low) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(low) - 2),
            lambda i: F.substring(low, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tg = d.select("doc_id", F.explode(grams).alias("g"))
    vocab = tg.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    return (
        tg.join(F.broadcast(vocab), "g")  # charset^3-bounded build side
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("c").cast("bigint").alias("sum_freq"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias("mean_freq"),
        )
    )


_HEALTH_SQL = """
WITH fp AS (
  SELECT doc_id, lang, n_chars, text,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_fp
  FROM documents
), dup AS (
  SELECT content_fp, COUNT(*) AS n_copies FROM fp GROUP BY content_fp
), flagged AS (
  SELECT f.doc_id, f.lang, f.n_chars,
         CASE WHEN f.n_chars < 100 THEN 1 ELSE 0 END AS is_short,
         CASE WHEN length(regexp_replace(f.text, '[a-zA-Z0-9\\s]', '', 'g')) * 5
                   > length(f.text) THEN 1 ELSE 0 END AS is_punct_heavy,
         CASE WHEN d.n_copies > 1 THEN 1 ELSE 0 END AS is_dup
  FROM fp f JOIN dup d ON f.content_fp = d.content_fp
)
SELECT
  COUNT(*) AS n_docs,
  CAST(SUM(is_short) AS BIGINT) AS n_short,
  CAST(SUM(is_punct_heavy) AS BIGINT) AS n_punct_heavy,
  CAST(SUM(is_dup) AS BIGINT) AS n_dup_member,
  COUNT(DISTINCT lang) AS n_langs,
  CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS total_chars
FROM flagged
"""


@register("text_corpus_health_report", oracle=_HEALTH_SQL, tags=("text",))
def text_corpus_health_report(spark, sf_dir):
    """One-row corpus health dashboard — the observability pass a
    100 TB ingest runs BEFORE committing a snapshot: doc count,
    too-short docs, punctuation-heavy docs (>20% non-alnum), docs
    that are members of an exact-duplicate group, language count, and
    total characters. Doc-level flags are pure column expressions; the
    only shuffle is the content-fingerprint dup count (hash aggregate)
    joined back — same shape at any corpus size, final reduce is one
    partial+final aggregate to a single row. Every threshold is an
    integer comparison on integer counts, so the report is
    oracle-exact, not approximately right."""
    from etlalchemy_spark.operators.text import md5_fingerprint

    d = t(spark, sf_dir, "documents")
    # per-doc flags computed BEFORE the dup-count join: Catalyst prunes
    # columns but does not push computed expressions below joins, so
    # flagging after the join would shuffle every document's raw text
    # for the fingerprint equi-join; flagged-first, the join payload is
    # (fp, lang, n_chars, two ints) per doc (r7 review finding)
    fp = d.select(
        "lang",
        "n_chars",
        md5_fingerprint(F.col("text")).alias("content_fp"),
        F.when(F.col("n_chars") < 100, 1).otherwise(0).alias("is_short"),
        F.when(
            F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", "")) * 5
            > F.length(F.col("text")),
            1,
        )
        .otherwise(0)
        .alias("is_punct_heavy"),
    )
    dup = fp.groupBy("content_fp").agg(F.count(F.lit(1)).alias("n_copies"))
    flagged = fp.join(dup, "content_fp").select(
        "lang",
        "n_chars",
        "is_short",
        "is_punct_heavy",
        F.when(F.col("n_copies") > 1, 1).otherwise(0).alias("is_dup"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_short").cast("bigint").alias("n_short"),
        F.sum("is_punct_heavy").cast("bigint").alias("n_punct_heavy"),
        F.sum("is_dup").cast("bigint").alias("n_dup_member"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("bigint").alias("total_chars"),
    )


# --- tokenizer vocabulary build (frequency rank + cumulative coverage) -------

_VOCAB_COVERAGE_SQL = r"""
WITH w AS (
  SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents
),
freq AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
tot AS (SELECT SUM(n) AS total FROM freq),
ranked AS (
  SELECT word, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk,
         SUM(n) OVER (ORDER BY n DESC, word
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM freq
)
SELECT word,
       n AS n_occurrences,
       CAST(rnk AS BIGINT) AS rank,
       CAST(cum AS BIGINT) AS cum_occurrences,
       CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
FROM ranked CROSS JOIN tot
WHERE rnk <= 200
"""


@register("text_vocab_coverage", oracle=_VOCAB_COVERAGE_SQL, tags=("text", "window", "scale"))
def text_vocab_coverage(spark, sf_dir):
    """Tokenizer-vocabulary construction: the corpus word-frequency
    table ranked by (count DESC, word), with each candidate's
    CUMULATIVE token coverage — the curve vocab-size decisions are read
    off of ('how many entries cover 95% of tokens'). The oracle is one
    global ORDER BY window; at 100 TB the vocabulary itself is
    millions of rows, so the rank and running sum are the FUSED
    range-bucketed two-phase prefix (prefix.ranks_and_running_sum —
    one bounds pass, one stats pass, one window; native-key ordering,
    no single-partition WindowExec anywhere), and only then is the
    curve cut to the top 200. The frequency aggregate — whose upstream
    is the corpus tokenization, the dominant cost — is lazily
    localCheckpointed so the prefix machinery's internal passes reuse
    it instead of re-tokenizing the corpus (r8 review). Coverage
    divides two exact longs in DOUBLE (both < 2^53: exact conversion +
    one correctly-rounded IEEE divide, bit-identical across
    engines)."""
    from etlalchemy_spark.operators.prefix import ranks_and_running_sum

    d = t(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
    freq = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    cum = ranks_and_running_sum(freq, -F.col("n"), ["word"], F.col("n"), alias="cum")
    total = freq.agg(F.sum("n").alias("total"))
    return (
        cum.where(F.col("rn") <= 200)
        .crossJoin(F.broadcast(total))
        .select(
            "word",
            F.col("n").alias("n_occurrences"),
            F.col("rn").cast("bigint").alias("rank"),
            F.col("cum").cast("bigint").alias("cum_occurrences"),
            (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
                "coverage"
            ),
        )
    )


_PASSAGE_K = 6

_PASSAGE_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents
), pos AS (
  SELECT doc_id,
         UNNEST(generate_series(1, GREATEST(len(words) - {_PASSAGE_K - 1}, 0))) AS pos,
         UNNEST(list_transform(
           generate_series(1, GREATEST(len(words) - {_PASSAGE_K - 1}, 0)),
           i -> array_to_string(words[CAST(i AS INT):CAST(i AS INT)+{_PASSAGE_K - 1}], ' ')
         )) AS shingle
  FROM w
), dup AS (
  SELECT shingle FROM pos GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
), cov AS (
  SELECT doc_id, COUNT(DISTINCT p) AS covered
  FROM (
    SELECT pos.doc_id, UNNEST(generate_series(pos.pos, pos.pos + {_PASSAGE_K - 1})) AS p
    FROM pos SEMI JOIN dup ON pos.shingle = dup.shingle
  )
  GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.words) AS BIGINT) AS n_words,
       CAST(COALESCE(cov.covered, 0) AS BIGINT) AS dup_covered,
       CAST(COALESCE(cov.covered, 0) AS DOUBLE)
         / CAST(GREATEST(len(w.words), 1) AS DOUBLE) AS dup_fraction
FROM w LEFT JOIN cov ON w.doc_id = cov.doc_id
"""


def _spread_docs(spark, sf_dir):
    """documents, round-robin repartitioned to full parallelism before
    a map-heavy stage: the gate-scale table is ONE parquet partition,
    so everything upstream of the first shuffle (positional-shingle
    explodes, the unrolled BPE longest-match) otherwise runs on a
    single core (r13 finding, the multimodal _spread_docs twin). Used
    only by queries whose map stage measurably dominates. r14:
    footer-guarded via catalog.load_table_spread — the exchange exists
    only when the scan is actually under-split."""
    from etlalchemy_spark.catalog import load_table_spread

    return load_table_spread(spark, sf_dir, "documents")


@register("text_duplicate_passage_spans", oracle=_PASSAGE_SQL, tags=("text", "dedup", "bench"))
def text_duplicate_passage_spans(spark, sf_dir):
    """Substring-level duplication audit (the exact-substring signal
    behind suffix-array training-data dedup, reduced to its scalable
    core): every positional word {k}-gram that appears in MORE THAN
    ONE document marks its span [i, i+k-1] as duplicated; a document's
    dup_fraction is the share of its word positions covered by any
    such span. Distributed shape: one positional-shingle explode (a
    narrow (doc_id, pos, shingle-hash) stream — bodies never shuffle),
    one hash-agg to find cross-doc shingles, one semi-join back, and a
    distinct-position count — never a doc-by-doc suffix comparison.
    Downstream, rows with high dup_fraction are the cut candidates
    (boilerplate, mirrored pages, licence blocks). Cross-engine exact:
    positions and counts are pure integers; the one division is a
    single IEEE op.""".replace("{k}", str(_PASSAGE_K))
    k = _PASSAGE_K
    docs = _spread_docs(spark, sf_dir)
    words = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )
    n_pos = F.greatest(F.size("words") - (k - 1), F.lit(0))
    from etlalchemy_spark.operators.dedup import md5_prefix60

    pos = (
        words.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n_pos),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice("words", i, k)).alias("shingle"),
                    ),
                )
            ).alias("e"),
        )
        # only the 60-bit portable hash ever shuffles — shingle TEXT
        # stays inside the scan stage. A cross-shingle hash collision
        # could mark a span duplicated spuriously (~n^2/2^61: absent at
        # fixture scale, audit-grade noise at 100 TB — the standard
        # hashed-substring-dedup tradeoff).
        .select("doc_id", "e.pos", md5_prefix60(F.col("e.shingle")).alias("sh_h"))
    )
    dup = (
        pos.groupBy("sh_h")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("sh_h")
    )
    cov = (
        pos.join(dup, "sh_h", "left_semi")
        .select("doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("p"))
        .groupBy("doc_id")
        .agg(F.count_distinct("p").alias("covered"))
    )
    return (
        words.select("doc_id", F.size("words").cast("bigint").alias("n_words"))
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce(F.col("covered"), F.lit(0)).cast("bigint").alias("dup_covered"),
            (
                F.coalesce(F.col("covered"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_words"), F.lit(1)).cast("double")
            ).alias("dup_fraction"),
        )
    )


_QNORM_SQL = f"""
WITH q AS ({_QUALITY_SQL}),
j AS (
  SELECT q.doc_id, d.source, q.quality FROM q JOIN documents d ON q.doc_id = d.doc_id
), r AS (
  SELECT doc_id, source, quality,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality, doc_id) AS src_rn,
         COUNT(*) OVER (PARTITION BY source) AS src_n,
         ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS g_rn,
         COUNT(*) OVER () AS g_n
  FROM j
)
SELECT doc_id, source, quality,
       CAST(LEAST(9, ((src_rn - 1) * 10) // GREATEST(src_n - 1, 1)) AS INTEGER) AS src_decile,
       CAST(LEAST(9, ((g_rn - 1) * 10) // GREATEST(g_n - 1, 1)) AS INTEGER) AS global_decile
FROM r
"""


@register("text_quality_quantile_norm", oracle=_QNORM_SQL, tags=("text",))
def text_quality_quantile_norm(spark, sf_dir):
    """Cross-source quality-score calibration: raw quality scores are
    not comparable across heterogeneous sources (a web crawl's p90 may
    be a curated corpus's p10), so mixture sampling uses the
    WITHIN-SOURCE quantile rank instead. Each document gets its decile
    within its source and globally — pure integer rank arithmetic
    (((rn-1)*10) // (n-1), clamped), no float percent_rank boundary
    hazards. The global rank runs on the range-bucketed two-phase
    prefix path (operators/prefix.global_ranks) — never a
    single-partition WindowExec — and the global count is a broadcast
    one-row aggregate; the per-source windows partition by source and
    scale as ordinary shuffles. Reuses the oracle-exact quality
    formula (operators.text.quality_score) as its input: one scoring
    scan, two window passes, zero joins of bodies."""
    from pyspark.sql import Window as W

    from etlalchemy_spark.operators.prefix import global_ranks

    docs = t(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    scored = docs.select(
        "doc_id", "source", quality_score(feats).alias("quality")
    )
    w_src = W.partitionBy("source").orderBy("quality", "doc_id")
    ranked = global_ranks(scored, F.col("quality"), ["doc_id"]).withColumnRenamed(
        "rn", "g_rn"
    )
    tot = scored.agg(F.count(F.lit(1)).alias("g_n"))
    r = ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "quality",
        F.row_number().over(w_src).alias("src_rn"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("src_n"),
        "g_rn",
        "g_n",
    )

    def decile(rn, n):
        return F.least(
            F.lit(9).cast("int"),
            F.floor(((F.col(rn) - 1) * 10) / F.greatest(F.col(n) - 1, F.lit(1))).cast(
                "int"
            ),
        )

    return r.select(
        "doc_id",
        "source",
        "quality",
        decile("src_rn", "src_n").alias("src_decile"),
        decile("g_rn", "g_n").alias("global_decile"),
    )


_NOVELTY_SQL = f"""
WITH {shingle_ctes(5)},
firstseen AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
), per_doc AS (
  SELECT sh.doc_id,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM sh JOIN firstseen fs ON sh.shingle = fs.shingle
  GROUP BY sh.doc_id
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_novel AS BIGINT) AS n_novel,
       CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS novelty
FROM per_doc
"""


@register("text_ngram_novelty", oracle=_NOVELTY_SQL, tags=("text", "dedup"))
def text_ngram_novelty(spark, sf_dir):
    """Corpus-order novelty score: a document's word 5-grams are
    'novel' iff no SMALLER doc_id contains them (doc_id as ingestion
    order), novelty = novel/total — the score incremental curation
    uses to decide whether a new batch still adds information, and the
    per-document contribution curve behind dataset-mixing decisions
    (near-zero novelty tail = mirrored/boilerplate mass). Shape: the
    shared shingle stream (operators/dedup.word_shingles — bodies
    never shuffle), one MIN aggregate for global first-seen, one
    equi-join back, one count aggregate. The MIN-per-shingle state is
    mergeable, so a standing novelty index updates per-batch without
    rescanning the corpus (same contract as the incremental dedup
    band store). Integer counts + one division: cross-engine exact."""
    from etlalchemy_spark.operators.dedup import word_shingles

    docs = _spread_docs(spark, sf_dir)  # shingle build is map-bound
    sh = word_shingles(docs, "doc_id", "text", k=5)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_novel").cast("bigint").alias("n_novel"),
        (F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")).alias(
            "novelty"
        ),
    )


# URL fixture: the documents table carries no URL column, so both
# engines synthesize the SAME deterministic raw URL per doc (scheme /
# www-prefix / TLD / tracking-query variety keyed off doc_id) — the
# operator under test is the HOST EXTRACTION + distribution audit, not
# the fixture. Shared text keeps the construction identical; the
# extraction is implemented independently (Spark parse_url vs DuckDB
# regexp), so a parse divergence fails the gate.
_URL_EXPR_SQL = """
  'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
   || source || '.'
   || CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
           WHEN 2 THEN 'net' ELSE 'io' END
   || '/d/' || CAST(doc_id AS VARCHAR)
   || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=crawl&ref=idx' ELSE '' END
"""

_DOMAIN_SQL = f"""
WITH urls AS (
  SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents
), hosts AS (
  SELECT doc_id,
         regexp_replace(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
                        '^www\\.', '') AS domain
  FROM urls
), per AS (
  SELECT domain, COUNT(*) AS n_docs FROM hosts GROUP BY domain
), tot AS (
  SELECT SUM(n_docs) AS n_total, COUNT(*) AS n_domains FROM per
)
SELECT per.domain,
       CAST(per.n_docs AS BIGINT) AS n_docs,
       CAST(per.n_docs AS DOUBLE) / CAST(tot.n_total AS DOUBLE) AS share,
       (2 * per.n_docs * tot.n_domains > 3 * tot.n_total) AS over_represented
FROM per, tot
"""


@register("text_domain_distribution", oracle=_DOMAIN_SQL, tags=("text",))
def text_domain_distribution(spark, sf_dir):
    """Source-domain distribution audit — the first chart every
    web-corpus curation run draws (C4 / RefinedWeb style): registrable
    domain per document (host parsed from the URL, leading ``www.``
    stripped), document count and corpus share per domain, and an
    over-representation flag (share > 1.5x the mean domain share,
    decided by EXACT integer cross-multiplication ``2*n*d > 3*N`` —
    no float threshold to drift). Shape: one narrow (doc_id, host)
    projection, ONE hash aggregate on domain, one broadcast of the
    one-row total — bodies never move, so the audit costs a single
    narrow shuffle at any corpus size. Host extraction uses Spark's
    native ``parse_url`` (JVM codegen) while the oracle parses with a
    regexp — independent implementations that must agree."""
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("."),
        F.when(F.col("doc_id") % 4 == 0, F.lit("com"))
        .when(F.col("doc_id") % 4 == 1, F.lit("org"))
        .when(F.col("doc_id") % 4 == 2, F.lit("net"))
        .otherwise(F.lit("io")),
        F.lit("/d/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?utm_source=crawl&ref=idx")).otherwise(
            F.lit("")
        ),
    )
    hosts = docs.select(
        F.regexp_replace(
            F.parse_url(url, F.lit("HOST")), F.lit("^www\\."), F.lit("")
        ).alias("domain")
    )
    per = hosts.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").alias("n_total"), F.count(F.lit(1)).alias("n_domains")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "domain",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        (F.col("n_docs").cast("double") / F.col("n_total").cast("double")).alias(
            "share"
        ),
        (2 * F.col("n_docs") * F.col("n_domains") > 3 * F.col("n_total")).alias(
            "over_represented"
        ),
    )


_COMMONNESS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(v.freq) AS BIGINT) AS freq_sum,
       CAST(SUM(v.freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_token_freq,
       CAST(SUM(CASE WHEN v.freq <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       CAST(SUM(CASE WHEN v.freq <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS rare_ratio
FROM toks t JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
"""


@register("text_unigram_commonness", oracle=_COMMONNESS_SQL, tags=("text", "bench"))
def text_unigram_commonness(spark, sf_dir):
    """Unigram-LM commonness scoring — the rational-arithmetic stand-in
    for perplexity-based quality filtering (log() is libm-specific, a
    ratio of exact longs is bit-identical): per document, the mean
    CORPUS frequency of its token occurrences and the share of tokens
    that are corpus-rare (global frequency <= 2). Low mean frequency +
    high rare ratio flags gibberish / OCR noise / wrong-language docs;
    high mean frequency flags boilerplate — the two tails a perplexity
    filter cuts. Shape: one narrow (doc_id, token) explode (bodies
    never shuffle), ONE vocabulary hash-agg, one equi-join on token,
    one per-doc re-agg — at 100 TB the vocabulary aggregate is the
    classic word-count and the join key is Zipf-skewed, which AQE's
    skew split handles (tests/test_skew.py proves the mechanism)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    per = (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").alias("freq_sum"),
            F.sum(F.when(F.col("freq") <= 2, 1).otherwise(0)).alias("n_rare"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("freq_sum").cast("bigint").alias("freq_sum"),
        (F.col("freq_sum").cast("double") / F.col("n_tokens").cast("double")).alias(
            "mean_token_freq"
        ),
        F.col("n_rare").cast("bigint").alias("n_rare"),
        (F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")).alias(
            "rare_ratio"
        ),
    )


_SRC_OVERLAP_SQL = """
WITH st AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
    FROM documents
  )
), sz AS (
  SELECT source, COUNT(*) AS n FROM st GROUP BY source
), ov AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT ov.src_a, ov.src_b,
       CAST(ov.inter AS BIGINT) AS intersection,
       CAST(na.n AS BIGINT) AS vocab_a,
       CAST(nb.n AS BIGINT) AS vocab_b,
       CAST(ov.inter AS DOUBLE)
         / CAST(na.n + nb.n - ov.inter AS DOUBLE) AS jaccard
FROM ov
JOIN sz na ON ov.src_a = na.source
JOIN sz nb ON ov.src_b = nb.source
"""


@register("text_source_vocab_overlap", oracle=_SRC_OVERLAP_SQL, tags=("text",))
def text_source_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary Jaccard between corpus sources — the
    mixing-matrix diagnostic behind dataset-composition decisions: two
    sources with near-1 overlap are redundant (keep the higher-quality
    one), near-0 overlap means a genuinely new domain (up-weight it).
    Shape: the (source, token) DISTINCT stream is the only thing
    derived from bodies (narrow — text never shuffles); pair counts
    come from ONE equi-join on token (never a source-cross-source
    scan: pairs materialize only where a token is shared, and the
    source< source orientation halves them); sizes join back
    broadcast-sized. Intersections and vocabulary sizes are exact
    longs, Jaccard one division — hash-exact. At 100 TB source count
    is small while tokens are Zipf-skewed: the token join is the AQE
    skew-split case proven in tests/test_skew.py."""
    docs = t(spark, sf_dir, "documents")
    st = docs.select(
        "source",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias(
            "tok"
        ),
    ).distinct()
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = st.select(F.col("source").alias("src_a"), "tok")
    b = st.select(F.col("source").alias("src_b"), "tok")
    ov = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sz.select(F.col("source").alias("src_a"), F.col("n").alias("vocab_a"))
    nb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("vocab_b"))
    return (
        ov.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("inter").cast("bigint").alias("intersection"),
            F.col("vocab_a").cast("bigint").alias("vocab_a"),
            F.col("vocab_b").cast("bigint").alias("vocab_b"),
            (
                F.col("inter").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


_KWIC_SQL = """
WITH arrs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS a FROM documents
), hits AS (
  SELECT doc_id,
         list_filter(
           list_transform(a, (x, i) ->
             CASE WHEN x = 'window'
                  THEN struct_pack(pos := i,
                       ctx := array_to_string(a[greatest(i - 2, 1):least(i + 2, len(a))], ' '))
             END),
           s -> s IS NOT NULL) AS hs
  FROM arrs
)
SELECT doc_id, CAST(h.pos AS BIGINT) AS pos, h.ctx AS context
FROM hits, UNNEST(hs) AS t(h)
"""


@register("text_kwic_concordance", oracle=_KWIC_SQL, tags=("text",))
def text_kwic_concordance(spark, sf_dir):
    """KWIC (keyword-in-context) concordance for a query term: every
    occurrence of 'window' with its +-2-token context — the
    eyeball-the-corpus tool behind tokenizer debugging, decontamination
    spot checks, and PII-pattern discovery (seeing the term IN CONTEXT
    is how you decide whether to filter it). Built entirely from
    HIGHER-ORDER array functions (transform-with-index + filter +
    slice) evaluated inside whole-stage codegen: the token array never
    explodes into per-(token, context) rows — contexts materialize
    only at match positions, so the operator ships |matches| narrow
    rows, not |tokens| wide ones. Positions are 1-based to match the
    oracle's list semantics; both engines run structurally identical
    lambda pipelines in their native engines."""
    docs = t(spark, sf_dir, "documents")
    arrs = docs.select(
        "doc_id", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("a")
    )
    hits = F.expr(
        """
        filter(
          transform(a, (x, i) ->
            CASE WHEN x = 'window' THEN
              struct(CAST(i + 1 AS BIGINT) AS pos,
                     array_join(slice(a, greatest(i - 1, 1),
                                      least(i + 3, size(a)) - greatest(i - 1, 1) + 1),
                                ' ') AS context)
            END),
          s -> s IS NOT NULL)
        """
    )
    return arrs.select("doc_id", F.explode(hits).alias("h")).select(
        "doc_id", F.col("h.pos").alias("pos"), F.col("h.context").alias("context")
    )


_READABILITY_SQL = """
WITH f AS (
  SELECT doc_id,
         GREATEST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END,
                  1) AS n_words,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS n_syllables
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       206.835
         - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         AS flesch_reading_ease,
       0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         - 15.59 AS fk_grade_level
FROM f
"""


@register("text_readability_score", oracle=_READABILITY_SQL, tags=("text",))
def text_readability_score(spark, sf_dir):
    """Flesch reading ease + Flesch-Kincaid grade level — the oldest
    and still most-used document quality/complexity features (corpus
    mixing recipes bucket by grade level; children's-content filters
    cut on reading ease). Syllables use the standard vowel-group
    heuristic (runs of [aeiouy]); words and sentences are regexp
    counts — all three are exact integers, and the two scores are one
    shared literal formula over their ratios, so both float columns
    hash-match. Floors at 1 keep empty/degenerate docs defined
    instead of dividing by zero (the ANSI trap scalar_try_arithmetic
    documents). Pure codegen expressions, no shuffle at all — the
    scoring pass is scan-bound at any corpus size."""
    docs = t(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    n_words = F.greatest(
        F.when(F.length(trimmed) == 0, 0).otherwise(
            F.size(F.split(trimmed, "\\s+"))
        ),
        F.lit(1),
    )
    n_sentences = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    n_syllables = F.greatest(
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")), F.lit(1)
    )
    f = docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sentences.cast("bigint").alias("n_sentences"),
        n_syllables.cast("bigint").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return f.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch_reading_ease"
        ),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias(
            "fk_grade_level"
        ),
    )


# --- BPE tokenizer: train + subword apply (r8 verdict #3) -------------------

_BPE_PAIRS_SQL = """
WITH docw AS (
  SELECT UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
  FROM documents
),
wc AS (
  SELECT substring(w, 1, 14) AS word, COUNT(*) AS cnt
  FROM docw WHERE w <> '' GROUP BY 1
),
pos AS (
  SELECT word, cnt, UNNEST(generate_series(1, length(word) - 1)) AS i
  FROM wc WHERE length(word) >= 2
)
SELECT substring(word, CAST(i AS INT), 1) AS left_sym,
       substring(word, CAST(i AS INT) + 1, 1) AS right_sym,
       CAST(SUM(cnt) AS BIGINT) AS pair_count
FROM pos
GROUP BY 1, 2
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 30
"""


@register("text_bpe_pair_counts", oracle=_BPE_PAIRS_SQL, tags=("text",))
def text_bpe_pair_counts(spark, sf_dir):
    """The distributed heart of BPE training (round 1): adjacent
    character-pair counts weighted by word frequency, top 30 with the
    trainer's deterministic ordering (count desc, then pair asc — the
    exact argmax `train_bpe` takes each round). The corpus shuffles
    only (word) then (2-char pair) keys; at 100 TB the pair table is
    alphabet²-sized. Exact twin anchoring the rows-only
    `text_bpe_train` (full merge loop)."""
    from etlalchemy_spark.operators.bpe import word_counts

    wc = word_counts(t(spark, sf_dir, "documents"), "text")
    pos = wc.where(F.length("word") >= 2).select(
        "word", "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
    )
    return (
        pos.select(
            F.expr("substring(word, i, 1)").alias("left_sym"),
            F.expr("substring(word, i + 1, 1)").alias("right_sym"),
            "cnt",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(30)
    )


@register("text_bpe_train", oracle=None, tags=("text", "iterative"))
def text_bpe_train(spark, sf_dir):
    """Full BPE merge training (rows-only; exact twin =
    `text_bpe_pair_counts`, and the trainer is pinned against an
    independent brute-force reference in tests/test_bpe.py): ONE
    distributed word-count pass, then 32 exact merge rounds on the
    top-512 word table (count desc, word asc — deterministic cap).
    The collected state is VOCABULARY-sized (512 rows — the cap IS
    the bound), the shape every production BPE trainer uses: at
    100 TB the corpus contributes one groupBy; the merge loop never
    sees it. Output is the learned merge table in rank order."""
    from etlalchemy_spark.operators.bpe import train_bpe, word_counts

    wc = word_counts(t(spark, sf_dir, "documents"), "text")
    top = wc.orderBy(F.desc("cnt"), "word").limit(512).collect()
    merges = train_bpe([(r["word"], r["cnt"]) for r in top], 32)
    return spark.createDataFrame(
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank int, left_sym string, right_sym string, merged string",
    )


# Pinned tokenizer snapshot: 32 merges trained once with `train_bpe`
# (top-512 words of the dev corpus). A FIXED vocabulary is the point —
# tokenization must be stable across corpora and rounds (retraining per
# input would silently re-segment every downstream token count), so
# both engines consume the same literal, the same discipline as the
# literal LSH hyperplanes.
_BPE_MERGES = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), ("d", "er"), ("or", "der"),
    ("or", "t"), ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"),
    ("ag", "g"), ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
]


def _bpe_tokenize_sql() -> str:
    from etlalchemy_spark.operators.bpe import bpe_vocab, tokenize_sql

    unroll = tokenize_sql(bpe_vocab(_BPE_MERGES), "words")
    return f"""
WITH docw AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
  FROM documents
),
occ AS (
  SELECT doc_id, substring(w, 1, 14) AS word FROM docw WHERE w <> ''
),
words AS (SELECT DISTINCT word FROM occ),
{unroll},
firstw AS (
  SELECT doc_id,
         substring(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '')[1], 1, 14) AS fw
  FROM documents
),
agg AS (
  SELECT o.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(b.n_tokens) AS BIGINT) AS n_tokens,
         CAST(SUM(length(o.word)) AS BIGINT) AS n_chars
  FROM occ o JOIN bpe_tok b USING (word)
  GROUP BY o.doc_id
)
SELECT a.doc_id, a.n_words, a.n_tokens,
       CAST(a.n_chars AS DOUBLE) / CAST(NULLIF(a.n_tokens, 0) AS DOUBLE)
         AS chars_per_token,
       ft.tokens AS first_word_tokens
FROM agg a
LEFT JOIN firstw f ON a.doc_id = f.doc_id
LEFT JOIN bpe_tok ft ON ft.word = f.fw
"""


@register("text_bpe_tokenize", oracle=_bpe_tokenize_sql(), tags=("text", "bench"))
def text_bpe_tokenize(spark, sf_dir):
    """Greedy longest-match subword tokenization against the pinned
    BPE vocabulary (single chars + 32 learned merges): per document,
    word count, total subword token count, chars-per-token compression
    ratio, and the first word's full segmentation (value-rich probe of
    the greedy path). The scalable shape: DISTINCT truncated words are
    tokenized (pure codegen — a 14-step unrolled longest-match, no
    UDF), then joined back to occurrences; tokenize cost tracks the
    corpus VOCABULARY, aggregation cost one (doc_id) shuffle. The
    same unroll spec generates the DuckDB twin chain
    (operators/bpe.py tokenize_sql — shingle_ctes discipline)."""
    from etlalchemy_spark.operators.bpe import (
        MAX_WORD_LEN,
        WORD_SPLIT_RE,
        bpe_vocab,
        tokenize_words,
    )

    # NOT _spread_docs: the heavy work (unrolled longest-match) runs on
    # DISTINCT words AFTER the distinct shuffle, which already spreads;
    # an upfront repartition measured 3.75 s vs 2.77 s plain (r13 A/B)
    docs = t(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), WORD_SPLIT_RE)).alias("w"),
        )
        .where(F.col("w") != "")
        .select("doc_id", F.substring("w", 1, MAX_WORD_LEN).alias("word"))
    )
    # the tokenizer subtree (distinct words -> 14-step unrolled match)
    # is referenced by BOTH consumers (per-doc agg join + first-word
    # join): cut it once so the match battery runs once, and pin the
    # broadcast the planner chose before the cut hid the size stats
    # (r13 optimization round). SCALE HAZARD (ADVICE r13): the
    # distinct-word frame grows with the corpus vocabulary, so at the
    # 100 TB target an unconditional broadcast hint can exceed the
    # driver/broadcast limit — there, drop the hint and let the
    # planner shuffle-join (or bound the vocabulary first); the hint
    # is kept because natural-language vocabularies cap around 1e6
    # short words (~tens of MB broadcast) while the benchmark corpus
    # is far below that.
    tok = tokenize_words(
        occ.select("word").distinct(), "word", bpe_vocab(_BPE_MERGES)
    ).localCheckpoint(eager=False)
    agg = (
        occ.join(F.broadcast(tok), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum(F.length("word")).alias("n_chars"),
        )
    )
    firstw = docs.select(
        "doc_id",
        F.substring(
            F.try_element_at(
                F.filter(
                    F.split(F.lower(F.col("text")), WORD_SPLIT_RE),
                    lambda x: x != F.lit(""),
                ),
                F.lit(1),
            ),
            1,
            MAX_WORD_LEN,
        ).alias("fw"),
    )
    ft = tok.select(F.col("word").alias("fw"), F.col("tokens").alias("first_word_tokens"))
    return (
        agg.join(firstw, "doc_id", "left")
        .join(F.broadcast(ft), "fw", "left")
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.try_divide(
                F.col("n_chars").cast("double"), F.col("n_tokens").cast("double")
            ).alias("chars_per_token"),
            "first_word_tokens",
        )
    )


# --- Tokenizer fertility audit (r9) --------------------------------------------


def _bpe_fertility_sql() -> str:
    from etlalchemy_spark.operators.bpe import bpe_vocab, tokenize_sql

    unroll = tokenize_sql(bpe_vocab(_BPE_MERGES), "words")
    return f"""
WITH docw AS (
  SELECT doc_id, lang, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
  FROM documents
),
occ AS (
  SELECT doc_id, lang, substring(w, 1, 14) AS word FROM docw WHERE w <> ''
),
words AS (SELECT DISTINCT word FROM occ),
{unroll}
SELECT o.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(b.n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(length(o.word)) AS BIGINT) AS n_chars,
       CAST(SUM(b.n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility,
       CAST(SUM(length(o.word)) AS DOUBLE) / CAST(SUM(b.n_tokens) AS DOUBLE)
         AS chars_per_token,
       CAST(SUM(CASE WHEN b.n_tokens >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS frac_fragmented
FROM occ o JOIN bpe_tok b USING (word)
GROUP BY o.lang
"""


@register("text_bpe_fertility", oracle=_bpe_fertility_sql(), tags=("text",))
def text_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit per language — the metric that decides
    whether a tokenizer is fair to a language mix (fertility =
    subword tokens per word; high fertility means the language pays
    more sequence length per word, skewing both cost and effective
    context): the pinned BPE vocabulary tokenizes the DISTINCT
    truncated vocabulary once (pure-codegen unrolled longest-match, no
    UDF), joins back to occurrences, and aggregates tokens/words/chars
    per lang plus the fragmented-word share (≥3 subwords ≈ the
    continuation-heavy tail). Exact integer sums close in single
    divisions, so all three ratios hash-match. Same scale shape as
    text_bpe_tokenize: tokenize cost tracks vocabulary, one (lang)
    hash aggregate over narrow rows."""
    from etlalchemy_spark.operators.bpe import (
        MAX_WORD_LEN,
        WORD_SPLIT_RE,
        bpe_vocab,
        tokenize_words,
    )

    docs = t(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(F.col("text")), WORD_SPLIT_RE)).alias("w"),
        )
        .where(F.col("w") != "")
        .select("lang", F.substring("w", 1, MAX_WORD_LEN).alias("word"))
    )
    tok = tokenize_words(occ.select("word").distinct(), "word", bpe_vocab(_BPE_MERGES))
    nt = F.sum("n_tokens").cast("bigint")
    nw = F.count(F.lit(1))
    nc = F.sum(F.length("word")).cast("bigint")
    return (
        occ.join(tok, "word")
        .groupBy("lang")
        .agg(
            nw.cast("bigint").alias("n_words"),
            nt.alias("n_tokens"),
            nc.alias("n_chars"),
            (nt.cast("double") / nw.cast("double")).alias("fertility"),
            (nc.cast("double") / nt.cast("double")).alias("chars_per_token"),
            (
                F.sum((F.col("n_tokens") >= 3).cast("long")).cast("double")
                / nw.cast("double")
            ).alias("frac_fragmented"),
        )
    )


# --- Chat-template packing with loss-mask offsets (r9) ---------------------------

_CHAT_SYS = "You are a helpful assistant."

_CHAT_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(trim(text), ' ') AS words
  FROM documents
),
pr AS (
  SELECT doc_id,
         array_to_string(words[1:8], ' ') AS prompt,
         array_to_string(words[9:len(words)], ' ') AS response
  FROM w WHERE len(words) > 8
)
SELECT doc_id,
       '<|system|>' || chr(10) || '{_CHAT_SYS}' || chr(10) ||
       '<|user|>' || chr(10) || prompt || chr(10) ||
       '<|assistant|>' || chr(10) || response || '<|end|>' AS packed,
       CAST(length('<|system|>') + 1 + length('{_CHAT_SYS}') + 1
            + length('<|user|>') + 1 + length(prompt) + 1
            + length('<|assistant|>') + 1 AS BIGINT) AS assistant_start,
       CAST(length('<|system|>') + 1 + length('{_CHAT_SYS}') + 1
            + length('<|user|>') + 1 + length(prompt) + 1
            + length('<|assistant|>') + 1 + length(response) AS BIGINT)
         AS assistant_end
FROM pr
"""


@register("text_chat_template_pack", oracle=_CHAT_SQL, tags=("text", "llm"))
def text_chat_template_pack(spark, sf_dir):
    """SFT chat-template serialization with LOSS-MASK offsets — the
    step between curated documents and supervised fine-tuning: each
    doc splits into a prompt (first 8 words) and response (rest),
    renders through a fixed chat template, and emits the assistant
    span's [start, end) character offsets so the trainer can mask
    loss to the response tokens without re-parsing the template
    (offset bugs here silently train on the prompt — making the
    offsets part of the hashed contract is the point of this gate).
    Pure codegen string expressions, zero shuffle; at 100 TB this is
    scan-speed map work feeding the packing/batching ops
    (text_concat_chunk_packing, text_length_bucket_batching)."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    pr = docs.select(
        "doc_id",
        F.array_join(F.slice(words, 1, 8), " ").alias("prompt"),
        F.array_join(
            F.slice(words, 9, F.greatest(F.size(words) - 8, F.lit(0))), " "
        ).alias("response"),
    ).where(F.size(words) > 8)
    nl = "\n"
    prefix_len = (
        F.lit(len("<|system|>") + 1 + len(_CHAT_SYS) + 1 + len("<|user|>") + 1)
        + F.length("prompt")
        + F.lit(1 + len("<|assistant|>") + 1)
    )
    packed = F.concat(
        F.lit("<|system|>" + nl + _CHAT_SYS + nl + "<|user|>" + nl),
        F.col("prompt"),
        F.lit(nl + "<|assistant|>" + nl),
        F.col("response"),
        F.lit("<|end|>"),
    )
    return pr.select(
        "doc_id",
        packed.alias("packed"),
        prefix_len.cast("bigint").alias("assistant_start"),
        (prefix_len + F.length("response")).cast("bigint").alias("assistant_end"),
    )


# --- Windowed co-occurrence lift (r9) --------------------------------------------

_COOC_WIN = 3
_COOC_MIN = 50

_COOC_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
),
pos AS (
  SELECT doc_id, UNNEST(generate_series(1, len(words))) AS i, words
  FROM w
),
tok AS (SELECT doc_id, i, words[CAST(i AS INT)] AS wrd FROM pos),
n AS (SELECT COUNT(*) AS total FROM tok),
uni AS (SELECT wrd, COUNT(*) AS c FROM tok GROUP BY wrd),
pairs AS (
  SELECT a.wrd AS w1, b.wrd AS w2, COUNT(*) AS c12
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id
   AND b.i > a.i AND b.i <= a.i + {_COOC_WIN}
   AND a.wrd < b.wrd
  GROUP BY a.wrd, b.wrd
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS n_cooc,
       CAST(u1.c AS BIGINT) AS n_w1, CAST(u2.c AS BIGINT) AS n_w2,
       (CAST(c12 AS DOUBLE) * CAST(total AS DOUBLE))
         / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
FROM pairs
JOIN uni u1 ON u1.wrd = w1
JOIN uni u2 ON u2.wrd = w2
CROSS JOIN n
WHERE c12 >= {_COOC_MIN}
ORDER BY lift DESC, w1, w2
LIMIT 25
"""


@register("text_cooccurrence_lift", oracle=_COOC_SQL, tags=("text", "topk"))
def text_cooccurrence_lift(spark, sf_dir):
    """Windowed co-occurrence lift — phrase/collocation mining done
    without libm: for word pairs within a ±{win} token window, lift =
    N·c(w1,w2)/(c(w1)·c(w2)) (PMI's exponential — same ranking, exact
    rational on integer counts instead of a log). Distinct from
    text_top_bigrams (adjacent only) and agg_market_basket_lift
    (basket-level): the window catches 'strong' collocations spanning
    a word or two. Shape: tokens explode ONCE with positions, the
    window pair join is a self-equi-join on doc_id banded by position
    (≤ {win} pairs emitted per token — linear, never all-pairs), two
    hash aggregates, a broadcast margin join, top-25 TakeOrdered with
    deterministic tie-break.""".replace("{win}", str(_COOC_WIN))
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    tok = docs.select(
        "doc_id", F.posexplode(words).alias("i0", "wrd")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "wrd")
    total = tok.count()
    uni = tok.groupBy("wrd").agg(F.count(F.lit(1)).alias("c"))
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.i") > F.col("a.i"))
            & (F.col("b.i") <= F.col("a.i") + _COOC_WIN)
            & (F.col("a.wrd") < F.col("b.wrd")),
        )
        .groupBy(F.col("a.wrd").alias("w1"), F.col("b.wrd").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= _COOC_MIN)
    )
    u1 = uni.select(F.col("wrd").alias("w1"), F.col("c").alias("n_w1"))
    u2 = uni.select(F.col("wrd").alias("w2"), F.col("c").alias("n_w2"))
    return (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("n_cooc"),
            F.col("n_w1").cast("bigint").alias("n_w1"),
            F.col("n_w2").cast("bigint").alias("n_w2"),
            (
                F.col("c12").cast("double") * F.lit(float(total))
                / (F.col("n_w1").cast("double") * F.col("n_w2").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(25)
    )


# --- McNemar paired classifier test (r9) -------------------------------------------

_MCNEMAR_SQL = f"""
WITH p AS ({_LANG_SQL}),
maj AS (
  SELECT labeled_lang AS m FROM p
  GROUP BY labeled_lang ORDER BY COUNT(*) DESC, labeled_lang LIMIT 1
),
paired AS (
  SELECT (predicted_lang = labeled_lang) AS a_right,
         (labeled_lang = maj.m) AS b_right
  FROM p, maj
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END) AS BIGINT) AS b_discordant,
       CAST(SUM(CASE WHEN b_right AND NOT a_right THEN 1 ELSE 0 END) AS BIGINT) AS c_discordant,
       CAST(SUM(CASE WHEN a_right THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS acc_a,
       CAST(SUM(CASE WHEN b_right THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS acc_b,
       CAST(
         (SUM(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END)
          - SUM(CASE WHEN b_right AND NOT a_right THEN 1 ELSE 0 END))
         * (SUM(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END)
            - SUM(CASE WHEN b_right AND NOT a_right THEN 1 ELSE 0 END)) AS DOUBLE)
       / CAST(NULLIF(SUM(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END)
              + SUM(CASE WHEN b_right AND NOT a_right THEN 1 ELSE 0 END), 0) AS DOUBLE)
         AS mcnemar_chi2
FROM paired
"""


@register("text_langid_mcnemar", oracle=_MCNEMAR_SQL, tags=("text", "stats"))
def text_langid_mcnemar(spark, sf_dir):
    """McNemar's paired test — the CORRECT way to compare two
    classifiers evaluated on the SAME documents (two independent
    accuracy CIs ignore the pairing and waste power): classifier A is
    the shipped marker-word lang_id, B the majority-class baseline
    (deterministic tie-break), and the statistic (b−c)²/(b+c) uses
    only the DISCORDANT pairs — documents where exactly one method is
    right. All counts exact integers, one double division; the model-
    comparison gate a curation team runs before swapping a quality
    classifier. One scan + one aggregate, the majority label a
    broadcast one-rower."""
    from etlalchemy_spark.operators.text import lang_id

    docs = _spread_docs(spark, sf_dir)  # map-bound lang-id classify scan
    p = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )
    maj = (
        p.groupBy("labeled_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "labeled_lang")
        .limit(1)
        .select(F.col("labeled_lang").alias("m"))
    )
    paired = p.crossJoin(F.broadcast(maj)).select(
        (F.col("predicted_lang") == F.col("labeled_lang")).alias("a_right"),
        (F.col("labeled_lang") == F.col("m")).alias("b_right"),
    )
    a, b = F.col("a_right"), F.col("b_right")
    bd = F.sum((a & ~b).cast("long"))
    cd = F.sum((b & ~a).cast("long"))
    n = F.count(F.lit(1))
    return paired.agg(
        n.cast("bigint").alias("n_docs"),
        bd.cast("bigint").alias("b_discordant"),
        cd.cast("bigint").alias("c_discordant"),
        (F.sum(a.cast("long")).cast("double") / n.cast("double")).alias("acc_a"),
        (F.sum(b.cast("long")).cast("double") / n.cast("double")).alias("acc_b"),
        (
            ((bd - cd) * (bd - cd)).cast("double")
            / F.nullif(bd + cd, F.lit(0)).cast("double")
        ).alias("mcnemar_chi2"),
    )


_URL_CANON_SQL = """
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END
         || '://' ||
         CASE WHEN doc_id % 2 = 0 THEN 'WWW.Example' ELSE 'www.example' END
         || CAST(doc_id % 50 AS VARCHAR) || '.COM'
         || CASE WHEN doc_id % 5 = 0
                 THEN CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END
                 ELSE '' END
         || '/a/b' || CAST(doc_id % 20 AS VARCHAR)
         || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
         || '?' ||
         CASE WHEN doc_id % 2 = 0
              THEN 'utm_source=feed&id=' || CAST(doc_id % 100 AS VARCHAR) || '&ref=tw'
              ELSE 'id=' || CAST(doc_id % 100 AS VARCHAR) || '&utm_campaign=x'
         END
         || CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS authority,
         regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM raw
),
canon AS (
  SELECT doc_id,
         scheme || '://' ||
         regexp_replace(
           regexp_replace(regexp_replace(authority, '^www\\.', ''), ':80$', ''),
           ':443$', '') ||
         CASE WHEN path IN ('', '/') THEN '/'
              ELSE regexp_replace(path, '/$', '') END ||
         CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canonical_url
  FROM (
    SELECT doc_id, scheme, authority, path,
           list_aggregate(
             list_sort(list_filter(string_split(query, '&'),
               p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid|gclid)='))),
             'string_agg', '&') AS kept0,
           COALESCE(list_aggregate(
             list_sort(list_filter(string_split(query, '&'),
               p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid|gclid)='))),
             'string_agg', '&'), '') AS kept
    FROM parts
  )
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_dups,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM canon
GROUP BY canonical_url
"""


@register("text_url_canonicalize_dedup", oracle=_URL_CANON_SQL, tags=("text", "dedup", "etl"))
def text_url_canonicalize_dedup(spark, sf_dir):
    """URL canonicalization + dedup — the first dedup pass of every
    web-scale corpus pipeline (CommonCrawl-style), where the same page
    hides behind scheme/host case, default ports, www prefixes,
    trailing slashes, tracking parameters (utm_*/ref/fbclid/gclid),
    parameter order, and fragments. Synthesized messy URLs (doc_id
    formula, all variation axes) canonicalize with PURE built-ins —
    regexp_extract to split, lower/regexp_replace for scheme-host-port
    normalization, split + filter + array_sort + array_join for the
    query string — so the hot path is whole-stage codegen; one hash
    aggregate groups by canonical form (count + min-doc
    representative). At 100 TB this is scan + one shuffle on the
    canonical key; no UDF, no driver round-trip. DuckDB mirrors the
    whole normalization chain for the oracle."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.Example")).otherwise(
            F.lit("www.example")
        ),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".COM"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.when(F.col("doc_id") % 3 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        ).otherwise(F.lit("")),
        F.lit("/a/b"),
        (F.col("doc_id") % 20).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("utm_source=feed&id="),
                (F.col("doc_id") % 100).cast("string"),
                F.lit("&ref=tw"),
            ),
        ).otherwise(
            F.concat(
                F.lit("id="),
                (F.col("doc_id") % 100).cast("string"),
                F.lit("&utm_campaign=x"),
            )
        ),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    u = d.select("doc_id", url.alias("url"))
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    authority = F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1))
    path = F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract("url", r"\?([^#]*)", 1)
    host = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(authority, r"^www\.", ""), ":80$", ""),
        ":443$",
        "",
    )
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "")
                & ~p.rlike("^(utm_[^=]*|ref|fbclid|gclid)="),
            )
        ),
        "&",
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path.isin("", "/"), F.lit("/")).otherwise(
            F.regexp_replace(path, "/$", "")
        ),
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return (
        u.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("first_doc"),
        )
    )


from etlalchemy_spark.queries._util import ln_int_sql  # noqa: E402

_LN_C = ln_int_sql("c")
_LN_NTOT = ln_int_sql("ntot")

_UNIGRAM_LOGPROB_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
),
tot AS (SELECT SUM(c) AS ntot FROM vocab),
per_tok AS (
  SELECT t.doc_id,
         CAST({_LN_C} AS DECIMAL(28,10)) AS lnc
  FROM toks t JOIN vocab USING (tok)
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_toks, SUM(lnc) AS s_lnc
  FROM per_tok GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.n_toks AS BIGINT) AS n_tokens,
       CAST(CAST(CAST(CAST(CAST(d.n_toks AS DOUBLE) * {_LN_NTOT} AS DECIMAL(28,10))
                      - CAST(d.s_lnc AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE)
            / CAST(d.n_toks AS DOUBLE) AS DOUBLE) AS mean_surprisal_nats
FROM per_doc d, tot
"""


@register(
    "text_unigram_logprob", oracle=_UNIGRAM_LOGPROB_SQL,
    tags=("text", "stats", "llm", "bench"),
)
def text_unigram_logprob(spark, sf_dir):
    """TRUE unigram-LM surprisal scoring (r10) — the perplexity-style
    quality filter `text_unigram_commonness` could only approximate
    rationally while log() was off-limits (libm rounds differently per
    engine): per document, the mean token surprisal ln(N) - ln(c_tok)
    in nats under the corpus unigram model. Now exact cross-engine via
    ln_int_sql (ln of integer counts built from identically-rounded
    IEEE arithmetic; see agg_entropy_exact), with per-token ln(c)
    terms cast to fixed-scale decimals before the per-doc sum — exact,
    order-free — and ONE final identical IEEE division per doc. High
    surprisal flags gibberish/OCR noise, low flags boilerplate — the
    two tails every corpus filter cuts. Shape: narrow token explode,
    one vocabulary hash-agg, one Zipf-skewed equi-join (AQE skew
    split), one per-doc re-agg; the global total rides in as a
    1-row broadcast cross join, never a driver collect."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("ntot"))
    per_tok = toks.join(vocab, "tok").select(
        "doc_id", F.expr(f"CAST({_LN_C} AS DECIMAL(28,10))").alias("lnc")
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"), F.sum("lnc").alias("s_lnc")
    )
    joined = per_doc.crossJoin(F.broadcast(tot))
    num = (
        F.expr(f"CAST(CAST(n_toks AS DOUBLE) * {_LN_NTOT} AS DECIMAL(28,10))")
        - F.col("s_lnc").cast("decimal(28,10)")
    )
    return joined.select(
        "doc_id",
        F.col("n_toks").cast("bigint").alias("n_tokens"),
        (num.cast("double") / F.col("n_toks").cast("double")).alias(
            "mean_surprisal_nats"
        ),
    )


_PMI_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
bi AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
bc AS (SELECT w1, w2, COUNT(*) AS c FROM bi GROUP BY w1, w2),
u1m AS (SELECT w1 AS w, SUM(c) AS cu FROM bc GROUP BY w1),
u2m AS (SELECT w2 AS w, SUM(c) AS cu FROM bc GROUP BY w2),
tot AS (SELECT SUM(c) AS n FROM bc),
pmi AS (
  SELECT b.w1, b.w2, b.c,
         CAST((({ln_int_sql("tot.n")} + {ln_int_sql("b.c")})
               - ({ln_int_sql("u1.cu")} + {ln_int_sql("u2.cu")})) AS DOUBLE) AS pmi_nats
  FROM bc b
  JOIN u1m u1 ON u1.w = b.w1
  JOIN u2m u2 ON u2.w = b.w2
  CROSS JOIN tot
  WHERE b.c >= 5
)
SELECT w1, w2, CAST(c AS BIGINT) AS n_occurrences, pmi_nats
FROM pmi
ORDER BY pmi_nats DESC, w1, w2 LIMIT 20
"""


@register("text_pmi_collocations", oracle=_PMI_SQL, tags=("text", "stats", "topk"))
def text_pmi_collocations(spark, sf_dir):
    """Pointwise-mutual-information collocation mining — the classic
    phrase detector (Mikolov-style word2phrase) a tokenizer or phrase
    vocabulary build runs first: PMI(w1,w2) = ln(N·c12 / (c1·c2)) over
    adjacent-token bigrams, minimum-count 5, top 20. Every ln is on an
    INTEGER count via the cross-engine-exact ln_int_sql, combined in a
    fixed parenthesization — PMI doubles are bit-identical in both
    engines, so even the ORDER BY ranking hash-matches (ties broken
    lexicographically). Shape: positional-bigram explode (only token
    pairs shuffle), one bigram hash-agg, unigram margins derived FROM
    the bigram table (one reuse, no second corpus scan), two
    broadcast-size joins on the margins, TakeOrderedAndProject
    top-20."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("ws"),
    )
    bi = toks.select(
        F.expr("explode(transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1, ws[i] AS w2)))").alias("p")
    ).select("p.w1", "p.w2")
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # margins derived FROM the bigram table (one reuse, no second
    # corpus scan): first-position counts for w1, second for w2
    u1 = bc.groupBy("w1").agg(F.sum("c").alias("cu1"))
    u2 = bc.groupBy("w2").agg(F.sum("c").alias("cu2"))
    tot = bc.agg(F.sum("c").alias("n"))
    pmi = (
        bc.where(F.col("c") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("n_occurrences"),
            F.expr(
                f"CAST((({ln_int_sql('n')} + {ln_int_sql('c')})"
                f" - ({ln_int_sql('cu1')} + {ln_int_sql('cu2')})) AS DOUBLE)"
            ).alias("pmi_nats"),
        )
    )
    return pmi.orderBy(F.desc("pmi_nats"), "w1", "w2").limit(20)


_LN_RNK = ln_int_sql("rnk")
_LN_CNT = ln_int_sql("c")

_ZIPF_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk
  FROM vocab
),
xy AS (
  SELECT CAST({_LN_RNK} AS DOUBLE) AS x, CAST({_LN_CNT} AS DOUBLE) AS y
  FROM ranked
),
sums AS (
  -- scale 8 keeps every unscaled sum under 2^53 (exact double
  -- conversion both engines; VARCHAR route dodges DuckDB's int128
  -- misrounding)
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x * x AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(x * y AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_vocab,
       CAST((CAST(n AS DOUBLE) * sxy - sx * sy)
            / (CAST(n AS DOUBLE) * sxx - sx * sx) AS DOUBLE) AS zipf_slope,
       CAST((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
            / CAST(n AS DOUBLE) AS DOUBLE) AS intercept
FROM sums
"""


@register("text_zipf_fit", oracle=_ZIPF_SQL, tags=("text", "stats"))
def text_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary (r10) — OLS of
    ln(frequency) on ln(rank): natural text sits near slope −1, and a
    corpus drifting toward 0 (too uniform — synthetic/templated) or
    below −1.5 (boilerplate-dominated) fails health checks before
    training does. Ranks tie-break lexicographically so both engines
    rank identically; every ln is the cross-engine-exact integer
    construction, per-term x·y products are identical IEEE doubles
    cast to scale-8 decimals before the sums (unscaled stays under
    2^53 — exact double conversion; the oracle routes through VARCHAR
    past DuckDB's int128 misrounding), and the closed-form slope/
    intercept are fixed parenthesizations of identical doubles. One
    vocab hash-agg + the range-bucketed global-rank pass over vocab
    rows (operators/prefix.global_ranks on the NEGATED count — no
    single-partition window: vocabulary is Heaps-law sublinear but
    still unbounded, unlike the calendar-bounded hour frames) + one
    aggregate."""
    from etlalchemy_spark.operators.prefix import global_ranks

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # descending count = ascending -c; counts are never NULL so the
    # negated-key NULLS-FIRST caveat in global_ranks doesn't apply
    ranked = global_ranks(vocab, -F.col("c"), ["tok"]).select(
        "c", F.col("rn").alias("rnk")
    )
    xy = ranked.select(
        F.expr(f"CAST({_LN_RNK} AS DOUBLE)").alias("x"),
        F.expr(f"CAST({_LN_CNT} AS DOUBLE)").alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,8)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,8)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,8)")).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,8)")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_vocab"),
        slope.alias("zipf_slope"),
        ((F.col("sy") - slope * F.col("sx")) / nd).alias("intercept"),
    )


# --- Cohen's kappa for the lang-id classifier (r10) ---------------------------------

_KAPPA_SQL = f"""
WITH p AS ({_LANG_SQL}),
conf AS (
  SELECT labeled_lang AS r, predicted_lang AS c, COUNT(*) AS n
  FROM p GROUP BY 1, 2
),
rt AS (SELECT r, SUM(n) AS row_tot FROM conf GROUP BY r),
ct AS (SELECT c, SUM(n) AS col_tot FROM conf GROUP BY c),
a AS (
  SELECT (SELECT SUM(n) FROM conf) AS nn,
         (SELECT COALESCE(SUM(n), 0) FROM conf WHERE r = c) AS agree,
         (SELECT SUM(CAST(rt.row_tot AS HUGEINT) * ct.col_tot)
          FROM rt JOIN ct ON rt.r = ct.c) AS src
)
SELECT CAST(nn AS BIGINT) AS n_docs,
       CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE) AS p_observed,
       CAST(CAST(src AS VARCHAR) AS DOUBLE)
         / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) AS p_expected,
       CAST(CAST(nn * agree - src AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(nn AS HUGEINT) * nn - src AS VARCHAR) AS DOUBLE) AS kappa
FROM a
"""


@register("text_langid_kappa", oracle=_KAPPA_SQL, tags=("text", "stats"))
def text_langid_kappa(spark, sf_dir):
    """Cohen's kappa between the marker-word lang-id and the labeled
    language (r10) — chance-corrected agreement, the standard
    inter-annotator / classifier-vs-gold readout that raw accuracy
    overstates whenever the class mix is skewed (a degenerate
    all-'en' rater already 'agrees' with the majority share).
    Multi-class kappa clears every denominator into pure integers:
    kappa = (N*agree - sum_c row_c*col_c) / (N^2 - sum_c row_c*col_c)
    from the confusion matrix and its margins — no float intermediate
    at all until the closing divisions (VARCHAR-routed, house
    discipline). Shape: one classify scan, one confusion hash-agg
    (at most |langs|^2 cells), margin re-aggs over CELL rows, and a
    one-row closing select — the fact table is scanned once.
    Complements `text_langid_mcnemar` (paired significance) with the
    effect-size view."""
    docs = _spread_docs(spark, sf_dir)  # map-bound lang-id classify scan
    p = docs.select(
        F.col("lang").alias("r"), lang_id(F.col("text")).alias("c")
    )
    # FOUR consumers of the confusion matrix (both margins, N, the
    # diagonal) — without the cut each re-runs the classify scan +
    # confusion aggregate; materialized it is <= |langs|^2 rows
    conf = cut(p.groupBy("r", "c").agg(F.count(F.lit(1)).alias("n")))
    rt = conf.groupBy("r").agg(F.sum("n").alias("row_tot"))
    ct = conf.groupBy("c").agg(F.sum("n").alias("col_tot"))
    nn = conf.agg(F.sum("n").alias("nn"))
    agree = conf.where(F.col("r") == F.col("c")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("agree")
    )
    src = (
        rt.join(ct, rt.r == ct.c)
        .agg(
            F.sum(
                F.col("row_tot").cast("decimal(38,0)")
                * F.col("col_tot").cast("decimal(38,0)")
            ).alias("src")
        )
    )
    a = nn.crossJoin(F.broadcast(agree)).crossJoin(F.broadcast(src))
    nnd = F.col("nn").cast("decimal(38,0)")
    return a.select(
        F.col("nn").cast("bigint").alias("n_docs"),
        (F.col("agree").cast("double") / F.col("nn").cast("double")).alias("p_observed"),
        (
            F.col("src").cast("double")
            / (F.col("nn").cast("double") * F.col("nn").cast("double"))
        ).alias("p_expected"),
        (
            (nnd * F.col("agree") - F.col("src")).cast("double")
            / (nnd * nnd - F.col("src")).cast("double")
        ).alias("kappa"),
    )


# --- Jensen-Shannon divergence between language corpora (r10) -----------------------

_LN2 = "6931471805599453e-16"

# Each row needs only THREE distinct integer lns: ln(2*a*n2), ln(2*b*n1)
# and the shared mixture ln(a*n2 + b*n1) — materialized ONCE each in a
# staged projection (the expanded atanh-series tree is ~5 KB of codegen
# per use; the first cut evaluated four of them inline and paid 20 s of
# cold whole-stage-codegen compile for a 500-doc corpus). GREATEST(x,1)
# keeps bin() defined when a count is zero; the zero p-weight then
# multiplies that placeholder ln(1)=0 away exactly.
_JSD_LA = ln_int_sql("GREATEST(2 * a * n2, 1)")
_JSD_LB = ln_int_sql("GREATEST(2 * b * n1, 1)")
_JSD_LM = ln_int_sql("(a * n2 + b * n1)")

_JSD_TERM = (
    "CAST(((CAST(a AS DOUBLE) / CAST(n1 AS DOUBLE)) * (la - lm)"
    " + (CAST(b AS DOUBLE) / CAST(n2 AS DOUBLE)) * (lb - lm)) / 2e0"
    " AS DECIMAL(28,8))"
)

_JSD_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents WHERE lang IN ('en', 'de')
),
c1 AS (SELECT w, COUNT(*) AS c FROM toks WHERE lang = 'en' GROUP BY w),
c2 AS (SELECT w, COUNT(*) AS c FROM toks WHERE lang = 'de' GROUP BY w),
u AS (
  SELECT COALESCE(c1.c, 0) AS a, COALESCE(c2.c, 0) AS b
  FROM c1 FULL OUTER JOIN c2 ON c1.w = c2.w
),
tot AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM u),
lns AS (
  SELECT a, b, n1, n2,
         {_JSD_LA} AS la, {_JSD_LB} AS lb, {_JSD_LM} AS lm
  FROM u, tot
),
terms AS (SELECT {_JSD_TERM} AS v FROM lns)
SELECT (SELECT COUNT(*) FROM u) AS n_vocab_union,
       (SELECT CAST(n1 AS BIGINT) FROM tot) AS n_tokens_a,
       (SELECT CAST(n2 AS BIGINT) FROM tot) AS n_tokens_b,
       CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS jsd_nats,
       CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / {_LN2} AS jsd_normalized
FROM terms
"""


@register("text_js_divergence", oracle=_JSD_SQL, tags=("text", "stats", "bench"))
def text_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence between the English and German token
    distributions (r10) — the symmetric, bounded (0..ln2) corpus-drift
    distance data-mixing pipelines prefer over KL (which blows up on
    unseen words; JSD's mixture denominator never hits zero). Every
    log is over INTEGERS — p*ln(2p/(p+q)) rewrites to counts as
    ln(2*c1*N2) - ln(c1*N2 + c2*N1) — so the cross-engine-exact
    ln_int construction applies and per-term doubles are identical
    IEEE trees; only THREE ln trees per vocab row (the mixture ln is
    shared between the two sides), each materialized once in a staged
    projection to keep codegen small; scale-8 decimal term sums make
    the vocabulary-wide reduction order-free (zipf idiom). Shape:
    token hash-aggs per side, ONE full-outer vocab join (vocab rows,
    never token stream), broadcast totals, one closing reduce. Also
    emits the ln2-normalized value in [0, 1]."""
    docs = t(spark, sf_dir, "documents").where(F.col("lang").isin("en", "de"))
    toks = docs.select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("w"),
    )
    c1 = toks.where(F.col("lang") == "en").groupBy("w").agg(F.count(F.lit(1)).alias("a"))
    c2 = toks.where(F.col("lang") == "de").groupBy("w").agg(F.count(F.lit(1)).alias("b"))
    u = (
        c1.join(c2, "w", "full_outer")
        .select(
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
            F.coalesce(F.col("b"), F.lit(0)).alias("b"),
        )
        # referenced three times (totals, the per-term projection, the
        # vocab count) — one materialization of the two-int vocab frame
        # instead of three explode+agg+full-outer re-executions (the
        # r13 before-plan ran the token pipeline 4x: 8 parquet scans)
        .localCheckpoint(eager=False)
    )
    tot = u.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2"))
    lns = u.crossJoin(F.broadcast(tot)).select(
        "a", "b", "n1", "n2",
        F.expr(_JSD_LA).alias("la"),
        F.expr(_JSD_LB).alias("lb"),
        F.expr(_JSD_LM).alias("lm"),
    )
    terms = lns.select(F.expr(_JSD_TERM).alias("v"))
    meta = u.agg(F.count(F.lit(1)).alias("n_vocab_union"))
    s = terms.agg(F.sum("v").cast("double").alias("jsd"))
    return (
        meta.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(s))
        .select(
            F.col("n_vocab_union").cast("bigint").alias("n_vocab_union"),
            F.col("n1").cast("bigint").alias("n_tokens_a"),
            F.col("n2").cast("bigint").alias("n_tokens_b"),
            F.col("jsd").alias("jsd_nats"),
            (F.col("jsd") / F.expr(_LN2)).alias("jsd_normalized"),
        )
    )


# --- Bigram LM surprisal (r10) -------------------------------------------------------

_BG_LN1 = ln_int_sql("(cb + 1)")
_BG_LN2 = ln_int_sql("(cl + v)")

_BIGRAM_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1])) AS bg
  FROM w WHERE len(ws) >= 2
),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM (SELECT UNNEST(ws) AS tok FROM w)),
cb_t AS (SELECT bg, COUNT(*) AS cb FROM bg GROUP BY bg),
cl_t AS (
  SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS cl FROM bg GROUP BY 1
),
types AS (
  SELECT cb_t.bg,
         CAST(({_BG_LN1}) - ({_BG_LN2}) AS DECIMAL(28,10)) AS lp
  FROM cb_t JOIN cl_t ON split_part(cb_t.bg, ' ', 1) = cl_t.w1, vocab
),
docsum AS (
  SELECT b.doc_id, COUNT(*) AS n_bigrams, SUM(t.lp) AS s
  FROM bg b JOIN types t ON b.bg = t.bg
  GROUP BY b.doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS mean_bigram_logprob
FROM docsum
"""


@register("text_bigram_logprob", oracle=_BIGRAM_SQL, tags=("text", "stats"))
def text_bigram_logprob(spark, sf_dir):
    """Bigram-LM surprisal scoring (r10) — the perplexity-style
    quality filter one order up from `text_unigram_logprob`: a doc
    whose WORD PAIRS are improbable under the corpus bigram model is
    gibberish/shuffled/boilerplate even when its unigrams look fine
    (the standard n-gram-LM filtering step in C4/CCNet-style
    pipelines). Add-one smoothing over the vocabulary keeps every
    probability a ratio of integers, so per-bigram-TYPE log
    probabilities ln(c12+1) - ln(c1+V) are differences of
    cross-engine-exact integer lns, evaluated once per distinct
    bigram (types, never the token stream) and joined back; per-doc
    means are scale-10 decimal sums over occurrences. Shape: one
    bigram explode (narrow strings), two hash-aggs, one Zipf-skewed
    type join (AQE handles the hot bigrams), one per-doc re-agg."""
    docs = t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("ws"),
    )
    bg = w.where(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("bg"),
    )
    vocab = (
        w.select(F.explode("ws").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    cb_t = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    cl_t = bg.groupBy(F.expr("split_part(bg, ' ', 1)").alias("w1")).agg(
        F.count(F.lit(1)).alias("cl")
    )
    types = (
        cb_t.join(cl_t, F.expr("split_part(bg, ' ', 1)") == cl_t.w1)
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.expr(f"CAST(({_BG_LN1}) - ({_BG_LN2}) AS DECIMAL(28,10))").alias("lp"),
        )
    )
    docsum = (
        bg.join(types, "bg")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("s"))
    )
    return docsum.select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        (F.col("s").cast("double") / F.col("n_bigrams").cast("double")).alias(
            "mean_bigram_logprob"
        ),
    )


# --- RAKE keyword extraction (r10) ---------------------------------------------------

_RAKE_STOPS = "'the','a','an','and','or','of','to','in','is','it','for','on','with','as','by','at','be','this','that','are','was'"
_RAKE_MAX_WORDS = 4
_RAKE_TOPK = 15

_RAKE_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
  FROM documents
),
pos AS (
  SELECT doc_id, UNNEST(generate_series(1, len(words))) AS i, words FROM w
),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, words[CAST(i AS INT)] AS wrd
  FROM pos
),
kept AS (
  SELECT doc_id, i, wrd,
         i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM tok WHERE wrd NOT IN ({_RAKE_STOPS})
),
phrases AS (
  SELECT doc_id, island,
         string_agg(wrd, ' ' ORDER BY i) AS phrase,
         COUNT(*) AS n_words
  FROM kept GROUP BY doc_id, island
  HAVING COUNT(*) <= {_RAKE_MAX_WORDS}
),
pw AS (
  SELECT phrase, n_words, UNNEST(regexp_split_to_array(phrase, ' ')) AS wrd
  FROM phrases
),
wstat AS (
  SELECT wrd, COUNT(*) AS freq, SUM(n_words) AS degree FROM pw GROUP BY wrd
),
scored AS (
  SELECT pw.phrase,
         SUM(CAST(CAST(wstat.degree AS DOUBLE) / CAST(wstat.freq AS DOUBLE)
                  AS DECIMAL(28,12))) AS score12
  FROM pw JOIN wstat ON pw.wrd = wstat.wrd
  GROUP BY pw.phrase
),
occ AS (SELECT phrase, COUNT(*) AS occurrences FROM phrases GROUP BY phrase)
SELECT s.phrase,
       CAST(len(regexp_split_to_array(s.phrase, ' ')) AS INT) AS n_words,
       CAST(o.occurrences AS BIGINT) AS occurrences,
       CAST(CAST(s.score12 AS VARCHAR) AS DOUBLE)
         / CAST(o.occurrences AS DOUBLE) AS rake_score
FROM scored s JOIN occ o ON s.phrase = o.phrase
ORDER BY rake_score DESC, s.phrase
LIMIT {_RAKE_TOPK}
"""


@register("text_rake_keywords", oracle=_RAKE_SQL, tags=("text", "stats"))
def text_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (r10) — the classic unsupervised
    keyphrase scorer (Rose et al.: candidate phrases are maximal runs
    of non-stopwords; word score = co-occurrence degree / frequency;
    phrase score = sum of its word scores), the corpus-labeling /
    topic-tagging primitive that needs no model. Phrase runs are the
    gaps-and-islands identity (i - row_number over kept words) — the
    sessionize trick applied to token positions, windows partitioned
    per doc (doc-sized, never corpus); word stats are two hash-aggs
    over PHRASE words; phrase scores sum degree/freq ratios as
    scale-12 decimals (order-free; the SUM over a phrase's words
    would otherwise be shuffle-order-dependent doubles). Scores
    dedupe across identical phrases (score12/occurrences — the sum
    counted each occurrence once). Top-15 via
    TakeOrderedAndProject."""
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("i0", "wrd"),
    ).select("doc_id", (F.col("i0") + 1).cast("bigint").alias("i"), "wrd")
    stops = [s.strip("'") for s in _RAKE_STOPS.split(",")]
    kept = tok.where(~F.col("wrd").isin(*stops)).withColumn(
        "island",
        F.col("i") - F.row_number().over(W.partitionBy("doc_id").orderBy("i")),
    )
    phrases = (
        kept.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(i, wrd))), x -> x.wrd)"),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .where(F.col("n_words") <= _RAKE_MAX_WORDS)
    )
    pw = phrases.select(
        "phrase", "n_words", F.explode(F.split("phrase", " ")).alias("wrd")
    )
    wstat = pw.groupBy("wrd").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("n_words").alias("degree")
    )
    scored = (
        pw.join(wstat, "wrd")
        .groupBy("phrase")
        .agg(
            F.sum(
                (
                    F.col("degree").cast("double") / F.col("freq").cast("double")
                ).cast("decimal(28,12)")
            ).alias("score12")
        )
    )
    occ = phrases.groupBy("phrase").agg(F.count(F.lit(1)).alias("occurrences"))
    return (
        scored.join(occ, "phrase")
        .select(
            "phrase",
            F.size(F.split("phrase", " ")).cast("int").alias("n_words"),
            F.col("occurrences").cast("bigint").alias("occurrences"),
            (
                F.col("score12").cast("double")
                / F.col("occurrences").cast("double")
            ).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(_RAKE_TOPK)
    )


# --- Per-class precision/recall/F1/MCC for lang-id (r10) ------------------------------

_F1_SQL = f"""
WITH p AS ({_LANG_SQL}),
classes AS (SELECT DISTINCT labeled_lang AS cls FROM p),
nn AS (SELECT COUNT(*) AS n FROM p),
m AS (
  SELECT c.cls,
         SUM(CASE WHEN labeled_lang = c.cls AND predicted_lang = c.cls
                  THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN labeled_lang <> c.cls AND predicted_lang = c.cls
                  THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN labeled_lang = c.cls AND predicted_lang <> c.cls
                  THEN 1 ELSE 0 END) AS fn
  FROM p, classes c GROUP BY c.cls
)
SELECT cls AS lang,
       CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       CAST(n - tp - fp - fn AS BIGINT) AS tn,
       CAST(tp AS DOUBLE) / CAST(NULLIF(tp + fp, 0) AS DOUBLE) AS precision_,
       CAST(tp AS DOUBLE) / CAST(NULLIF(tp + fn, 0) AS DOUBLE) AS recall_,
       CAST(2 * tp AS DOUBLE) / CAST(NULLIF(2 * tp + fp + fn, 0) AS DOUBLE) AS f1,
       CAST(CAST(CAST(tp AS HUGEINT) * (n - tp - fp - fn)
                 - CAST(fp AS HUGEINT) * fn AS VARCHAR) AS DOUBLE)
         / NULLIF(SQRT(CAST(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
                          * (n - tp - fn) * (n - tp - fp) AS VARCHAR) AS DOUBLE)), 0)
         AS mcc
FROM m, nn
"""


@register("text_langid_f1_report", oracle=_F1_SQL, tags=("text", "stats"))
def text_langid_f1_report(spark, sf_dir):
    """Per-class classifier report (r10): one-vs-rest precision,
    recall, F1 and Matthews correlation for the lang-id heuristic
    against the gold labels — the row-per-class table every model
    card prints (kappa gives the single chance-corrected number,
    McNemar the paired significance; this is the WHERE-does-it-fail
    view). Every cell derives from exact confusion integers (TP/FP/FN
    per class + TN by complement), divisions happen once per class in
    a fixed IEEE tree (MCC's product-of-margins denominator rides
    int128 exactly, VARCHAR-routed down to double — it overflows
    int64 near N ~ 50k per margin pair). Shape: one classify scan,
    one |classes|-row cross-tab agg — the cross join against the
    class dimension is broadcast-sized."""
    docs = _spread_docs(spark, sf_dir)  # map-bound lang-id classify scan
    p = docs.select(
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )
    p = p.localCheckpoint(eager=False)  # feeds classes + cross-tab + count
    classes = p.select(F.col("labeled_lang").alias("cls")).distinct()
    nn = p.agg(F.count(F.lit(1)).alias("n"))
    m = (
        p.crossJoin(F.broadcast(classes))
        .groupBy("cls")
        .agg(
            F.sum(
                ((F.col("labeled_lang") == F.col("cls"))
                 & (F.col("predicted_lang") == F.col("cls"))).cast("long")
            ).alias("tp"),
            F.sum(
                ((F.col("labeled_lang") != F.col("cls"))
                 & (F.col("predicted_lang") == F.col("cls"))).cast("long")
            ).alias("fp"),
            F.sum(
                ((F.col("labeled_lang") == F.col("cls"))
                 & (F.col("predicted_lang") != F.col("cls"))).cast("long")
            ).alias("fn"),
        )
    )
    w = m.crossJoin(F.broadcast(nn))
    tn = F.col("n") - F.col("tp") - F.col("fp") - F.col("fn")
    d38 = "decimal(38,0)"
    mcc_num = (
        F.col("tp").cast(d38) * tn - F.col("fp").cast(d38) * F.col("fn")
    ).cast("double")
    mcc_den = F.sqrt(
        (
            (F.col("tp") + F.col("fp")).cast(d38)
            * (F.col("tp") + F.col("fn"))
            * (F.col("n") - F.col("tp") - F.col("fn"))
            * (F.col("n") - F.col("tp") - F.col("fp"))
        ).cast("double")
    )
    return w.select(
        F.col("cls").alias("lang"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        (
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fp")), F.lit(0)).cast("double")
        ).alias("precision_"),
        (
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fn")), F.lit(0)).cast("double")
        ).alias("recall_"),
        (
            (2 * F.col("tp")).cast("double")
            / F.nullif((2 * F.col("tp") + F.col("fp") + F.col("fn")), F.lit(0)).cast(
                "double"
            )
        ).alias("f1"),
        (mcc_num / F.nullif(mcc_den, F.lit(0.0))).alias("mcc"),
    )


# --- Log-template mining (r10) ---------------------------------------------------------

_TPL_SQL = """
WITH masked AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(lower(text), '[0-9]+', '<n>', 'g'),
           '\\s+', ' ', 'g') AS m
  FROM documents
),
skel AS (
  SELECT doc_id,
         array_to_string(regexp_split_to_array(trim(m), ' ')[1:6], ' ') AS template
  FROM masked
)
SELECT template,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS example_doc
FROM skel
GROUP BY template
ORDER BY n_docs DESC, template
LIMIT 15
"""


@register("text_log_templates", oracle=_TPL_SQL, tags=("text",))
def text_log_templates(spark, sf_dir):
    """Log-template mining, Drain-lite (r10) — the observability
    pipeline's first move: mask the variable parts (numbers -> <n>),
    keep the leading-token skeleton, and group by template so a
    million 'user 4711 logged in from 10.2.3.4' lines collapse to one
    pattern with a count — template cardinality and its drift are the
    log-quality dashboard, and new templates are the incident signal.
    Pure narrow string maps (two regexp passes + a 6-token slice) in
    the scan stage; one hash-agg; TakeOrderedAndProject top-15 with a
    deterministic example doc per template."""
    docs = t(spark, sf_dir, "documents")
    masked = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[0-9]+", "<n>"), r"\s+", " "
        ).alias("m"),
    )
    skel = masked.select(
        "doc_id",
        F.expr("array_join(slice(split(trim(m), ' '), 1, 6), ' ')").alias("template"),
    )
    return (
        skel.groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("example_doc"),
        )
        .orderBy(F.desc("n_docs"), "template")
        .limit(15)
    )


# --- SRT subtitle cue parsing (r10) ----------------------------------------------------

# Both engines BUILD the .srt text and PARSE it back with the same
# regex — agreement proves the timecode format handling end to end.
_SRT_TC = "'(\\\\d+):(\\\\d+):(\\\\d+),(\\\\d+)'"

_SRT_SQL = """
WITH params AS (SELECT doc_id, 1 + doc_id % 4 AS n_cues FROM documents),
built AS (
  SELECT doc_id, n_cues,
         array_to_string(list_transform(generate_series(0, n_cues - 1), i ->
           CAST(i + 1 AS STRING) || chr(10)
           || lpad(CAST((((doc_id * 131 + i * 2000) // 3600000) % 24) AS STRING), 2, '0') || ':'
           || lpad(CAST((((doc_id * 131 + i * 2000) // 60000) % 60) AS STRING), 2, '0') || ':'
           || lpad(CAST((((doc_id * 131 + i * 2000) // 1000) % 60) AS STRING), 2, '0') || ','
           || lpad(CAST(((doc_id * 131 + i * 2000) % 1000) AS STRING), 3, '0')
           || ' --> '
           || lpad(CAST((((doc_id * 131 + i * 2000 + 1500) // 3600000) % 24) AS STRING), 2, '0') || ':'
           || lpad(CAST((((doc_id * 131 + i * 2000 + 1500) // 60000) % 60) AS STRING), 2, '0') || ':'
           || lpad(CAST((((doc_id * 131 + i * 2000 + 1500) // 1000) % 60) AS STRING), 2, '0') || ','
           || lpad(CAST(((doc_id * 131 + i * 2000 + 1500) % 1000) AS STRING), 3, '0')
           || chr(10) || 'cue text ' || CAST(i AS STRING)
         ), chr(10) || chr(10)) AS srt
  FROM params
),
parsed AS (
  SELECT doc_id, n_cues,
         regexp_extract_all(srt, '(\\d+):(\\d+):(\\d+),(\\d+)', 0) AS tcs
  FROM built
),
ms AS (
  SELECT doc_id, n_cues,
         list_transform(tcs, tc ->
           CAST(regexp_extract(tc, '^(\\d+):', 1) AS BIGINT) * 3600000
           + CAST(regexp_extract(tc, ':(\\d+):', 1) AS BIGINT) * 60000
           + CAST(regexp_extract(tc, ':(\\d+),', 1) AS BIGINT) * 1000
           + CAST(regexp_extract(tc, ',(\\d+)$', 1) AS BIGINT)) AS t
  FROM parsed
)
SELECT doc_id,
       CAST(n_cues AS INT) AS n_cues,
       CAST(len(t) AS INT) AS n_timecodes,
       CAST(t[1] AS BIGINT) AS first_start_ms,
       CAST(n_cues * 1500 AS BIGINT) AS total_cue_ms
FROM ms
"""


@register("text_srt_cues", oracle=_SRT_SQL, tags=("text", "multimodal"))
def text_srt_cues(spark, sf_dir):
    """SRT subtitle parsing (r10) — subtitles are the aligned-text
    side of every video training corpus, and .srt is their lingua
    franca: cue index, 'HH:MM:SS,mmm --> HH:MM:SS,mmm' timecode line,
    text. Both engines BUILD deterministic .srt documents and PARSE
    them back with the same regexes (timecode extraction +
    millisecond arithmetic), so agreement proves the format handling
    round trip, zero-padding included — the parse is what a caption-
    alignment pipeline actually runs. Narrow string maps in the scan
    stage; no shuffle beyond the result."""
    params = t(spark, sf_dir, "documents").select(
        "doc_id", (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("n_cues")
    )
    built = params.select(
        "doc_id",
        "n_cues",
        F.expr(
            """array_join(transform(sequence(0, n_cues - 1), i ->
              concat(
                CAST(i + 1 AS STRING), char(10),
                lpad(CAST(((doc_id * 131 + i * 2000) div 3600000) % 24 AS STRING), 2, '0'), ':',
                lpad(CAST(((doc_id * 131 + i * 2000) div 60000) % 60 AS STRING), 2, '0'), ':',
                lpad(CAST(((doc_id * 131 + i * 2000) div 1000) % 60 AS STRING), 2, '0'), ',',
                lpad(CAST((doc_id * 131 + i * 2000) % 1000 AS STRING), 3, '0'),
                ' --> ',
                lpad(CAST(((doc_id * 131 + i * 2000 + 1500) div 3600000) % 24 AS STRING), 2, '0'), ':',
                lpad(CAST(((doc_id * 131 + i * 2000 + 1500) div 60000) % 60 AS STRING), 2, '0'), ':',
                lpad(CAST(((doc_id * 131 + i * 2000 + 1500) div 1000) % 60 AS STRING), 2, '0'), ',',
                lpad(CAST((doc_id * 131 + i * 2000 + 1500) % 1000 AS STRING), 3, '0'),
                char(10), 'cue text ', CAST(i AS STRING))),
              concat(char(10), char(10)))"""
        ).alias("srt"),
    )
    parsed = built.select(
        "doc_id",
        "n_cues",
        F.expr(
            r"regexp_extract_all(srt, '(\\d+):(\\d+):(\\d+),(\\d+)', 0)"
        ).alias("tcs"),
    )
    ms = parsed.select(
        "doc_id",
        "n_cues",
        F.expr(
            r"""transform(tcs, tc ->
              CAST(regexp_extract(tc, '^(\\d+):', 1) AS BIGINT) * 3600000
              + CAST(regexp_extract(tc, ':(\\d+):', 1) AS BIGINT) * 60000
              + CAST(regexp_extract(tc, ':(\\d+),', 1) AS BIGINT) * 1000
              + CAST(regexp_extract(tc, ',(\\d+)$', 1) AS BIGINT))"""
        ).alias("t"),
    )
    return ms.select(
        "doc_id",
        F.col("n_cues").cast("int").alias("n_cues"),
        F.size("t").cast("int").alias("n_timecodes"),
        F.element_at("t", 1).cast("bigint").alias("first_start_ms"),
        (F.col("n_cues") * 1500).cast("bigint").alias("total_cue_ms"),
    )


# --- persisted inverted index (r12) --------------------------------------------------------------


@register("text_index_bm25_probe", oracle=_BM25_SQL, tags=("text", "similarity"))
def text_index_bm25_probe(spark, sf_dir):
    """Persisted inverted-index probe ≡ full-scan BM25 — the lexical
    twin of `sim_incremental_index_topk`: the corpus arrives as two
    DISJOINT batches, each tokenized once and appended to a
    bucket-partitioned postings store (operators/textindex.py), and
    the 5-term query answers from the STORE — the scan prunes to the
    query terms' bucket directories, df comes from the fetched
    postings, N/avgdl from the O(batches) stats rows. The oracle is
    `text_bm25_search`'s full-scan SQL over the raw corpus, so
    equality proves the strongest index property: probe result ==
    scan result, bit for bit, including scores. At 100 TB the index
    pass happens once per NEW batch; every query afterward touches
    |terms| directories instead of the corpus."""
    import os as _os
    import shutil as _shutil

    from etlalchemy_spark.operators.textindex import (
        append_text_index,
        probe_text_index,
    )
    from etlalchemy_spark.queries._util import scratch_dir

    d = _spread_docs(spark, sf_dir)  # append's tokenize stage is map-bound
    store = _os.path.join(scratch_dir("text_index", sf_dir), "store")
    _shutil.rmtree(store, ignore_errors=True)
    append_text_index(store, d.where(F.col("doc_id") % 3 != 0), "doc_id", "text")
    append_text_index(store, d.where(F.col("doc_id") % 3 == 0), "doc_id", "text")
    return probe_text_index(spark, store, list(_BM25_TERMS), k=20)


@register("text_index_compaction", oracle=_BM25_SQL, tags=("text", "similarity"))
def text_index_compaction(spark, sf_dir):
    """Inverted-index compaction invariant, oracle-gated: after many
    small appends (five doc_id slices here) the store's
    files-per-bucket tracks append history — compaction rewrites each
    bucket directory as one well-sized file behind the checked rename
    swap, and the probe of the compacted store must still equal the
    full-scan BM25 oracle. The version audit refuses NULL/foreign
    rows; postings are NOT deduplicated (the append-time disjointness
    guard owns uniqueness — silently dropping rows here would mask a
    double-counted stats sidecar)."""
    import os as _os
    import shutil as _shutil

    from etlalchemy_spark.operators.textindex import (
        append_text_index,
        compact_text_index,
        probe_text_index,
    )
    from etlalchemy_spark.queries._util import scratch_dir

    d = _spread_docs(spark, sf_dir)  # append's tokenize stage is map-bound
    store = _os.path.join(scratch_dir("text_index_compact", sf_dir), "store")
    _shutil.rmtree(store, ignore_errors=True)
    for r in range(5):
        append_text_index(store, d.where(F.col("doc_id") % 5 == r), "doc_id", "text")
    compact_text_index(spark, store)
    return probe_text_index(spark, store, list(_BM25_TERMS), k=20)
