"""Unit tests for text-analysis operators."""

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.text import (
    bpe_ish_token_count,
    lang_id,
    md5_fingerprint,
    normalize_text,
    quality_features,
    quality_score,
    shingle_min_fingerprint,
    token_count,
)


def _one(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr(F.col("text")).alias("v"))
        .collect()[0]
        .v
    )


@pytest.mark.parametrize(
    "text,n", [("a b c", 3), ("  a   b  ", 2), ("", 0), ("   ", 0), ("one", 1)]
)
def test_token_count(spark, text, n):
    assert _one(spark, text, token_count) == n


def test_bpe_ish(spark):
    assert _one(spark, "hello, world!", bpe_ish_token_count) == 4  # hello , world !
    assert _one(spark, "a1b2", bpe_ish_token_count) == 1  # one alnum run


def test_normalize_and_md5(spark):
    assert _one(spark, "  A  b\tC ", normalize_text) == "a b c"
    import hashlib
    assert _one(spark, "Hello  World", md5_fingerprint) == hashlib.md5(b"hello world").hexdigest()


def test_shingle_fingerprint_robust_to_small_edit(spark):
    # identical prefix of shingles → min-md5 likely unchanged by a far edit;
    # at minimum: identical text → identical fingerprint, short text works
    a = _one(spark, "abcdefghij", lambda c: shingle_min_fingerprint(c, k=8))
    b = _one(spark, "abcdefghij", lambda c: shingle_min_fingerprint(c, k=8))
    assert a == b
    short = _one(spark, "abc", lambda c: shingle_min_fingerprint(c, k=8))
    assert short is not None


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog of to in", lang_id) == "en"
    assert _one(spark, "der hund und die katze ist nicht", lang_id) == "de"
    assert _one(spark, "xyzzy plugh", lang_id) == "und"
    # tie between en and fr markers → alphabetically first wins
    assert _one(spark, "the la", lang_id) == "en"


def test_quality_features_and_score(spark):
    df = spark.createDataFrame(
        [("The quick brown fox jumps over the lazy dog and runs to the hills today.",)],
        "text string",
    )
    feats = quality_features(F.col("text"))
    row = df.select(
        feats["n_tokens"].alias("nt"),
        feats["stopword_ratio"].alias("sr"),
        quality_score(feats).alias("q"),
    ).collect()[0]
    assert row.nt == 15
    assert row.sr > 0.2
    assert 0.0 <= row.q <= 1.0
    assert row.q >= 0.7  # clean English sentence scores well


def test_quality_score_penalizes_spam(spark):
    clean = "the quick brown fox jumps over the lazy dog and it is fine today ok"
    spam = "BUY!!! NOW!!! CLICK!!! WIN!!! FREE!!!"
    df = spark.createDataFrame([(1, clean), (2, spam)], "id long, text string")
    feats = quality_features(F.col("text"))
    rows = {r.id: r.q for r in df.select("id", quality_score(feats).alias("q")).collect()}
    assert rows[1] > rows[2]


def test_boilerplate_shingles_cross_doc(spark):
    from etlalchemy_spark.registry import all_queries
    from conftest import SF_DIR

    out = all_queries()["text_boilerplate_shingles"].fn(spark, SF_DIR)
    rows = out.collect()
    assert rows, "near-dup fixture docs must share shingles"
    assert all(r["n_docs"] >= 2 for r in rows)


def test_label_centroids_shape_and_range(spark):
    from etlalchemy_spark.registry import all_queries
    from conftest import SF_DIR

    out = all_queries()["sim_label_centroids"].fn(spark, SF_DIR).collect()
    labels = {r["label"] for r in out}
    dims = {r["dim"] for r in out}
    assert len(out) == len(labels) * 64
    assert dims == set(range(64))
    assert all(abs(r["centroid"]) < 1.0 for r in out)


def test_chargram_quality_short_docs_contribute_nothing(spark):
    """Spark's sequence(1, 0) REVERSES rather than yielding empty; the
    guard must keep <3-char docs out of the trigram stream (DuckDB's
    generate_series(1, 0) is empty, so divergence here would be an
    oracle mismatch on any corpus with short docs)."""
    from pyspark.sql import functions as F

    # same expression shape as text_chargram_quality, on a local frame
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "abcd"), (4, "xyz")], "doc_id long, text string"
    )
    low = F.lower(F.col("text"))
    grams = F.when(
        F.length(low) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(low) - 2),
            lambda i: F.substring(low, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = df.select("doc_id", F.explode(grams).alias("g")).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.doc_id, []).append(r.g)
    assert 1 not in by_id and 2 not in by_id  # short docs: zero rows
    assert by_id[3] == ["abc", "bcd"] and by_id[4] == ["xyz"]
