"""BPE trainer + greedy tokenizer (operators/bpe.py): exactness vs an
independent brute-force reference, Spark/DuckDB unroll agreement, and
the invariants that make the subword pipeline safe to ship."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.bpe import (
    MAX_WORD_LEN,
    bpe_vocab,
    tokenize_sql,
    tokenize_words,
    train_bpe,
    word_counts,
)


def _reference_bpe(counts, n_merges):
    """Independent reference: same spec, different implementation —
    rebuilds pair stats from scratch with tuple-keyed dicts and uses
    an explicit sort instead of min()."""
    words = {w: tuple(w) for w, _ in counts}
    freq = dict(counts)
    out = []
    for _ in range(n_merges):
        stats = {}
        for w, sym in words.items():
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] = stats.get((sym[i], sym[i + 1]), 0) + freq[w]
        if not stats:
            break
        ranked = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), _ = ranked[0]
        out.append((a, b))
        nxt = {}
        for w, sym in words.items():
            res, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            nxt[w] = tuple(res)
        words = nxt
    return out


def test_trainer_matches_brute_force_reference():
    corpus = [
        ("lower", 6), ("low", 5), ("newest", 7), ("widest", 3),
        ("west", 4), ("toast", 2), ("roast", 2), ("lowly", 1),
    ]
    assert train_bpe(corpus, 12) == _reference_bpe(corpus, 12)


def test_trainer_tie_break_is_lexicographic():
    # every pair appears exactly once: argmax must take ('a','b')
    merges = train_bpe([("ab", 1), ("cd", 1), ("ef", 1)], 1)
    assert merges == [("a", "b")]


def test_trainer_greedy_left_to_right_overlap():
    # 'aaa' under merge (a,a): greedy takes positions (0,1), leaving a
    # lone 'a' — pair counts for round 2 must see ('aa','a'), not ('a','aa')
    merges = train_bpe([("aaa", 10)], 2)
    assert merges == [("a", "a"), ("aa", "a")]


def test_tokenize_words_greedy_longest_match(spark):
    vocab = ["ab", "abc", "bc"]
    df = spark.createDataFrame([("abcd",), ("abd",), ("bcd",)], "word string")
    got = {r["word"]: r["tokens"] for r in tokenize_words(df, "word", vocab).collect()}
    assert got == {"abcd": "abc|d", "abd": "ab|d", "bcd": "bc|d"}


def test_tokenize_concat_reconstructs_word(spark):
    rng = random.Random(9)
    words = [
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 20)))
        for _ in range(50)
    ]
    vocab = ["ab", "cd", "abc", "fgh", "de"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    for r in tokenize_words(df, "word", vocab).collect():
        assert "".join(r["tokens"].split("|")) == r["word"][:MAX_WORD_LEN]
        for tok in r["tokens"].split("|"):
            assert tok in vocab or len(tok) == 1


def test_spark_and_duckdb_unrolls_agree(spark):
    rng = random.Random(17)
    words = sorted(
        {
            "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 18)))
            for _ in range(200)
        }
    )
    vocab = bpe_vocab(train_bpe([(w, 1) for w in words], 16))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (r["n_tokens"], r["tokens"])
        for r in tokenize_words(df, "word", vocab).collect()
    }
    values = ", ".join(f"('{w}')" for w in words)
    sql = (
        f"WITH words AS (SELECT * FROM (VALUES {values}) AS t(word)),\n"
        + tokenize_sql(vocab, "words")
        + "\nSELECT * FROM bpe_tok"
    )
    for word, n, toks in duckdb.sql(sql).fetchall():
        assert got[word] == (n, toks), word


def test_train_query_is_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = word_counts(docs, "text")
    top = [(r["word"], r["cnt"]) for r in wc.orderBy(F.desc("cnt"), "word").limit(512).collect()]
    assert train_bpe(top, 32) == train_bpe(list(top), 32)
    # merged tokens never exceed the unroll bound
    assert all(len(a + b) <= MAX_WORD_LEN for a, b in train_bpe(top, 32))
