"""Independent cross-checks for the r5 retrieval/decontamination
queries: pure-Python reference implementations over the sf0.001
corpus, written from the definitions (not from the Spark code or the
DuckDB oracles), so a shared misunderstanding in both engine
formulations can't hide."""

import re

import pyarrow.parquet as pq
import pytest

from etlalchemy_spark.registry import all_queries

from conftest import SF_DIR


def _docs():
    tb = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(tb.column("doc_id").to_pylist(), tb.column("text").to_pylist()))


def _shingles(text, k=5):
    words = re.split(r"\s+", text.strip())
    if len(words) <= k:
        return {" ".join(words[i : i + k]) for i in [0]}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _bucket(doc_id, salt="sp:"):
    import hashlib

    h = hashlib.md5(f"{salt}{doc_id}".encode()).digest()
    return (int.from_bytes(h[:8], "big") >> 4) % 1_000_000


def test_decontamination_matches_python_reference(spark):
    q = all_queries()["text_decontamination"]
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in q.fn(spark, SF_DIR).collect()
    }

    docs = _docs()
    train = [(i, t) for i, t in docs if _bucket(i) < 800_000]
    eval_sh = set()
    for i, t in docs:
        if _bucket(i) >= 900_000:
            eval_sh |= _shingles(t)
    want = {}
    for i, t in train:
        sh = _shingles(t)
        n_contam = len(sh & eval_sh)
        if n_contam > 0:
            want[i] = (len(sh), n_contam)
    assert got == want


def test_bm25_matches_python_reference(spark):
    from etlalchemy_spark.queries.text import _BM25_TERMS

    q = all_queries()["text_bm25_search"]
    got = [(r["doc_id"], r["score"]) for r in q.fn(spark, SF_DIR).collect()]

    docs = _docs()
    tok = {
        i: [w for w in re.split(r"[^a-z]+", t.lower()) if w] for i, t in docs
    }
    n_docs = len(docs)
    avgdl = sum(len(v) for v in tok.values()) / n_docs
    df = {
        term: sum(1 for v in tok.values() if term in v) for term in _BM25_TERMS
    }
    scores = {}
    for i, toks in tok.items():
        s = 0.0
        hit = False
        for term in _BM25_TERMS:
            tf = toks.count(term)
            if tf == 0 or df[term] == 0:
                s += 0.0
                continue
            hit = True
            # k1=1.2, b=0.75 — written with the same literals the
            # engine formulations use (2.2, 0.25, 0.75) so ulp-level
            # drift can't reorder near-ties
            idf = (n_docs - df[term] + 0.5) / (df[term] + 0.5)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(toks) / avgdl)))
        if hit:
            scores[i] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        # the reference sums in a different association order than the
        # engine's fixed slot chain — identical up to float reassociation
        assert gs == pytest.approx(ws, rel=1e-12)


def test_recall_audit_excludes_query_vector(spark):
    """The audit must measure neighbor recall: denominator = exact
    neighbor-set size (k-1 after removing the query vector), overlap
    never counts vec_id 0, and recall stays within [0, 1]."""
    row = all_queries()["sim_lsh_recall_audit"].fn(spark, SF_DIR).collect()[0]
    assert row["n_true_neighbors"] == 9
    assert 0 <= row["n_overlap"] <= row["n_true_neighbors"]
    assert row["recall"] == pytest.approx(
        row["n_overlap"] / row["n_true_neighbors"]
    )
