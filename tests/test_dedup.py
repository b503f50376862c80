"""Unit tests for dedup operators with PLANTED duplicates (the fixture
corpus has no true near-dups, so recall is proven here)."""

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing in the old oak tree near the river "
    "as morning light spreads across the quiet valley touching every rooftop "
    "and the baker opens his shop to the smell of warm bread while children "
    "walk slowly to school along the cobbled street past the fountain square"
)
# one-word edit in a ~60-word doc → Jaccard ≈ 0.85: high enough that
# 8×4 LSH banding recall is structurally certain (hash is deterministic)
NEAR = BASE.replace("lazy dog", "sleepy dog")
FAR = (
    "completely different content about spark shuffles partitions joins "
    "aggregations windows and the catalyst optimizer rewriting query plans at scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)],  # 4 == exact dup of 1
        "doc_id long, text string",
    )


def test_exact_dedup_deterministic(spark):
    df = spark.createDataFrame(
        [(3, "k"), (1, "k"), (2, "other")], "id long, key string"
    )
    out = exact_dedup(df, ["key"], ["id"]).collect()
    assert sorted(r.id for r in out) == [1, 2]  # keeps MIN id per key


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    sh = {r.shingle for r in word_shingles(df, "doc_id", "text", k=5).collect()}
    assert sh == {"a b c d e", "b c d e f"}


def test_shingles_short_doc(spark):
    # doc shorter than k → one (partial) shingle, no crash
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    sh = word_shingles(df, "doc_id", "text", k=5).collect()
    assert len(sh) == 1 and sh[0].shingle == "a b"


def test_ngram_jaccard_finds_planted_pair(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", k=5, threshold=0.1).collect()}
    assert pairs[(1, 4)] == 1.0          # exact dup
    assert pairs[(1, 2)] > 0.5           # one-word edit
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated


def test_minhash_lsh_recalls_planted_pair(spark, docs):
    got = {(r.id_a, r.id_b) for r in
           minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert (1, 4) in got and (1, 2) in got and (2, 4) in got
    assert not any(3 in p for p in got)


def test_minhash_jaccard_matches_exact(spark, docs):
    # LSH-verified jaccard equals the exact operator's jaccard
    exact = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.01).collect()}
    lsh = {(r.id_a, r.id_b): r.jaccard for r in
           minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    for pair, j in lsh.items():
        assert exact[pair] == j


def test_simhash_identical_and_near(spark, docs):
    sigs = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[4]  # identical text → identical signature
    assert 0 <= sigs[1] < (1 << 32)
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=6).collect()}
    assert pairs[(1, 4)] == 0
    assert (1, 2) in pairs  # near-dup within hamming 6


# --- cross-engine-exact variants -------------------------------------------

from etlalchemy_spark.operators.dedup import (
    minhash_lsh_pairs_exact,
    simhash_exact,
    simhash_pairs_from_sigs,
)


def test_simhash_exact_near_dup_low_hamming(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " tokX"
    far = " ".join(f"zzz{i}" for i in range(60))
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "id int, body string")
    sigs = {r["id"]: r["simhash"] for r in simhash_exact(df, "id", "body").collect()}
    ham_near = bin(sigs[1] ^ sigs[2]).count("1")
    ham_far = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham_near < ham_far


def test_minhash_lsh_exact_finds_duplicate(spark):
    base = " ".join(f"w{i}" for i in range(100))
    dup = " ".join(f"w{i}" for i in range(99)) + " wX"
    other = " ".join(f"q{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, base), (2, dup), (3, other)], "doc_id int, text string"
    )
    pairs = minhash_lsh_pairs_exact(df, "doc_id", "text", threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] > 0.9


# --- incremental LSH vs a persisted signature store -------------------------

from etlalchemy_spark.operators.dedup import (
    incremental_lsh_matches,
    lsh_band_store,
)


def _inc_corpus(spark):
    base = " ".join(f"w{i}" for i in range(100))
    dup = " ".join(f"w{i}" for i in range(99)) + " wX"
    other = " ".join(f"q{i}" for i in range(100))
    store = spark.createDataFrame(
        [(1, base), (3, other)], "doc_id int, text string"
    )
    new = spark.createDataFrame([(2, dup), (4, other + " qY")], "doc_id int, text string")
    return store, new


def test_incremental_lsh_store_reuse_matches_recompute(spark):
    store, new = _inc_corpus(spark)
    recomputed = incremental_lsh_matches(
        store, new, "doc_id", "text", threshold=0.5
    ).collect()
    bands_tbl = lsh_band_store(store, "doc_id", "text")
    assert bands_tbl.columns == ["doc_id", "band", "band_key", "sig_version"]
    reused = incremental_lsh_matches(
        store, new, "doc_id", "text", threshold=0.5, store_bands=bands_tbl
    ).collect()
    key = lambda r: (r["new_id"], r["store_id"])
    assert sorted(map(key, reused)) == sorted(map(key, recomputed))
    # the planted near-dup (new 2 vs store 1) and the planted
    # store-overlap (new 4 vs store 3) are both found, batch-vs-store only
    assert sorted(map(key, reused)) == [(2, 1), (4, 3)]


def test_incremental_lsh_store_roundtrips_through_parquet(spark, tmp_path):
    store, new = _inc_corpus(spark)
    p = str(tmp_path / "band_store")
    lsh_band_store(store, "doc_id", "text").write.parquet(p)
    reread = spark.read.parquet(p)
    out = incremental_lsh_matches(
        store, new, "doc_id", "text", threshold=0.5, store_bands=reread
    ).collect()
    assert sorted((r["new_id"], r["store_id"]) for r in out) == [(2, 1), (4, 3)]


def test_incremental_lsh_rejects_wrong_sig_version(spark):
    store, new = _inc_corpus(spark)
    v1 = lsh_band_store(store, "doc_id", "text").withColumn(
        "sig_version", F.lit("v1/murmur3")
    )
    with pytest.raises(ValueError, match="sig_version"):
        incremental_lsh_matches(
            store, new, "doc_id", "text", store_bands=v1
        ).collect()


def test_incremental_lsh_rejects_parameter_mismatch(spark):
    # same FORMAT, different banding parameters: band keys are
    # incompatible and would silently match nothing — must be loud
    store, new = _inc_corpus(spark)
    wide = lsh_band_store(store, "doc_id", "text", num_hashes=32, bands=8)
    with pytest.raises(ValueError, match="sig_version"):
        incremental_lsh_matches(
            store, new, "doc_id", "text", num_hashes=16, bands=4, store_bands=wide
        ).collect()


def test_incremental_lsh_rejects_unversioned_store(spark):
    store, new = _inc_corpus(spark)
    bare = lsh_band_store(store, "doc_id", "text").drop("sig_version")
    with pytest.raises(ValueError, match="unversioned"):
        incremental_lsh_matches(
            store, new, "doc_id", "text", store_bands=bare
        ).collect()


# --- the closed steady-state loop: replay == one-shot ------------------------

from etlalchemy_spark.operators.dedup import incremental_dedup_step


def test_incremental_step_finds_cross_and_within_pairs(spark):
    base = " ".join(f"w{i}" for i in range(100))
    store = spark.createDataFrame([(1, base)], "doc_id int, text string")
    # batch carries a near-dup of the store doc AND an in-batch pair
    new = spark.createDataFrame(
        [(2, base + " wX"), (4, base + " wY")], "doc_id int, text string"
    )
    matches, updated = incremental_dedup_step(
        store, new, "doc_id", "text", threshold=0.5
    )
    got = sorted((r["id_a"], r["id_b"]) for r in matches.collect())
    assert got == [(1, 2), (1, 4), (2, 4)]  # cross ×2 + within ×1
    # store append: updated bands cover all three docs, one tag
    assert sorted(
        r["doc_id"] for r in updated.select("doc_id").distinct().collect()
    ) == [1, 2, 4]
    assert updated.select("sig_version").distinct().count() == 1


def test_incremental_replay_equals_one_shot(spark):
    """The 100 TB steady-state invariant: batches replayed through
    incremental_dedup_step from an EMPTY store yield exactly the
    one-shot full-corpus pair set, each pair reported exactly once (in
    the step where its second doc arrives)."""
    from conftest import SF_DIR

    from etlalchemy_spark.operators.dedup import minhash_lsh_pairs_exact

    docs = (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 2 == 0)  # halve for test runtime
    )
    one_shot = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_exact(docs, "doc_id", "text", threshold=0.2).collect()
    }
    assert one_shot  # the fixture corpus must actually contain near-dups

    seen: set = set()
    acc = docs.where(F.lit(False))
    store_bands = lsh_band_store(acc, "doc_id", "text")
    for b in range(3):
        batch = docs.where(F.col("doc_id") % 3 == b)
        matches, store_bands = incremental_dedup_step(
            acc, batch, "doc_id", "text", threshold=0.2, store_bands=store_bands
        )
        step_pairs = [(r["id_a"], r["id_b"]) for r in matches.collect()]
        assert not (set(step_pairs) & seen)  # no pair reported twice
        seen.update(step_pairs)
        acc = acc.unionByName(batch)
    assert seen == one_shot


def test_incremental_step_rejects_absorbed_batch(spark):
    """Replaying a batch whose bands were already absorbed into the
    store must fail loudly — silently it would report every shared doc
    as its own duplicate and double its band rows."""
    base = " ".join(f"w{i}" for i in range(100))
    store = spark.createDataFrame([(1, base)], "doc_id int, text string")
    new = spark.createDataFrame([(2, base + " wX")], "doc_id int, text string")
    _, updated = incremental_dedup_step(store, new, "doc_id", "text", threshold=0.5)
    with pytest.raises(ValueError, match="already absorbed|already present"):
        incremental_dedup_step(
            store.unionByName(new), new, "doc_id", "text",
            threshold=0.5, store_bands=updated,
        )
