"""Deduplication operators for large-scale training-data pipelines.

Mandated extension surface (BASELINE.json north star; SURVEY.md Table B):

- exact dedup           — deterministic keep-first via window, or
                          hash-groupBy at scale
- n-gram Jaccard        — exact pairwise similarity via shingle
                          explode + equi-join (the ground truth)
- MinHash + LSH         — shingle → k minhashes → b bands → bucket
                          equi-join → verify: the 100 TB path; candidate
                          generation is linear + one shuffle on band
                          signature, never O(n²)
- SimHash               — 32-bit signature via per-bit token votes;
                          near-dup = small Hamming distance
- embedding near-dup    — random-hyperplane LSH buckets + exact cosine
                          verify within bucket

Everything is built-in DataFrame ops (hash/explode/zip_with/aggregate)
— no Python in the hot path. ``F.hash`` is Murmur3 (engine-specific),
so LSH/SimHash queries are rows-only in the oracle harness while the
exact Jaccard/cosine formulations carry SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition CPU-heavy expression work across the cluster. Small
    fixture files arrive as ONE input split (far under
    maxPartitionBytes), which would serialize shingling/hashing on a
    single core; at real scale inputs already have many splits and this
    hash-repartition just co-locates by id for the joins that follow."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)


# --- exact -----------------------------------------------------------------

def exact_dedup(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Keep exactly one row per key, deterministically (first by
    ``order_by``). ``dropDuplicates`` keeps an *arbitrary* row — fine
    for idempotent pipelines, wrong for reproducible ones."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- shingling -------------------------------------------------------------

def word_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    out: str = "shingle",
    hashed: bool = False,
) -> DataFrame:
    """(id, shingle) pairs: distinct word k-grams of the normalized text.
    Pure expression pipeline: split → sequence → transform → explode.

    CONTRACT: ``df`` must carry ONE ROW PER id (the documents table's
    shape; run ``exact_dedup`` first if ids can repeat). Per-doc
    dedup happens narrowly via ``array_distinct`` on the doc's own
    gram list, so duplicate id rows would emit duplicate (id, shingle)
    pairs and double every count-based consumer — the pre-r5 global
    ``.distinct()`` tolerated that input but paid a corpus-sized
    shuffle for it on every call.

    ``hashed=True`` replaces the shingle string with its xxhash64 —
    shuffle payload drops from ~k words to 8 bytes per shingle, which
    is what the MinHash pipeline joins on at scale (collision odds at
    64 bits are negligible next to MinHash's own error)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(words, i, k), " "))
    if hashed:
        grams = F.transform(grams, lambda g: F.xxhash64(g))
    # Per-doc dedup happens NARROWLY via array_distinct before the
    # explode: (id, shingle) pairs are distinct iff each doc's own
    # shingle list is, so the old explode-then-.distinct() shuffle of
    # the whole shingle stream bought nothing — downstream consumers
    # re-shuffle on shingle (the equi-join) or on id (the signature
    # agg) anyway, never on the (id, shingle) pair.
    return df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias(out))


# --- exact n-gram Jaccard (ground truth; oracle-able) ----------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.1,
) -> DataFrame:
    """All pairs with Jaccard(shingles_a, shingles_b) ≥ threshold via
    shingle equi-join. Exact but quadratic in co-occurring shingles —
    the small-n ground truth that LSH approximates. Output:
    (id_a, id_b, n_inter, jaccard)."""
    df = spread(df, id_col)
    sh = word_shingles(df, id_col, text_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


# --- MinHash + LSH (the scale path) ----------------------------------------

def minhash_signatures(
    sh: DataFrame, id_col: str, shingle_col: str = "shingle", num_hashes: int = 32
) -> DataFrame:
    """k minhashes per doc in ONE aggregation via universal hashing:
    the shingle string is hashed ONCE (xxhash64), then the k
    "permutations" are integer (a·h + b) mod p transforms of that one
    value — k× fewer string hashes than hashing per seed, same MinHash
    guarantees (pairwise-independent family). Output: (id, sig
    array<bigint>).

    SIGNATURE FORMAT v2 (round 2): per-seed Murmur3 ``array<int>``
    signatures from the earlier revision are INCOMPATIBLE with these
    universal-hash ``array<bigint>`` signatures — mixing persisted v1
    signatures or band keys with v2 output yields zero matches. Re-sign
    the corpus rather than mixing formats."""
    # expressions built as single F.expr strings: the column-algebra
    # form costs hundreds of Py4J roundtrips (one per operator node),
    # which dominated this operator's bench time as pure driver-side
    # plan-construction overhead; the parsed trees are identical
    base = F.expr(
        f"((xxhash64({shingle_col}) % {MINHASH_P}) + {MINHASH_P}) % {MINHASH_P}"
    )
    hashed = sh.select(F.col(id_col), base.alias("_h"))
    mins = [
        F.expr(f"min(({a} * _h + {b}) % {MINHASH_P}) AS h{j}")
        for j, (a, b) in enumerate(minhash_params(num_hashes, seed=17))
    ]
    agg = hashed.groupBy(id_col).agg(*mins)
    sig = ", ".join(f"h{j}" for j in range(num_hashes))
    return agg.select(F.col(id_col), F.expr(f"array({sig}) AS sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature (b bands × r rows): docs sharing ANY full band
    become candidates. One explode + one shuffle on (band, band_sig) —
    linear candidate generation, the core LSH trick."""
    # band signature collapsed to ONE bigint (xxhash64 over the slice):
    # the candidate join shuffles 8-byte keys instead of int arrays
    structs = ", ".join(
        f"struct({b} AS band, xxhash64(slice(sig, {b * rows_per_band + 1}, "
        f"{rows_per_band})) AS band_sig)"
        for b in range(bands)
    )
    banded = sigs.select(
        F.col(id_col),
        F.explode(F.expr(f"array({structs})")).alias("bb"),
    ).select(id_col, "bb.band", "bb.band_sig")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH candidates →
    exact-Jaccard verification of candidates only. At 100 TB the
    verify join touches only the candidate set (≈ linear for realistic
    dup rates), never the full cross product."""
    rows_per_band = num_hashes // bands
    # hashed shingles end-to-end: minhash seeds re-hash the 64-bit
    # shingle hash, and the verify join shuffles bigints, not strings
    sh = word_shingles(spread(df, id_col), id_col, text_col, k, hashed=True).cache()
    sigs = minhash_signatures(sh, id_col, num_hashes=num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)

    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash ---------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, out: str = "simhash") -> DataFrame:
    """32-bit SimHash: each token votes ±1 per bit of its hash; the
    signature is the sign vector. Implemented as array arithmetic
    (transform/zip_with/aggregate) over exploded tokens — one groupBy,
    no UDFs. Output: (id, simhash bigint)."""
    tokens = spread(df, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    # static python loop over the 32 bits (shift amounts must be
    # literals) → 32 vote columns, then 32 plain SUM aggregates:
    # partial aggregation map-side, no collect_list, no array shuffle.
    # All built as single F.expr strings — the column-algebra form cost
    # ~200 Py4J roundtrips of pure plan-construction time.
    votes = tokens.select(
        id_col,
        F.expr("hash(tok)").alias("_h"),
    ).select(
        id_col,
        *[
            F.expr(f"IF((shiftright(_h, {i}) & 1) = 1, 1, -1) AS b{i}")
            for i in range(32)
        ],
    )
    summed = votes.groupBy(id_col).agg(
        *[F.expr(f"sum(b{i}) AS s{i}") for i in range(32)]
    )
    sig = " + ".join(f"IF(s{i} > 0, CAST({1 << i} AS BIGINT), 0)" for i in range(32))
    return summed.select(F.col(id_col), F.expr(f"{sig} AS {out}"))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dups by SimHash Hamming distance. Candidate generation
    buckets on each of 4 disjoint 8-bit chunks, then exact bit_count
    verify. Pigeonhole guarantee: ≤ 3 differing bits cannot touch all 4
    chunks, so recall is TOTAL only for max_hamming ≤ 3 — the default.
    Larger thresholds work but miss pairs whose diff bits spread across
    every chunk (raise the chunk count to keep the guarantee)."""
    sigs = simhash(df, id_col, text_col).cache()
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 8).bitwiseAND(F.lit(255)).alias("ck"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.ck")
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "chunk", "ck")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "chunk", "ck")
    return (
        a.join(b, ["chunk", "ck"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- cross-engine-exact MinHash (oracle-able) ------------------------------
#
# The Murmur3/xxhash64 pipeline above is the production path; its
# signatures are engine-specific, so the harness can only rows-check it.
# This variant derives shingle hashes from md5 (identical bytes in every
# engine) and runs the permutations in explicit mod-p arithmetic, making
# the ENTIRE MinHash+LSH pipeline bit-identical across Spark and DuckDB
# — the correctness harness hash-compares it exactly.

MINHASH_P = 2147483647  # 2^31 - 1; keeps a*h + b inside int64


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation parameters, baked as plan
    literals in both the Spark and oracle formulations."""
    state = seed
    out = []
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = 1 + (state >> 33) % (MINHASH_P - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (state >> 33) % MINHASH_P
        out.append((a, b))
    return out


def md5_prefix60(c) -> "F.Column":
    """First 60 bits of md5 as a non-negative BIGINT — the only
    engine-portable 'random' hash both Spark and DuckDB can compute on
    identical UTF-8 bytes. (60 bits so the value parses into a signed
    int64 with headroom.)"""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_signature_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Cross-engine-exact MinHash signature as flat columns
    (id, mh_0..mh_{n-1}): one shingle explode, one hash-groupBy with n
    MIN aggregates (partial+final, single shuffle on id)."""
    sh = word_shingles(spread(df, id_col), id_col, text_col, k)
    hm = (md5_prefix60(F.col("shingle")) % MINHASH_P).alias("_hm")
    # single-string expressions: one Py4J call per aggregate instead of
    # one per operator node (driver-side plan-construction time)
    aggs = [
        F.expr(f"min(({a} * _hm + {b}) % {MINHASH_P}) AS mh_{j}")
        for j, (a, b) in enumerate(minhash_params(num_hashes, seed))
    ]
    return sh.select(F.col(id_col), hm).groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """End-to-end exact-reproducible MinHash-LSH near-dup pairs:
    signature → band keys (rows-per-band concatenated) → band-bucket
    equi-join for candidates → exact Jaccard verify via shingle-set
    intersection. Output (id_a, id_b, jaccard) with jaccard ≥ threshold.

    Scale shape: candidate generation is linear (explode to bands ×
    docs rows, one shuffle on the band key); only candidate PAIRS pay
    the set-intersection verify, and the shingle sets ride along the
    (already shuffled) band join rather than a second corpus scan."""
    sig = minhash_signature_exact(df, id_col, text_col, k, num_hashes, seed)
    kv = sig.select(
        F.col(id_col), F.posexplode(_band_key_array(num_hashes, bands)).alias("band", "bk")
    )
    a = kv.select(F.col(id_col).alias("id_a"), "band", "bk")
    b = kv.select(F.col(id_col).alias("id_b"), "band", "bk")
    cands = (
        a.join(b, ["band", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sh = word_shingles(spread(df, id_col), id_col, text_col, k)
    sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("ss"))
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("ss").alias("ss_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("ss").alias("ss_b"))
    n_inter = F.size(F.array_intersect(F.col("ss_a"), F.col("ss_b")))
    jac = n_inter.cast("double") / (
        F.size("ss_a") + F.size("ss_b") - n_inter
    ).cast("double")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _band_key_array(num_hashes: int, bands: int):
    r = num_hashes // bands
    keys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"CAST(mh_{band * r + i} AS STRING)" for i in range(r))
        + ")"
        for band in range(bands)
    )
    return F.expr(f"array({keys})")


# Format version persisted with every signature/band store. v1 was the
# per-seed Murmur3 array<int> format (round 2); v2 is the current
# universal-hash mod-p format. The persisted tag also carries the
# signature PARAMETERS — a store signed with different k/num_hashes/
# bands/seed builds incompatible band keys and silently matches
# nothing, exactly like a format mismatch, so readers hard-fail on
# either.
SIG_VERSION = 2


def sig_version_tag(
    k: int = 5, num_hashes: int = 16, bands: int = 4, seed: int = 42
) -> str:
    """The full compatibility tag: format version + every parameter
    that changes the band keys."""
    return f"v{SIG_VERSION}/k{k}/n{num_hashes}/b{bands}/s{seed}"


def lsh_band_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """The PERSISTABLE signature store for incremental dedup: flat
    (id, band, band_key, sig_version) rows — write once per corpus
    epoch, reuse for every incoming batch. ``sig_version`` carries the
    format AND parameters (see sig_version_tag) so a store signed one
    way can never be silently banded against another."""
    sig = minhash_signature_exact(df, id_col, text_col, k, num_hashes, seed)
    return sig.select(
        F.col(id_col),
        F.posexplode(_band_key_array(num_hashes, bands)).alias("band", "band_key"),
    ).withColumn("sig_version", F.lit(sig_version_tag(k, num_hashes, bands, seed)))


def _check_sig_version(store_bands: DataFrame, expected_tag: str) -> DataFrame:
    """Fail loudly if a persisted band store carries a different
    signature format OR parameters. Costs one column-pruned pass over
    the store's sig_version column (the distinct collapses map-side to
    ≤ a few rows); matching silently against an incompatible store
    would cost the whole corpus its dedup."""
    if "sig_version" not in store_bands.columns:
        raise ValueError(
            "band store has no sig_version column — refusing to match "
            f"against an unversioned store (expected {expected_tag})"
        )
    versions = sorted(
        str(r[0]) for r in store_bands.select("sig_version").distinct().collect()
    )
    if versions not in ([], [expected_tag]):
        raise ValueError(
            f"band store sig_version {versions} != expected "
            f"{expected_tag!r}: incompatible signatures match nothing — "
            "re-sign the corpus instead"
        )
    return store_bands


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, ss=collect_set(shingle)) — the verify-side operand shared
    by every candidates-then-exact-Jaccard pipeline in this module."""
    return (
        word_shingles(spread(df, id_col), id_col, text_col, k)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("ss"))
    )


def _jaccard_verify_pairs(
    cands: DataFrame,
    left_key: str,
    left_sets: DataFrame,
    right_key: str,
    right_sets: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verify of candidate pairs against ``_shingle_sets``
    operands — the single definition of the candidates⋈sets⋈sets filter
    the incremental pipelines share (one copy, no drift)."""
    sl = left_sets.select(F.col(id_col).alias(left_key), F.col("ss").alias("ss_l"))
    sr = right_sets.select(F.col(id_col).alias(right_key), F.col("ss").alias("ss_r"))
    n_inter = F.size(F.array_intersect(F.col("ss_l"), F.col("ss_r")))
    jac = n_inter.cast("double") / (
        F.size("ss_l") + F.size("ss_r") - n_inter
    ).cast("double")
    return (
        cands.join(sl, left_key)
        .join(sr, right_key)
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
    )


def incremental_lsh_matches(
    store: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    seed: int = 42,
    store_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup dedup against a SIGNATURE STORE: only the
    NEW batch is matched against the already-signed corpus (new×new
    pairs are a separate concern) — the steady-state shape of corpus
    dedup at 100 TB, where cost must scale with the BATCH, not the
    corpus. Pass ``store_bands`` (a persisted ``lsh_band_store`` table,
    version-checked against SIG_VERSION) to skip re-signing the corpus;
    without it the store's bands are recomputed in-plan. The Jaccard
    verify re-shingles only the store docs that appear as candidates
    (left-semi restriction), so verify cost also scales with the batch.
    Output (new_id, store_id, jaccard ≥ threshold)."""
    if store_bands is None:
        store_bands = lsh_band_store(store, id_col, text_col, k, num_hashes, bands, seed)
    else:
        store_bands = _check_sig_version(
            store_bands, sig_version_tag(k, num_hashes, bands, seed)
        )
    sig_new = minhash_signature_exact(new, id_col, text_col, k, num_hashes, seed)
    kv_store = store_bands.select(
        F.col(id_col).alias("store_id"), "band", F.col("band_key").alias("bk")
    )
    kv_new = sig_new.select(
        F.col(id_col).alias("new_id"),
        F.posexplode(_band_key_array(num_hashes, bands)).alias("band", "bk"),
    )
    cands = kv_new.join(kv_store, ["band", "bk"]).select("new_id", "store_id").distinct()

    sets_new = _shingle_sets(new, id_col, text_col, k)
    # only candidate store docs are re-shingled for the verify: at
    # steady state the candidate set is batch-sized, not corpus-sized.
    # (left_semi is insensitive to duplicate right rows — no distinct)
    store_hits = store.join(
        cands.select(F.col("store_id").alias(id_col)), id_col, "left_semi"
    )
    sets_store = _shingle_sets(store_hits, id_col, text_col, k)
    return _jaccard_verify_pairs(
        cands, "new_id", sets_new, "store_id", sets_store, id_col, threshold
    ).select("new_id", "store_id", "jaccard")


def incremental_dedup_step(
    store: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    seed: int = 42,
    store_bands: DataFrame | None = None,
    check_disjoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """ONE steady-state step of corpus dedup — the complete loop the
    100 TB pipeline runs per arriving batch. Returns
    ``(matches, updated_store_bands)``:

    - ``matches``: every near-dup pair the batch introduces, i.e.
      batch×store pairs AND in-batch batch×batch pairs, as
      ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` — the same
      orientation as ``minhash_lsh_pairs_exact``. Replayed over
      consecutive batches starting from an empty store, the union of
      per-step matches is EXACTLY the one-shot full-corpus pair set
      (tests/test_dedup_props.py replays this invariant), because a
      pair's first-arriving doc is in some batch's store by the time
      its partner arrives.
    - ``updated_store_bands``: the persisted band store plus the
      batch's bands (same version tag) — write this back and the next
      step never re-reads the corpus.

    Cost shape: the batch is signed ONCE (``new_bands`` feeds the
    cross join, the self join, and the store append); the store side
    contributes only its persisted band rows to the equi-join plus the
    re-shingling of candidate-hit docs (left-semi restricted), so each
    step scales with the batch, never the corpus. "Signed once" is
    literal for the IN-STEP consumers: the batch-sized intermediates
    consumed by more than one branch (bands, cross candidates, shingle
    sets) end in lazy localCheckpoints — without the cuts Spark
    recomputes each subtree per consumer (~1.5x the step cost at
    sf0.1). The RETURNED ``updated_store_bands`` is deliberately built
    from the un-checkpointed band plan instead: checkpoint blocks are
    non-replicated executor-local state, and a persisted store must
    never depend on them (an executor loss would make the store
    unrecoverable) — writing it back re-signs the batch once, which is
    batch-sized and fully recomputable. On the ``store_bands=None``
    convenience path the corpus bands are likewise left un-checkpointed
    (corpus-sized state does not belong in the block manager); that
    path signs the corpus once per materialized output — production
    passes the persisted store.

    Requires ``store ∩ new = ∅`` on ``id_col`` (a doc can't be its own
    store partner); with disjoint sides the cross and within pair sets
    are disjoint by construction, so the union needs no dedup shuffle.
    ``check_disjoint`` (default on) enforces this against the band
    store — one column-pruned pass over its id column — because the
    likeliest violation is real: a batch replayed after its bands were
    already absorbed. Silently, that replay would emit every batch doc
    as its own duplicate and double its band rows in the store."""
    tag = sig_version_tag(k, num_hashes, bands, seed)
    inline_bands = store_bands is None
    if inline_bands:
        store_bands = lsh_band_store(store, id_col, text_col, k, num_hashes, bands, seed)
    else:
        store_bands = _check_sig_version(store_bands, tag)
    if check_disjoint:
        # probe the cheapest id source: on the convenience path the
        # store DataFrame's id column (probing the in-plan band store
        # would sign the whole corpus just to sample five ids); on the
        # persisted path the band store's column-pruned id column (the
        # store DataFrame may be the bigger scan there)
        id_src = store if inline_bands else store_bands
        overlap = [
            r[0]
            for r in id_src.select(id_col)
            .join(new.select(id_col), id_col, "left_semi")
            .limit(5)
            .collect()
        ]
        if overlap:
            raise ValueError(
                f"incremental_dedup_step: batch ids already present in "
                f"the band store (sample: {overlap}) — this batch (or "
                "part of it) was already absorbed. Re-running it would "
                "report every shared doc as its own duplicate and "
                "double its band rows; drop the already-absorbed ids "
                "first (check_disjoint=False skips this guard)."
            )
    new_bands_plan = lsh_band_store(new, id_col, text_col, k, num_hashes, bands, seed)
    new_bands = new_bands_plan.localCheckpoint(eager=False)

    kv_new = new_bands.select(
        F.col(id_col).alias("new_id"), "band", F.col("band_key").alias("bk")
    )
    kv_store = store_bands.select(
        F.col(id_col).alias("store_id"), "band", F.col("band_key").alias("bk")
    )
    cross_c = (
        kv_new.join(kv_store, ["band", "bk"])
        # belt-and-braces against an overlap that slipped past the
        # guard: a doc is never its own near-dup
        .where(F.col("new_id") != F.col("store_id"))
        .select("new_id", "store_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = kv_new.select(F.col("new_id").alias("id_a"), "band", "bk")
    b = kv_new.select(F.col("new_id").alias("id_b"), "band", "bk")
    within_c = (
        a.join(b, ["band", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sets_new = _shingle_sets(new, id_col, text_col, k).localCheckpoint(eager=False)
    # (left_semi is insensitive to duplicate right rows — no distinct)
    store_hits = store.join(
        cross_c.select(F.col("store_id").alias(id_col)), id_col, "left_semi"
    )
    sets_store = _shingle_sets(store_hits, id_col, text_col, k)

    cross_pairs = _jaccard_verify_pairs(
        cross_c, "new_id", sets_new, "store_id", sets_store, id_col, threshold
    ).select(
        F.least("new_id", "store_id").alias("id_a"),
        F.greatest("new_id", "store_id").alias("id_b"),
        "jaccard",
    )
    within_pairs = _jaccard_verify_pairs(
        within_c, "id_a", sets_new, "id_b", sets_new, id_col, threshold
    ).select("id_a", "id_b", "jaccard")
    matches = cross_pairs.unionByName(within_pairs)
    return matches, store_bands.unionByName(new_bands_plan)


def simhash_exact(df: DataFrame, id_col: str, text_col: str, out: str = "simhash") -> DataFrame:
    """Cross-engine-exact SimHash(32): same vote shape as ``simhash``
    but token bits come from the portable md5 prefix instead of
    Murmur3, so any engine reproduces the signature bit-for-bit."""
    tokens = spread(df, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    h32 = (md5_prefix60(F.col("tok")) % F.lit(4294967296)).alias("_h32")
    votes = tokens.select(id_col, h32).select(
        id_col,
        *[
            F.expr(f"IF((shiftright(_h32, {i}) & 1) = 1, 1, -1) AS b{i}")
            for i in range(32)
        ],
    )
    summed = votes.groupBy(id_col).agg(
        *[F.expr(f"sum(b{i}) AS s{i}") for i in range(32)]
    )
    sig = " + ".join(f"IF(s{i} > 0, CAST({1 << i} AS BIGINT), 0)" for i in range(32))
    return summed.select(F.col(id_col), F.expr(f"{sig} AS {out}"))


def simhash_pairs_from_sigs(
    sigs: DataFrame, id_col: str, sig_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """Hamming-≤k pairs from precomputed signatures: 4×8-bit chunk
    buckets (pigeonhole-complete for k ≤ 3) + exact bit_count verify."""
    chunks = sigs.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(sig_col, c * 8).bitwiseAND(F.lit(255)).alias("ck"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, sig_col, "cc.chunk", "cc.ck")
    a = chunks.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"), "chunk", "ck")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"), "chunk", "ck")
    return (
        a.join(b, ["chunk", "ck"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    theta_num: int = 3,
    theta_den: int = 5,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= theta_num/theta_den via
    PREFIX FILTERING (the ppjoin idea): order each doc's shingles by
    ascending global document-frequency; if J(A,B) >= theta the two
    docs MUST share a shingle within their first
    |T| - ceil(theta*|T|) + 1 shingles, so only prefix-shingle
    collisions become candidates — the quadratic stage runs on rare
    shingles instead of the whole inverted index. Candidates then get
    an exact integer-arithmetic Jaccard verify (cross-multiplied
    threshold, no float compare). Lossless: returns exactly the pairs
    an exhaustive join would.

    Shuffles: shingle explode → df-count aggregate, per-doc rank
    window, prefix self-join on shingle, candidate-restricted
    intersection join keyed (doc, shingle). All joins carry integer
    ids + one shingle string; at scale pass hashed shingles
    (word_shingles hashed=True) to shrink payloads to 8 bytes.
    """
    sh = word_shingles(df, id_col, text_col, k)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_sdf"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nt"))
    wdoc = Window.partitionBy(id_col).orderBy("_sdf", "shingle")
    pre = (
        sh.join(dfreq, "shingle")
        .withColumn("_rn", F.row_number().over(wdoc))
        .join(sizes, id_col)
        # prefix length = nt - ceil(theta*nt) + 1; ceil via int arith
        .where(
            F.col("_rn")
            <= F.col("_nt")
            - F.expr(f"({theta_num} * _nt + {theta_den} - 1) DIV {theta_den}")
            + 1
        )
        .select(F.col(id_col), F.col("shingle"))
    )
    a = pre.select(F.col(id_col).alias("id_a"), "shingle")
    b = pre.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sha = sh.select(F.col(id_col).alias("_ia"), F.col("shingle").alias("_sha"))
    shb = sh.select(F.col(id_col).alias("_ib"), F.col("shingle").alias("_shb"))
    inter = (
        cand.join(sha, F.col("id_a") == F.col("_ia"))
        .join(shb, (F.col("id_b") == F.col("_ib")) & (F.col("_sha") == F.col("_shb")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("_nt").alias("_na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("_nt").alias("_nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .where(
            F.lit(theta_den) * F.col("_ni")
            >= F.lit(theta_num) * (F.col("_na") + F.col("_nb") - F.col("_ni"))
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("_ni").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_ni")).cast("double")
            ).alias("jaccard"),
        )
    )
