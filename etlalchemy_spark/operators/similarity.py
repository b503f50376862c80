"""Similarity search over embedding columns (array<float>).

Mandated extension surface (BASELINE.json): brute-force cosine top-k as
the exact baseline, plus LSH-bucketed variants as the 100 TB path.

All vector math is expression-level (``zip_with`` + ``aggregate`` run
inside codegen) — no UDFs, no collect. For oracle-exact queries the dot
products accumulate in DECIMAL (order-proof); the LSH variants use
plain double (they are rows-only checks).

Scale notes: brute-force top-k is one pass over n vectors × O(d) per
row with a TakeOrderedAndProject — fine for one query vector even at
billions of rows. For batch top-k (m queries × n base) use the LSH /
IVF variants: candidates per query collapse from n to a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lit_vec(vec: list[float]):
    """Literal double array as ONE parsed expression: the per-element
    F.lit form cost ~2 Py4J roundtrips per dimension of pure plan-
    construction time. CAST('<repr>' AS DOUBLE) parses the shortest
    round-trip repr back to the identical bits F.lit would embed."""
    body = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
    return F.expr(f"array({body})")


# Per-element decimal width for exact dot products: embeddings are
# unit-scale floats, so (12,10) fits; products are (25,20) and a
# grouped SUM caps at decimal(35,20) — exact, no precision loss.
# (F.aggregate can't replace the explode+SUM: a (38,20) accumulator
# silently loses a scale digit per add under allowPrecisionLoss, and
# even with a (30,20) accumulator + per-step casts — which IS exact —
# higher-order functions evaluate INTERPRETED, not codegen: measured
# ~2x SLOWER than the posexplode+hash-agg path at sf0.1 (r9 A/B:
# dedup_semantic_keep_first 16s→30s, sim_knn_batch_exact 10s→20s).
# The explode pays one shuffle but stays in whole-stage codegen.)
_D = "decimal(12,10)"


def exact_cosine(df: DataFrame, keys: list[str], va, vb) -> DataFrame:
    """Append an oracle-exact ``cosine`` column per ``keys`` group.

    ``va``/``vb`` are array columns (or literal arrays). Explodes one
    side and computes the three decimal(12,10) product sums (dot,
    |a|², |b|²) ENTIRELY IN LONGS, reproducing the decimal result bit
    for bit (r13 optimization round — the BigDecimal-per-element path
    measured 19.4–23.6 s vs 16.9–17.8 s for this one on a 137M-row
    workload, and a quiet re-check of sim_knn_batch_exact agreed):

    - each element's decimal(12,10) value is its unscaled long
      ``u = CAST(dec * 1e10 AS BIGINT)`` (|u| < 1e12; the double →
      decimal cast below is the SAME rounding both paths use);
    - ``u`` splits at 1e5 into (h, l) = (u DIV 1e5, u % 1e5), so a
      product u·u' = hh·1e10 + (hl' + lh')·1e5 + ll rides as THREE
      long partial sums, each bounded by dim·1e14 — exact and
      order-insensitive like the decimal sums they replace;
    - ``ROUND(sum, 12)`` of the scale-20 decimal value decomposes into
      longs too: with R = S_mid·1e5 + S_ll, the unscaled scale-12
      result is S_hh·100 + q + half_away(rem/1e8) where q/rem split R
      at 1e8 — after sign-aligning rem with the integer part, because
      HALF_UP (away from zero) is NOT translation-invariant across
      zero and a naive decomposition mis-rounds exact .5 ties;
    - the final double goes through one exact decimal division per
      group (unscaled/1e12 — representable at scale 12, so the
      division is exact and the decimal→double conversion is the
      identical correctly-rounded one the old path used).

    Finishes with sqrt/try_divide in double on identical operands —
    bit-identical across engines (and bit-identical to the previous
    decimal implementation: pinned on 52k corpus pairs + adversarial
    ties/zero/empty/mismatched-length edges). Costs a 64× row
    expansion + one groupBy on keys; use the zip_with double path
    when oracle-exactness isn't needed."""
    va = va if isinstance(va, Column) else F.col(va)
    vb = vb if isinstance(vb, Column) else F.col(vb)
    e = (
        df.select(*keys, vb.alias("_vb"), F.posexplode(va).alias("_pos", "_xa"))
        # try_element_at: a length mismatch degrades the overhanging
        # positions to NULL (dropped by the sums) instead of throwing
        # INVALID_ARRAY_INDEX under Spark's default ANSI mode
        .withColumn("_xb", F.try_element_at("_vb", F.col("_pos") + 1))
    )
    # float → DOUBLE → decimal: DuckDB's direct float→decimal cast is
    # imprecise (fixed-point artifact); via double both engines round
    # the same binary value correctly. The *1e10 CAST BIGINT is exact
    # (decimal(23,10) integer value, |u| < 1e12).
    ux = f"CAST(CAST(CAST(_xa AS DOUBLE) AS {_D}) * CAST(10000000000 AS DECIMAL(11,0)) AS BIGINT)"
    uy = f"CAST(CAST(CAST(_xb AS DOUBLE) AS {_D}) * CAST(10000000000 AS DECIMAL(11,0)) AS BIGINT)"
    p = e.select(*keys, F.expr(ux).alias("_ux"), F.expr(uy).alias("_uy")).select(
        *keys,
        F.expr("_ux DIV 100000L").alias("_hx"),
        F.expr("_ux % 100000L").alias("_lx"),
        F.expr("_uy DIV 100000L").alias("_hy"),
        F.expr("_uy % 100000L").alias("_ly"),
    )
    # nine long sums: hh/mid/ll per quantity. NULL _uy rows (length
    # mismatch) yield NULL products, which SUM skips — the same
    # "overhang drops out of all three sums it appears in" semantics
    # as the decimal path.
    g = p.groupBy(*keys).agg(
        F.sum(F.expr("_hx * _hy")).alias("_dhh"),
        F.sum(F.expr("_hx * _ly + _lx * _hy")).alias("_dmid"),
        F.sum(F.expr("_lx * _ly")).alias("_dll"),
        F.sum(F.expr("_hx * _hx")).alias("_ahh"),
        F.sum(F.expr("2L * _hx * _lx")).alias("_amid"),
        F.sum(F.expr("_lx * _lx")).alias("_all"),
        F.sum(F.expr("_hy * _hy")).alias("_bhh"),
        F.sum(F.expr("2L * _hy * _ly")).alias("_bmid"),
        F.sum(F.expr("_ly * _ly")).alias("_bll"),
    )

    def u12(hh: str, mid: str, ll: str) -> str:
        # unscaled scale-12 value of ROUND(S_hh*1e10 + S_mid*1e5 +
        # S_ll, -8) — all longs; SUM of zero rows is NULL and
        # propagates (the decimal path's empty-array NULL). S_mid is
        # split at 1e3 FIRST: S_mid*1e5 alone can exceed int64 at the
        # top of the decimal(12,10) domain (|x| near 100, dim 64), but
        # (S_hh*100 + S_mid DIV 1e3) and (S_mid % 1e3)*1e5 + S_ll both
        # stay below ~6.5e17 for every legal input — the decomposition
        # units = (S_hh*100 + q3)*1e8 + ((S_mid % 1e3)*1e5 + S_ll) is
        # an exact integer identity
        q3 = f"({mid} DIV 1000L)"
        R = f"(({mid} % 1000L) * 100000L + {ll})"
        q = f"({R} DIV 100000000L)"
        rem = f"({R} - {q} * 100000000L)"
        K = f"({hh} * 100L + {q3} + {q})"
        # sign-align rem with K: HALF_UP rounds away from zero, so the
        # decomposition K + round(rem/1e8) is only valid when rem and
        # K agree in sign (exact .5 ties straddling zero mis-round
        # otherwise)
        K2 = (
            f"(CASE WHEN {K} > 0 AND {rem} < 0 THEN {K} - 1 "
            f"WHEN {K} < 0 AND {rem} > 0 THEN {K} + 1 ELSE {K} END)"
        )
        rem2 = (
            f"(CASE WHEN {K} > 0 AND {rem} < 0 THEN {rem} + 100000000L "
            f"WHEN {K} < 0 AND {rem} > 0 THEN {rem} - 100000000L ELSE {rem} END)"
        )
        rnd = (
            f"(IF({rem2} >= 0, ({rem2} + 50000000L) DIV 100000000L, "
            f"-((-{rem2} + 50000000L) DIV 100000000L)))"
        )
        return f"({K2} + {rnd})"

    def to_dbl(hh: str, mid: str, ll: str):
        # one exact decimal division per group: unscaled/1e12 has at
        # most 12 fractional digits, so the quotient is exact and the
        # decimal→double conversion is the same correctly-rounded one
        # ROUND(dec, 12).cast(double) performed — valid even where the
        # unscaled value exceeds 2^53 (a bare double divide would
        # double-round there)
        return (
            F.expr(u12(hh, mid, ll)).cast("decimal(26,0)")
            / F.lit(1000000000000).cast("decimal(13,0)")
        ).cast("double")

    # try_divide: a zero-norm vector yields NULL cosine instead of a
    # DIVIDE_BY_ZERO abort under ANSI mode (downstream top-k drops
    # NULL-scored rows)
    return g.select(
        *keys,
        F.try_divide(
            to_dbl("_dhh", "_dmid", "_dll"),
            F.sqrt(to_dbl("_ahh", "_amid", "_all"))
            * F.sqrt(to_dbl("_bhh", "_bmid", "_bll")),
        ).alias("cosine"),
    )


def exact_cosine_arrow(df: DataFrame, keys: list[str], va_col: str, vb_col: str) -> DataFrame:
    """``exact_cosine`` computed in ONE Arrow map instead of the 64x
    posexplode + nine-long-sum hash aggregate — bit-identical output,
    no exchange (r14 optimization round, the r13 verdict's ranked next
    lever for the SemDeDup paths). Requires BOTH columns to be
    array<float> (float32) — the quantization proof below needs the
    24-bit significand.

    Exactness argument, step by step against the SQL engine:
    - quantize u = CAST(CAST(CAST(x AS DOUBLE) AS decimal(12,10)) *
      1e10 AS BIGINT): float32 -> float64 is exact widening, and
      x * 1e10 is EXACT in float64 because mantissa(x) * 5^10 needs at
      most 24 + 24 = 48 < 53 bits — so HALF_UP at scale 10 is plain
      round-half-away-from-zero of an exactly-computed y = x*1e10.
      That rounding is done with exact float64 ops only: f=floor(|y|)
      (exact), frac = |y| - f (exact: the difference's bits are a
      suffix of y's 48-bit significand), compare frac >= 0.5 (exact).
      |x| >= 100 raises (ANSI decimal overflow parity); NaN elements
      quantize to NULL (Spark: CAST(NaN AS DECIMAL) is NULL) and drop
      out of the same sums they drop out of in SQL.
    - the nine int64 partial sums are elementwise int64 products
      summed per row: every bound from the SQL engine's overflow
      analysis (|h| < 1e7, hh-sums <= dim*1e14) carries over verbatim;
      numpy int64 arithmetic is two's-complement Java-long arithmetic.
    - u12 (ROUND(.., 12) decomposed into longs) replays the exact
      integer identity with Spark's TRUNCATE-TOWARD-ZERO ``DIV`` and
      sign-of-dividend ``%`` (emulated on negatives), including the
      sign-alignment of the remainder.
    - the final decimal(26,0)/1e12 -> double: when |unscaled| < 2^53
      the int64 -> float64 conversion is exact and ONE IEEE division
      by the exactly-representable 1e12 is the correctly-rounded
      quotient — identical to Spark's exact-decimal-then-convert. The
      rare |unscaled| >= 2^53 rows (|x| near the decimal(12,10) rim)
      route through Python big-int true division, which is also
      correctly rounded.
    - cosine = dot / (sqrt(na) * sqrt(nb)) in the same operation
      order; zero denominators yield NULL (try_divide parity), NULL
      sums propagate NULL, and rows whose ``va`` is NULL or empty are
      DROPPED (posexplode of an empty array emits no group).
    Equality is pinned corpus-wide + on adversarial edges in
    tests/test_similarity_arrow.py."""
    from pyspark.sql.types import ArrayType, DoubleType, FloatType, StructField, StructType

    for c in (va_col, vb_col):
        dt = df.schema[c].dataType
        if not (isinstance(dt, ArrayType) and isinstance(dt.elementType, FloatType)):
            raise ValueError(f"exact_cosine_arrow needs array<float> {c}, got {dt}")
    sel = df.select(*keys, F.col(va_col).alias("_va"), F.col(vb_col).alias("_vb"))
    out_schema = StructType(
        [sel.schema[k] for k in keys] + [StructField("cosine", DoubleType(), True)]
    )

    def _map(batches):
        import numpy as np
        import pyarrow as pa

        def tdiv(a, b):  # Spark DIV: truncate toward zero (b > 0)
            return np.where(a >= 0, a // b, -((-a) // b))

        def u12(hh, mid, ll):
            q3 = tdiv(mid, 1000)
            R = (mid - q3 * 1000) * 100000 + ll
            q = tdiv(R, 100000000)
            rem = R - q * 100000000
            K = hh * 100 + q3 + q
            up = (K > 0) & (rem < 0)
            dn = (K < 0) & (rem > 0)
            K2 = K - up.astype(np.int64) + dn.astype(np.int64)
            rem2 = rem + up.astype(np.int64) * 100000000 - dn.astype(np.int64) * 100000000
            rnd = np.where(
                rem2 >= 0,
                (rem2 + 50000000) // 100000000,
                -((-rem2 + 50000000) // 100000000),
            )
            return K2 + rnd

        def to_dbl(unscaled):
            out = unscaled.astype(np.float64) / 1e12
            big = np.abs(unscaled) >= 2**53
            if big.any():
                for i in np.nonzero(big)[0]:
                    out[i] = int(unscaled[i]) / 10**12  # big-int: correctly rounded
            return out

        def quant(x64):
            y = x64 * 1e10
            ay = np.abs(y)
            if np.any(ay >= 1e12):  # covers +-inf too
                raise ArithmeticError(
                    "value cannot be represented as Decimal(12,10) (ANSI parity)"
                )
            nan = np.isnan(y)
            ay = np.where(nan, 0.0, ay)
            f = np.floor(ay)
            u = (np.sign(y) * (f + (ay - f >= 0.5))).astype(np.int64)
            if np.any(np.abs(u) >= 10**12):
                # x in [99.99999999995, 100) rounds to 100.0 at scale
                # 10 and overflows decimal(12,10) — ANSI raise parity
                raise ArithmeticError(
                    "value cannot be represented as Decimal(12,10) (ANSI parity)"
                )
            return u, ~nan  # (quantized, valid mask)

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ia = rb.schema.get_field_index("_va")
            ib = rb.schema.get_field_index("_vb")
            ca = rb.column(ia)
            cb = rb.column(ib)
            # offsets are relative to the child buffer (non-zero base
            # when the array is a slice): diff() gives lengths either
            # way, and values are addressed as child[off[0]:off[-1]]
            offa = ca.offsets.to_numpy()
            lena = np.diff(offa)
            anull = ca.is_null().to_numpy(zero_copy_only=False)
            # rows dropped entirely: NULL or empty va (no exploded group)
            keep = (~anull) & (lena > 0)
            offb = cb.offsets.to_numpy()
            lenb = np.diff(offb)
            bnull = cb.is_null().to_numpy(zero_copy_only=False)
            a_child = ca.values.slice(offa[0], offa[-1] - offa[0])
            b_child = cb.values.slice(offb[0], offb[-1] - offb[0])
            aelem_null = a_child.null_count > 0
            belem_null = b_child.null_count > 0

            dims = np.unique(lena[keep]) if keep.any() else np.array([])
            uniform = (
                keep.all()
                and (~bnull).all()
                and len(dims) == 1
                and (lenb == dims[0]).all()
                and not aelem_null
                and not belem_null
            )
            if uniform:
                d = int(dims[0])
                A = a_child.to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, d)
                B = b_child.to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, d)
                ua, ma = quant(A)
                ub, mb = quant(B)
                hx = tdiv(ua, 100000); lx = ua - hx * 100000
                hy = tdiv(ub, 100000); ly = ub - hy * 100000
                if ma.all() and mb.all():  # no NaN anywhere: pure sums
                    dhh = (hx * hy).sum(1); dmid = (hx * ly + lx * hy).sum(1)
                    dll = (lx * ly).sum(1)
                    ahh = (hx * hx).sum(1); amid = (2 * hx * lx).sum(1)
                    al = (lx * lx).sum(1)
                    bhh = (hy * hy).sum(1); bmid = (2 * hy * ly).sum(1)
                    bl = (ly * ly).sum(1)
                    dot_null = np.zeros(n, dtype=bool)
                else:  # NaN elements -> NULL terms, masked out per sum
                    mab = ma & mb
                    z = np.int64(0)
                    dhh = np.where(mab, hx * hy, z).sum(1)
                    dmid = np.where(mab, hx * ly + lx * hy, z).sum(1)
                    dll = np.where(mab, lx * ly, z).sum(1)
                    ahh = np.where(ma, hx * hx, z).sum(1)
                    amid = np.where(ma, 2 * hx * lx, z).sum(1)
                    al = np.where(ma, lx * lx, z).sum(1)
                    bhh = np.where(mb, hy * hy, z).sum(1)
                    bmid = np.where(mb, 2 * hy * ly, z).sum(1)
                    bl = np.where(mb, ly * ly, z).sum(1)
                    dot_null = ~mab.any(1)  # SUM over zero rows is NULL
                    # an all-NaN side makes na/nb NULL too -> den NULL
                    dot_null |= ~ma.any(1) | ~mb.any(1)
                dot_d = to_dbl(u12(dhh, dmid, dll))
                na_d = to_dbl(u12(ahh, amid, al))
                nb_d = to_dbl(u12(bhh, bmid, bl))
                den = np.sqrt(na_d) * np.sqrt(nb_d)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dot_d / den
                null_mask = (den == 0.0) | dot_null
                out = pa.array(
                    np.where(null_mask, np.nan, cos),
                    type=pa.float64(),
                    mask=null_mask,
                )
                yield pa.RecordBatch.from_arrays(
                    [rb.column(rb.schema.get_field_index(k)) for k in keys] + [out],
                    schema=pa.schema(
                        [rb.schema.field(rb.schema.get_field_index(k)) for k in keys]
                        + [pa.field("cosine", pa.float64())]
                    ),
                )
                continue

            # general path: per-row exact Python ints (mixed lengths,
            # NULL arrays/elements) — rare by construction, the
            # semantic paths feed uniform 64-dim corpora
            import math

            def q1(x):
                if x is None:
                    return None
                x = float(x)
                if math.isnan(x):
                    return None  # CAST(NaN AS DECIMAL) is NULL
                y = x * 1e10
                ay = abs(y)
                if ay >= 1e12:
                    raise ArithmeticError(
                        "value cannot be represented as Decimal(12,10) (ANSI parity)"
                    )
                f = math.floor(ay)
                u = int(f) + (1 if ay - f >= 0.5 else 0)
                if u >= 10**12:
                    raise ArithmeticError(
                        "value cannot be represented as Decimal(12,10) (ANSI parity)"
                    )
                return -u if y < 0 else u

            def tdiv1(a, b):
                return a // b if a >= 0 else -((-a) // b)

            def u12_1(hh, mid, ll):
                if hh is None:
                    return None
                q3 = tdiv1(mid, 1000)
                R = (mid - q3 * 1000) * 100000 + ll
                q = tdiv1(R, 100000000)
                rem = R - q * 100000000
                K = hh * 100 + q3 + q
                if K > 0 and rem < 0:
                    K, rem = K - 1, rem + 100000000
                elif K < 0 and rem > 0:
                    K, rem = K + 1, rem - 100000000
                rnd = (
                    (rem + 50000000) // 100000000
                    if rem >= 0
                    else -((-rem + 50000000) // 100000000)
                )
                return (K + rnd) / 10**12  # big-int truediv: correctly rounded

            rows_keys: list[list] = [[] for _ in keys]
            rows_cos: list[float | None] = []
            pyd = rb.to_pydict()
            a_list = pyd["_va"]
            b_list = pyd["_vb"]
            key_cols = [pyd[k] for k in keys]
            for r in range(n):
                a = a_list[r]
                if a is None or len(a) == 0:
                    continue  # posexplode of empty/NULL: group absent
                b = b_list[r] if b_list[r] is not None else []
                qa = [q1(x) for x in a]
                qb = [q1(x) for x in b]
                sums = [0, 0, 0, 0, 0, 0, 0, 0, 0]
                seen = [False, False, False]
                for i, ux in enumerate(qa):
                    uy = qb[i] if i < len(qb) else None
                    if ux is not None:
                        hx, lx = tdiv1(ux, 100000), 0
                        lx = ux - hx * 100000
                        sums[3] += hx * hx; sums[4] += 2 * hx * lx; sums[5] += lx * lx
                        seen[1] = True
                    if uy is not None:
                        hy, ly = tdiv1(uy, 100000), 0
                        ly = uy - hy * 100000
                        sums[6] += hy * hy; sums[7] += 2 * hy * ly; sums[8] += ly * ly
                        seen[2] = True
                    if ux is not None and uy is not None:
                        sums[0] += hx * hy; sums[1] += hx * ly + lx * hy; sums[2] += lx * ly
                        seen[0] = True
                dot_d = u12_1(*sums[0:3]) if seen[0] else None
                na_d = u12_1(*sums[3:6]) if seen[1] else None
                nb_d = u12_1(*sums[6:9]) if seen[2] else None
                if dot_d is None or na_d is None or nb_d is None:
                    cosv = None
                else:
                    den = math.sqrt(na_d) * math.sqrt(nb_d)
                    cosv = None if den == 0.0 else dot_d / den
                for j in range(len(keys)):
                    rows_keys[j].append(key_cols[j][r])
                rows_cos.append(cosv)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rows_keys[j], type=rb.schema.field(rb.schema.get_field_index(k)).type)
                    for j, k in enumerate(keys)
                ]
                + [pa.array(rows_cos, type=pa.float64())],
                schema=pa.schema(
                    [rb.schema.field(rb.schema.get_field_index(k)) for k in keys]
                    + [pa.field("cosine", pa.float64())]
                ),
            )

    return sel.mapInArrow(_map, out_schema)


def _exact_cosine_best(df: DataFrame, keys: list[str], va_col: str, vb_col: str) -> DataFrame:
    """Route an exact-cosine computation to the Arrow kernel when both
    vector columns are array<float> (where its quantization proof
    holds), else to the SQL explode engine — identical results either
    way (pinned in tests/test_similarity_arrow.py)."""
    from pyspark.sql.types import ArrayType, FloatType

    def ok(c: str) -> bool:
        dt = df.schema[c].dataType
        return isinstance(dt, ArrayType) and isinstance(dt.elementType, FloatType)

    if ok(va_col) and ok(vb_col):
        return exact_cosine_arrow(df, keys, va_col, vb_col)
    return exact_cosine(df, keys, F.col(va_col), F.col(vb_col))


def dot_double(a, b):
    """Fast path (not oracle-exact): double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_double(a, b):
    # try_divide: zero-norm vectors score NULL instead of aborting the
    # whole query under ANSI division
    return F.try_divide(
        dot_double(a, b), F.sqrt(dot_double(a, a)) * F.sqrt(dot_double(b, b))
    )


def _topk_ranked(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Distributed top-k with a rank column. ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject (per-partition heaps + a k-row
    driver merge — no global sort, no single-partition shuffle); the
    ≤k survivors are then ranked by one collect_list aggregate +
    array_sort + posexplode — O(k) state, no WindowExec at all (a
    window here, even over k rows, would plan unpartitioned and
    single-task; Spark 4 strips foldable partition keys). NULL-scored
    rows (zero-norm vectors under the try_divide guards) are dropped
    up front: the limit's NULLS-LAST order and array_sort's
    nulls-first struct order would otherwise DISAGREE, handing rank 1
    to an unscorable row whenever a bucket holds fewer than k real
    candidates."""
    scored = scored.where(F.col("cosine").isNotNull())
    top = scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
    arr = F.array_sort(
        F.collect_list(F.struct((-F.col("cosine")).alias("_neg"), F.col(id_col), F.col("cosine")))
    )
    return (
        top.agg(arr.alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_e"))
        .select(
            F.col(f"_e.{id_col}").alias(id_col),
            F.col("_e.cosine").alias("cosine"),
            (F.col("_pos") + 1).cast("int").alias("rank"),
        )
    )


def cosine_topk_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k against one query vector. Output:
    (id, cosine, rank) — deterministic total order (cosine desc, id)."""
    q = _lit_vec(query_vec)
    scored = exact_cosine(df, [id_col], F.col(vec_col), q)
    return _topk_ranked(scored, id_col, k)


# --- random-hyperplane LSH (approximate, scale path) -----------------------

def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure-python LCG; no
    numpy dependency in the plan, values baked as literals)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def query_bits(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side bucket id of a query vector — the ONE definition of
    the sign convention shared by the LSH probes (a fix applied to one
    inline copy and not the other would silently diverge the buckets
    from the engine-side ``lsh_bucket``)."""
    qbits = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) > 0:
            qbits |= 1 << i
    return qbits


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bit-signature bucket id: sign of <v, plane_i> per plane."""
    bits = [
        F.when(dot_double(vec_col, _lit_vec(p)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict exact scoring to the query's LSH
    bucket (plus nothing — recall traded for a ~2^planes candidate
    cut). Candidate filter is a partition-prunable int equality."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    # query bucket computed driver-side (tiny, pure python)
    qbits = query_bits(query_vec, planes)
    q = _lit_vec(query_vec)
    cands = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes)).where(
        F.col("_bucket") == qbits
    )
    scored = cands.select(F.col(id_col), cosine_double(F.col(vec_col), q).alias("cosine"))
    return _topk_ranked(scored, id_col, k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup: LSH-bucket candidates (vectors sharing the
    full bit signature), exact cosine verify within bucket. Linear
    candidate generation — the all-pairs version of cosine_topk_lsh.

    ``dim`` defaults to the observed vector length (one-row probe). A
    wrong dim would NULL every plane dot product, collapse all vectors
    into bucket 0, and degrade candidate generation to the full cross
    join this function exists to avoid."""
    if dim is None:
        probe = (
            df.select(F.size(F.col(vec_col)).alias("d"))
            .where(F.col("d").isNotNull())  # skip NULL-vector rows
            .first()
        )
        if probe is None:
            from pyspark.sql import types as T

            idt = df.schema[id_col].dataType  # keep the caller's id type
            return df.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("id_a", idt),
                        T.StructField("id_b", idt),
                        T.StructField("cosine", T.DoubleType()),
                    ]
                ),
            )
        dim = probe["d"]
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("_bucket")
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "_bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "_bucket"
    )
    return (
        a.join(b, "_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_double(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )




def _unit(vecs: list[list[float]]) -> list[list[float]]:
    """Normalize centroids to unit norm so argmax(dot) == argmax(cosine):
    raw dot products bias assignment toward high-norm centroids."""
    out = []
    for v in vecs:
        n = sum(x * x for x in v) ** 0.5
        out.append([x / n for x in v] if n > 0 else list(v))
    return out


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat: assign each vector to its nearest centroid (one pass,
    argmax over c centroids), search only the query's n_probe nearest
    cells. Centroids are caller-supplied (e.g. sampled ids or a k-means
    fit) and unit-normalized here, so the argmax over dot products is a
    true cosine assignment; assignment is a deterministic argmax
    expression."""
    centroids = _unit(centroids)

    def nearest_cell(vec):
        sims = F.array(*[dot_double(vec, _lit_vec(c)) for c in centroids])
        # first index of the max similarity (deterministic tie-break)
        return F.array_position(sims, F.array_max(sims)) - 1

    # query's n_probe nearest cells, driver-side
    qsims = [
        (i, sum(x * y for x, y in zip(query_vec, c))) for i, c in enumerate(centroids)
    ]
    probe_cells = [i for i, _ in sorted(qsims, key=lambda t: -t[1])[:n_probe]]

    q = _lit_vec(query_vec)
    assigned = df.withColumn("_cell", nearest_cell(F.col(vec_col)).cast("int"))
    cands = assigned.where(F.col("_cell").isin(probe_cells))
    scored = cands.select(F.col(id_col), cosine_double(F.col(vec_col), q).alias("cosine"))
    return _topk_ranked(scored, id_col, k)


def kmeans_centroids(
    df: DataFrame, vec_col: str, k: int = 8, iters: int = 3, id_col: str | None = None
) -> list[list[float]]:
    """Lloyd's k-means over an embedding column in pure DataFrame ops —
    the IVF training step (and the house template for iterative
    algorithms: per-iteration state is aggregate-sized, so it lives on
    the driver as plan literals; the DATA never leaves executors).

    ``id_col`` is REQUIRED (r12 verdict #3): the old
    ``monotonically_increasing_id()`` fallback ordered the init
    vectors by partition layout, so the same data repartitioned
    differently trained different centroids — violating the repo's
    determinism rule (operators/skew.py:20-23). Raising beats a
    silent nondeterministic default.

    Init: first k vectors in id order (deterministic). Each iteration:
    argmax-assign to the nearest centroid (cosine), recompute each
    centroid as the per-dimension mean via posexplode + groupBy — one
    shuffle of k×dim partial sums per iteration, never the vectors.
    Only the k×dim centroid matrix is collected.
    """
    if id_col is None:
        raise ValueError(
            "kmeans_centroids requires id_col: seeding by "
            "monotonically_increasing_id() depends on partition layout "
            "and would train different centroids after a repartition"
        )
    order = F.col(id_col)
    centroids = [
        [float(x) for x in r[0]]
        for r in df.select(vec_col).orderBy(order).limit(k).collect()
    ]
    for _ in range(iters):
        # assignment uses UNIT centroids (cosine argmax); the update
        # step still averages raw vectors (standard spherical k-means)
        sims = F.array(*[dot_double(F.col(vec_col), _lit_vec(c)) for c in _unit(centroids)])
        cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
        means = (
            df.select(cell.alias("_cell"), F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["_cell"], {})[r["_pos"]] = r["_m"]
        dim = len(centroids[0])
        centroids = [
            [by_cell.get(c, {}).get(p, centroids[c][p]) for p in range(dim)]
            for c in range(len(centroids))
        ]
    return centroids


def cosine_topk_lsh_multiprobe(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Multi-probe LSH: search the query's bucket plus every bucket at
    Hamming distance 1 (the planes the query is least certain about
    flip first in near neighbors). Recall approaches exact at the cost
    of (n_planes+1)/2^n_planes of the data — still a >95% candidate cut
    at 8 planes."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = query_bits(query_vec, planes)
    probes = [qbits] + [qbits ^ (1 << i) for i in range(n_planes)]
    q = _lit_vec(query_vec)
    cands = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes)).where(
        F.col("_bucket").isin(probes)
    )
    scored = cands.select(F.col(id_col), cosine_double(F.col(vec_col), q).alias("cosine"))
    return _topk_ranked(scored, id_col, k)


# --- oracle-exact hyperplane LSH -------------------------------------------

def lsh_buckets_exact(
    df: DataFrame, id_col: str, vec_col: str, planes: list[list[float]]
) -> DataFrame:
    """(id, bucket) with bucket bits = sign of DECIMAL dot products
    against literal hyperplanes — exact, order-insensitive, hence
    bit-identical in any engine (the double-fold ``lsh_bucket`` above
    is the production fast path). One posexplode + one groupBy.
    (An r11 experiment replaced this with per-row
    aggregate(zip_with(...)) decimal lambdas — shuffle-free, values
    bit-identical via a DECIMAL(30,20) accumulator dodging the
    decimal-ADD scale clip — but the 6x64-literal lambda plans cost
    more in codegen per batch than the small groupBy shuffle they
    saved, at every batch size that fits one machine; reverted.)"""
    e = df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
    xd = F.col("_x").cast("double").cast(_D)
    aggs = []
    for j, p in enumerate(planes):
        body = ", ".join(f"CAST(CAST('{float(v)!r}' AS DOUBLE) AS {_D})" for v in p)
        plit = F.expr(f"array({body})")
        # try_element_at: a dim > len(planes[j]) mismatch degrades to
        # NULL terms (skipped by SUM) instead of an ANSI index abort
        aggs.append(F.sum(xd * F.try_element_at(plit, F.col("_pos") + 1)).alias(f"_d{j}"))
    sums = e.groupBy(id_col).agg(*aggs)
    bucket = None
    for j in range(len(planes)):
        term = F.when(F.col(f"_d{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return sums.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def _candidates_topk(
    cand_ids: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
) -> DataFrame:
    """THE candidates→answer tail shared by every bucket-probe path
    (in-plan, persisted-store): left-semi fetch from the corpus →
    decimal-exact cosine re-rank → ranked top-k. One definition so a
    tie-break or null-handling fix can never silently diverge the
    paths (r7 review finding); left-semi also makes the fetch
    insensitive to duplicate index rows (re-appended store batches)."""
    cands = corpus.join(cand_ids, id_col, "left_semi")
    scored = exact_cosine(cands, [id_col], F.col(vec_col), _lit_vec(query_vec))
    return _topk_ranked(scored, id_col, k)


def probe_buckets_topk(
    bkt: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """In-plan bucket probe (cosine_topk_lsh_exact): the query's own
    bucket row (broadcast, one row) → candidate ids → the shared
    _candidates_topk tail."""
    qb = bkt.where(F.col(id_col) == query_id).select(F.col("bucket").alias("_qb"))
    cand_ids = bkt.join(F.broadcast(qb), bkt.bucket == F.col("_qb")).select(id_col)
    return _candidates_topk(cand_ids, corpus, id_col, vec_col, query_vec, k)


def cosine_topk_lsh_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Hyperplane-LSH top-k, fully reproducible: candidates = vectors
    sharing the query's bucket (decimal-exact bit signs, query bucket
    computed in-engine from its own row), scored with the decimal-exact
    cosine. Same candidate cut as the production path, zero
    engine-specific arithmetic."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    bkt = lsh_buckets_exact(df, id_col, vec_col, planes)
    return probe_buckets_topk(bkt, df, id_col, vec_col, query_id, query_vec, k)


def embedding_near_dup_pairs_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.3,
    n_planes: int = 6,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup with exact cross-engine reproducibility:
    candidates = pairs sharing the full decimal-sign LSH signature,
    verified with the decimal-exact cosine. Candidate generation stays
    linear (one bucket equi-join); only bucket-mates pay the exact
    scoring."""
    planes = hyperplanes(dim, n_planes, seed)
    bkt = lsh_buckets_exact(df, id_col, vec_col, planes)
    withb = df.join(bkt, id_col)
    a = withb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "bucket")
    b = withb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    scored = exact_cosine(pairs, ["id_a", "id_b"], F.col("_va"), F.col("_vb"))
    return scored.where(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def ivf_topk_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    query_vec: list[float],
    centroid_ids: list[int],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat top-k with full cross-engine reproducibility: centroids
    are existing rows (``centroid_ids``), every vector is assigned to
    its max-cosine centroid via the decimal-exact cosine (ties → lowest
    centroid id), the query's ``n_probe`` best cells are derived
    in-engine from its own assignment scores, and the probed candidates
    are scored exactly. No driver-side float math anywhere."""
    cents = df.where(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec")
    )
    pairs = df.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(cents))
    scored = exact_cosine(pairs, [id_col, "_cid"], F.col(vec_col), F.col("_cvec"))
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), F.col("_cid"))
    ranked = scored.withColumn("_crank", F.row_number().over(w))

    cells = ranked.where(F.col("_crank") == 1).select(id_col, F.col("_cid").alias("_cell"))
    probe = (
        ranked.where((F.col(id_col) == query_id) & (F.col("_crank") <= n_probe))
        .select(F.col("_cid").alias("_cell"))
    )
    cand_ids = cells.join(F.broadcast(probe), "_cell").select(id_col)
    cands = df.join(cand_ids, id_col)
    out = exact_cosine(cands, [id_col], F.col(vec_col), _lit_vec(query_vec))
    return _topk_ranked(out, id_col, k)


def cosine_topk_lsh_multiprobe_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Multi-probe variant of ``cosine_topk_lsh_exact``: candidates
    come from the query's bucket plus every bucket at Hamming distance
    1, with the probe set derived in-engine by XOR-ing the query's own
    bucket — recall approaches exact while staying reproducible."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    bkt = lsh_buckets_exact(df, id_col, vec_col, planes)
    qb = bkt.where(F.col(id_col) == query_id).select(F.col("bucket").alias("_qb"))
    probed = bkt.crossJoin(F.broadcast(qb))
    cond = F.col("bucket") == F.col("_qb")
    for i in range(n_planes):
        cond = cond | (F.col("bucket") == F.col("_qb").bitwiseXOR(F.lit(1 << i)))
    cand_ids = probed.where(cond).select(id_col)
    cands = df.join(cand_ids, id_col)
    scored = exact_cosine(cands, [id_col], F.col(vec_col), _lit_vec(query_vec))
    return _topk_ranked(scored, id_col, k)


# --- int8 scalar quantization (compressed exact-arithmetic path) -----------


def int8_quantize(vec_col) -> Column:
    """Per-vector symmetric int8 quantization: s = max|v_i|, q_i =
    floor(v_i/s·127 + 0.5) ∈ [-127, 127] (half-up via floor — the one
    rounding rule Spark and DuckDB share bit-for-bit; banker's rounding
    would diverge). Cosine is scale-invariant per vector, so the
    per-vector scale drops out of ranking entirely and everything
    downstream of quantization is INTEGER arithmetic — exact on any
    engine with no decimal machinery, and a 4× scan-bandwidth /
    memory cut vs float32, which is the point at 100 TB: quantize once
    at ingest, score candidates in int8, re-rank the short list in
    float only if the application needs calibrated scores."""
    v = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    s = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    return F.when(
        s == F.lit(0.0), F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(
            v, lambda x: F.floor(x.cast("double") / s * 127 + F.lit(0.5)).cast("long")
        )
    )


def int8_quantize_py(vec: list[float]) -> list[int]:
    """Driver-side twin of ``int8_quantize`` for the query vector.
    Python floats ARE IEEE doubles and the op order mirrors the
    engine expression exactly, so the ints match bit-for-bit."""
    import math

    s = max(abs(float(x)) for x in vec)
    if s == 0:
        return [0] * len(vec)
    return [math.floor(float(x) / s * 127 + 0.5) for x in vec]


def int8_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_q: list[int],
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k on QUANTIZED vectors: integer zip_with dot +
    integer norms inside codegen, one double division at the end,
    TakeOrderedAndProject for the k survivors. Output (id, cosine,
    rank) — same shape as cosine_topk_exact so recall audits compose."""
    qarr = F.expr("array(" + ", ".join(f"{int(x)}L" for x in query_q) + ")")
    nq = sum(int(x) * int(x) for x in query_q)
    q = int8_quantize(vec_col)
    acc0 = F.lit(0).cast("long")
    dot = F.aggregate(F.zip_with(q, qarr, lambda a, b: a * b), acc0, lambda a, x: a + x)
    nb = F.aggregate(F.transform(q, lambda x: x * x), acc0, lambda a, x: a + x)
    scored = df.select(
        F.col(id_col),
        F.try_divide(
            dot.cast("double"),
            F.sqrt(nb.cast("double")) * F.sqrt(F.lit(nq).cast("double")),
        ).alias("cosine"),
    )
    return _topk_ranked(scored, id_col, k)


# ---------------------------------------------------------------------------
# Product quantization (r7): 64-dim vectors as M=8 subspaces x K codes.
# Two forms: an ORACLE-EXACT encoder on a global integer grid with
# anchor codebooks (portable argmin — the correctness gate), and the
# kmeans-trained float path with ADC scoring (the scale path: 8 bytes
# per vector instead of 256, distance via 8 table lookups).


def global_int_grid(vec_col) -> Column:
    """Global-grid integer quantization q_i = floor(v_i*127 + 0.5):
    unlike int8_quantize's per-vector scale, ONE shared grid, so
    L2 distances between different vectors' quantizations are
    metrically consistent — what PQ encoding needs. Identical IEEE
    multiply + floor on Spark and DuckDB → exact."""
    v = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    return F.transform(v, lambda x: F.floor(x.cast("double") * 127 + F.lit(0.5)).cast("long"))


def pq_anchor_codebooks(
    df: DataFrame, id_col: str, vec_col: str, n_codes: int = 16
) -> list[list[int]]:
    """Deterministic anchor codebooks: the grid-quantized first
    ``n_codes`` vectors in id order. Code m of any vector = argmin
    integer L2 distance between its m-th subvector and the anchors'
    m-th subvectors — reproducible in ANSI SQL, hence the exact gate
    for the PQ family (kmeans codebooks are float/iteration-order
    dependent and can't be)."""
    rows = (
        df.select(global_int_grid(F.col(vec_col)).alias("qv"))
        .orderBy(F.col(id_col))
        .limit(n_codes)
        .collect()
    )
    return [[int(x) for x in r["qv"]] for r in rows]


def pq_codes_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    anchors: list[list[int]],
    n_sub: int = 8,
    d_sub: int = 8,
) -> DataFrame:
    """PQ encoding against anchor codebooks, all-integer and fully
    RELATIONAL: the codebook is a broadcast dimension table (n_sub x
    n_codes rows — bounded by the codebook, never the data), each
    vector explodes to its n_sub subvectors, and one broadcast
    equi-join + zip_with/aggregate computes every (vector, subspace,
    code) distance; argmin via MIN over a (dist, code) struct (struct
    ordering = lexicographic, so ties break to the lowest code on both
    engines — the oracle orders by (dist, code)). One shuffle (the
    final per-(id, subspace) argmin aggregate); the earlier plan-
    literal formulation built 1024 expression nodes and spent ~7 s
    per ACTION in driver-side plan work for 500 rows — the join form
    plans in milliseconds and scales the same at any corpus size."""
    spark = df.sparkSession
    arows = [
        (m, code, [int(x) for x in a[m * d_sub : (m + 1) * d_sub]])
        for m in range(n_sub)
        for code, a in enumerate(anchors)
    ]
    adf = spark.createDataFrame(
        spark.sparkContext.parallelize(arows, 1),
        "subspace int, code int, aq array<bigint>",
    )
    qv = global_int_grid(F.col(vec_col))
    sub = df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[F.slice(qv, m * d_sub + 1, d_sub) for m in range(n_sub)])
        ).alias("subspace", "sq"),
    )
    dist = F.aggregate(
        F.zip_with("sq", "aq", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = sub.join(F.broadcast(adf), "subspace").select(
        F.col(id_col), "subspace", "code", dist.alias("dist")
    )
    return (
        scored.groupBy(id_col, "subspace")
        .agg(F.min(F.struct("dist", "code")).alias("_m"))
        .select(F.col(id_col), "subspace", F.col("_m.code").alias("code"))
    )


def pq_train_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int = 8,
    d_sub: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    sample_rate: float | None = None,
) -> list[list[list[float]]]:
    """L2 Lloyd's k-means per SUBSPACE (the real PQ training step,
    float), ALL subspaces trained together: each iteration is ONE job
    — vectors explode to (subspace, subvector) rows, broadcast-join
    the current centroid table (n_sub x n_codes rows of driver-literal
    state), argmin-assign by |x-c|^2 = |c|^2 - 2x.c (x's own norm
    drops out of the argmin; MIN over a (score, code) struct breaks
    ties to the lowest code), and re-average per (subspace, cell, dim).
    Means use the decimal-sum house reduction: a double avg is
    order-dependent, which made trained codebooks — and downstream
    recall — vary with partitioning across sessions. Init: the first
    ``n_codes`` vectors' subvectors. Only the n_sub x n_codes x d_sub
    codebook matrix ever reaches the driver.

    ``sample_rate``: train on a deterministic content-hash sample of
    the corpus (operators/sampling.py hash draw — stable across
    engines, partitionings, and retries). Codebook quality needs a
    representative sample, not the corpus: at 100 TB training on
    every vector multiplies the dominant cost (assign-join × iters)
    for no recall gain, so production passes ~10^5-10^6 sampled rows
    here and encodes the full corpus with the result."""
    spark = df.sparkSession
    if sample_rate is not None:
        from etlalchemy_spark.operators.sampling import bernoulli_sample

        df = bernoulli_sample(df, F.col(id_col), sample_rate, salt="pqtrain:")
    init = (
        df.select(F.col(vec_col).alias("_v"))
        .orderBy(F.col(id_col))
        .limit(n_codes)
        .collect()
    )
    if len(init) < n_codes:
        raise ValueError(
            f"pq_train_codebooks: only {len(init)} training vectors "
            f"available (sample_rate={sample_rate}) but n_codes={n_codes} "
            "centroids requested — raise the sample rate or lower n_codes"
        )
    books: list[list[list[float]]] = [
        [[float(r["_v"][m * d_sub + d]) for d in range(d_sub)] for r in init]
        for m in range(n_sub)
    ]
    # one lazy materialization of the exploded subvectors: every Lloyd
    # iteration (and nothing else) replays from it, instead of paying
    # the upstream scan + explode once per iteration; bounded by the
    # (sampled) training set, the same budget the assignment join pays
    sub = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec_col).cast("array<double>"), m * d_sub + 1, d_sub)
                    for m in range(n_sub)
                ]
            )
        ).alias("subspace", "sv"),
    ).localCheckpoint(eager=False)
    for _ in range(iters):
        crows = [
            (m, c, books[m][c], float(sum(x * x for x in books[m][c])))
            for m in range(n_sub)
            for c in range(n_codes)
        ]
        # single slice (prefix.py's pattern): the codebook is a few
        # hundred rows — one python partition, not defaultParallelism
        cdf = spark.createDataFrame(
            spark.sparkContext.parallelize(crows, 1),
            "subspace int, code int, cv array<double>, cnorm double",
        )
        score = F.col("cnorm") - 2.0 * dot_double(F.col("sv"), F.col("cv"))
        # group on (row id, subspace) — grouping on the subvector VALUE
        # would collapse duplicate subvectors and mis-weight the means
        assigned = (
            sub.join(F.broadcast(cdf), "subspace")
            .select("_id", "subspace", "sv", score.alias("_s"), "code")
            .groupBy("_id", "subspace", "sv")
            .agg(F.min(F.struct(F.col("_s"), F.col("code"))).alias("_m"))
            .select("subspace", F.col("_m.code").alias("_cell"), "sv")
        )
        means = (
            assigned.select("subspace", "_cell", F.posexplode("sv").alias("_pos", "_x"))
            .groupBy("subspace", "_cell", "_pos")
            .agg(
                (
                    F.sum(F.col("_x").cast("decimal(24,16)")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("_mean")
            )
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_key.setdefault((r["subspace"], r["_cell"]), {})[r["_pos"]] = r["_mean"]
        books = [
            [
                [
                    by_key.get((m, c), {}).get(p, books[m][c][p])
                    for p in range(d_sub)
                ]
                for c in range(n_codes)
            ]
            for m in range(n_sub)
        ]
    return books


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    d_sub: int = 8,
) -> DataFrame:
    """Asymmetric distance computation, relational form: the lookup
    table (query-to-centroid distance per (subspace, code), computed
    driver-side — n_sub x n_codes doubles) rides the same broadcast
    codebook dimension used for encoding. Each vector explodes to its
    subvectors, one broadcast join + struct-MIN argmin picks its code
    per subspace AND the code's LUT entry, and a per-id SUM of the
    n_sub LUT terms is the approximate distance — encode and score in
    ONE pass, two bounded aggregates, no plan-literal blowup. In the
    deployed shape the corpus is PRE-encoded (8 small ints/vector, a
    32x memory cut vs float32); this operator fuses encode+score so
    the fixture query stays self-contained. Top-k by approximate
    distance via TakeOrderedAndProject + O(k) rank aggregate (same
    shape as _topk_ranked — no WindowExec); unit-norm corpus makes the
    L2 ranking a cosine ranking."""
    spark = df.sparkSession
    n_sub = len(codebooks)
    crows = []
    for m in range(n_sub):
        off = m * d_sub
        qs = [float(x) for x in query_vec[off : off + d_sub]]
        for c, cent in enumerate(codebooks[m]):
            lut = float(sum((a - b) * (a - b) for a, b in zip(qs, cent)))
            cnorm = float(sum(x * x for x in cent))
            crows.append((m, c, cent, cnorm, lut))
    cdf = spark.createDataFrame(
        spark.sparkContext.parallelize(crows, 1),
        "subspace int, code int, cv array<double>, cnorm double, lut double",
    )
    sub = df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec_col).cast("array<double>"), m * d_sub + 1, d_sub)
                    for m in range(n_sub)
                ]
            )
        ).alias("subspace", "sv"),
    )
    assign_score = F.col("cnorm") - 2.0 * dot_double(F.col("sv"), F.col("cv"))
    per_sub = (
        sub.join(F.broadcast(cdf), "subspace")
        .select(F.col(id_col), "subspace", assign_score.alias("_s"), "code", "lut")
        .groupBy(id_col, "subspace")
        .agg(F.min(F.struct(F.col("_s"), F.col("code"), F.col("lut"))).alias("_m"))
    )
    # canonical-order sum (r14): a plain double SUM of the n_sub LUT
    # terms re-associates in shuffle-merge order, so approx_dist
    # drifted at the ULP level across partitionings — enough to flip
    # shortlist-BOUNDARY candidates run to run (observed: suite-order-
    # dependent recall 7 vs 8 at the 50k scale pin). Collecting the
    # n_sub terms and folding them in SUBSPACE ORDER pins the score to
    # the one canonical left-to-right float64 sum — deterministic
    # under any partitioning, and exactly the value a single-machine
    # ADC implementation computes. n_sub is 8: the per-row interpreted
    # fold is negligible next to the assign join it follows.
    scored = per_sub.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("subspace", F.col("_m.lut").alias("lut")))),
            F.lit(0.0),
            lambda acc, e: acc + e["lut"],
        ).alias("approx_dist")
    )
    top = scored.orderBy(F.col("approx_dist").asc(), F.col(id_col)).limit(k)
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("approx_dist"), F.col(id_col)))
    )
    return (
        top.agg(arr.alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_e"))
        .select(
            F.col(f"_e.{id_col}").alias(id_col),
            F.col("_e.approx_dist").alias("approx_dist"),
            (F.col("_pos") + 1).cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental ANN index (r7, store layout reworked r8): persisted
# hyperplane-bucket store with batch append — the similarity mirror of
# the dedup band store. Index once, append arriving batches (each
# signed once, batch-sized cost), probe the STORE at query time; the
# corpus is never re-hashed. The store is laid out
# ``partitionBy("bucket")`` so a probe prunes to ONE directory (at
# 100 TB the store itself is large; a probe that scans every bucket's
# row groups scales with the store, not the answer), and the version
# tag lives in a one-line ``_INDEX_VERSION`` sidecar read via the
# Hadoop FileSystem API — the guard costs zero data scan (r7 verdict
# #7; `_`-prefixed files are invisible to parquet readers).


def bucket_index_version(dim: int, n_planes: int, seed: int) -> str:
    """Version tag persisted with the store: probing a store built with
    different planes would silently return wrong buckets — same guard
    discipline as the dedup band store's sig_version. The DIMENSION is
    part of the tag because hyperplanes(dim, ...) chunks one LCG stream
    per plane by dim: stores built at different dims share no planes
    even with equal (n_planes, seed), so a dim-blind tag would wave
    exactly the mismatch it exists to catch (r7 review finding)."""
    return f"hp:{dim}:{n_planes}:{seed}:v1"


_SIDECAR = "_INDEX_VERSION"


def _sidecar_fs_path(spark, store_path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(store_path, _SIDECAR)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def read_index_version(spark, store_path: str) -> str | None:
    """The store's version tag from the sidecar — metadata-only, no
    parquet row group is touched. None if the sidecar doesn't exist."""
    fs, p = _sidecar_fs_path(spark, store_path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # commons-io ships with Spark; byte-level Py4J reads don't
        # round-trip cleanly
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    except Exception as exc:  # checksum/IO failure = corrupted sidecar
        raise ValueError(
            f"bucket index version sidecar at {p} is unreadable "
            f"(corrupted store?): {exc}"
        ) from None
    finally:
        stream.close()
    return text.strip() or None


def _write_index_version(spark, store_path: str, tag: str) -> None:
    fs, p = _sidecar_fs_path(spark, store_path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(f"{tag}\n", "utf-8"))
    finally:
        out.close()


def _require_index_version(spark, store_path: str, tag: str) -> None:
    found = read_index_version(spark, store_path)
    if found != tag:
        raise ValueError(
            f"bucket index at {store_path} carries version {found!r}, "
            f"expected {tag!r} — rebuild or probe with matching planes "
            "(a missing/None sidecar means an unversioned or corrupted "
            "store and is refused the same way)"
        )


def append_bucket_index(
    store_path: str,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 6,
    seed: int = 42,
) -> None:
    """Sign ONE batch against the literal hyperplanes and append its
    (id, idx_version) rows under ``bucket=<b>`` partition directories.
    Cost scales with the batch, never the indexed corpus; the store is
    append-only (no read-modify-write), so concurrent batch appends
    compose. A re-appended batch only duplicates candidate rows, which
    the probe's left-semi fetch ignores — append is idempotent for
    RESULT correctness (unlike the dedup band store, where a replayed
    batch would fabricate self-duplicate pairs and needs the
    disjointness guard); the storage waste is reclaimed by
    compact_bucket_index. Appending against a store signed with
    DIFFERENT planes fails loudly here, not just at probe time."""
    spark = df.sparkSession
    tag = bucket_index_version(dim, n_planes, seed)
    existing = read_index_version(spark, store_path)
    if existing is not None and existing != tag:
        raise ValueError(
            f"bucket index at {store_path} carries version {existing!r}; "
            f"refusing to append rows signed as {tag!r} — mixed-plane "
            "stores return wrong buckets silently"
        )
    planes = hyperplanes(dim, n_planes, seed)
    rows = lsh_buckets_exact(df, id_col, vec_col, planes).withColumn(
        "idx_version", F.lit(tag)
    )
    # Sidecar BEFORE data (r8 review): rows-then-sidecar left a crash
    # window where a first append died after writing rows signed with
    # planes A, a later first append stamped the sidecar with planes B,
    # and the mixed store probed as valid. Sidecar-first means a crash
    # leaves a sidecar with no rows (probe fails loudly on the missing
    # parquet) and a second different-plane append is refused.
    if existing is None:
        _write_index_version(spark, store_path, tag)
    # direct append: files-per-bucket tracks upstream partitions until
    # compact_bucket_index rewrites each bucket as one file (adding a
    # repartition("bucket") here costs a shuffle per append and
    # measured slower than the small-file commit it avoids)
    rows.write.mode("append").partitionBy("bucket").parquet(store_path)


def query_bucket_exact(spark, query_vec: list[float], n_planes: int, seed: int) -> int:
    """The query vector's bucket under the DECIMAL-exact sign
    convention — computed on a one-row frame through the same
    lsh_buckets_exact expression the store was signed with, so a
    near-zero plane dot can never flip sign between index and probe
    (driver-side float arithmetic could). O(dim) work, one collect of
    one int."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    one = spark.range(1).select(
        F.lit(0).alias("_qid"), _lit_vec(query_vec).alias("_qv")
    )
    return lsh_buckets_exact(one, "_qid", "_qv", planes).collect()[0]["bucket"]


def probe_bucket_index(
    spark,
    store_path: str,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Query-time path: version-check the SIDECAR (no data scan),
    compute the query's bucket decimal-exactly from the literal vector
    (the query need not be in the store), read ONLY that bucket's
    partition directory (partition pruning — plan-pinned in
    tests/test_bucket_index.py), fetch the candidate vectors from the
    corpus with a left-semi join, exact-rerank. The full-corpus work
    happened at INDEX time; the probe touches one directory + k
    vectors. Wrong-version or unversioned stores fail loudly before
    any data is read."""
    tag = bucket_index_version(len(query_vec), n_planes, seed)
    _require_index_version(spark, store_path, tag)
    qb = query_bucket_exact(spark, query_vec, n_planes, seed)
    cand_ids = (
        spark.read.parquet(store_path).where(F.col("bucket") == qb).select(id_col)
    )
    return _candidates_topk(cand_ids, corpus, id_col, vec_col, query_vec, k)


def compact_bucket_index(spark, store_path: str, id_col: str) -> dict[str, int]:
    """Offline maintenance: collapse re-appended duplicate rows (one
    row per id — same planes ⇒ same bucket, enforced by the version
    guard) and rewrite each bucket's directory as one well-sized file,
    so probe cost tracks LIVE ids, not append history. The row-level
    idx_version audit is null-safe (~eqNullSafe — a NULL version must
    fail the check, not slide through a != filter; ADVICE r7). Rewrite
    goes to a sibling directory then swaps via the checked rename
    protocol (layout.swap_directory): a crash can leave the store
    renamed aside — a LOUD missing-path failure with one-rename
    recovery — never a silently truncated store. Returns
    {"rows_before", "rows_after"} for the caller's audit log."""
    tag = read_index_version(spark, store_path)
    if tag is None:
        raise ValueError(f"bucket index at {store_path} has no version sidecar")
    idx = spark.read.parquet(store_path)
    # ONE aggregate job folds the three former scans (version audit
    # limit-collect, rows_before count, post-write re-count): bad-row
    # count, total rows, and distinct ids — dropDuplicates([id]) keeps
    # exactly one row per id, so rows_after == countDistinct(id)
    # (r10 verdict ask 6: compaction was the slowest gate entry, and
    # its cost was many small driver-issued jobs, not data volume)
    audit = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (~F.col("idx_version").eqNullSafe(F.lit(tag))).cast("long")
        ).alias("n_bad"),
        F.countDistinct(id_col).alias("n_live"),
    ).collect()[0]
    if audit["n_bad"]:
        raise ValueError(
            f"bucket index at {store_path} has {audit['n_bad']} rows whose "
            f"version is NULL/None or not {tag!r} — store is corrupt; "
            "rebuild instead of compacting"
        )
    # dropDuplicates on id alone: the version audit above guarantees a
    # single plane set, so duplicate ids carry identical buckets.
    compacted = idx.dropDuplicates([id_col]).repartition("bucket")
    tmp = store_path.rstrip("/") + "__compacting"
    compacted.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    _write_index_version(spark, tmp, tag)

    from etlalchemy_spark.operators.layout import swap_directory

    swap_directory(spark, store_path, tmp)
    return {"rows_before": audit["n"], "rows_after": audit["n_live"]}


def semantic_centroid_count(n: int) -> int:
    """The square-root blocking optimum for cluster-blocked pair
    verification: with k centroids, assignment costs n·k pair cosines
    and in-cell verification costs n·(n/k)/2; k = ceil(sqrt(n/2))
    equalizes them at n·sqrt(n/2). The DuckDB oracle derives the same
    k via CEIL(SQRT(COUNT(*)/2.0)) — IEEE sqrt is correctly rounded in
    both engines, so the counts agree exactly."""
    import math

    return max(1, math.ceil(math.sqrt(n / 2.0)))


def semantic_dedup_keep_first(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.3,
    centroid_ids: list[int] | None = None,
    n_centroids: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding
    space (decimal-exact max-cosine assignment to existing-row
    centroids, ties to the lowest centroid id — the same cell
    machinery as ivf_topk_exact), then inside each cell verify pairs
    with the decimal-exact cosine and apply the KEEP-FIRST policy: a
    document is dropped iff some LOWER-id document in its cell sits
    within ``threshold`` cosine. Output is the drop list —
    (id, dup_of = the smallest such keeper, n_dups = how many keepers
    beat it) — which a curation pipeline anti-joins against the
    corpus. Keep-first needs no iteration or connected components:
    the verdict for one doc depends only on pairs pointing DOWN to
    smaller ids.

    CENTROID COUNT IS DERIVED FROM THE CORPUS (r8 verdict fix): with
    k centroids and cells of t = n/k, the two cost terms are
    assignment (n·k pair cosines) and in-cell verification
    (k·t²/2 = n·t/2). A FIXED k makes verification quadratic in the
    corpus (the r8 scale-killer: k=8 ⇒ all-pairs/8); k ∝ n makes
    ASSIGNMENT quadratic instead. The balance point is
    k = ceil(sqrt(n/2)), where both terms equal n·sqrt(n/2) — the
    square-root blocking optimum. Default: one bounded count() picks
    k; centroids are the k smallest-id rows (sort+limit is a
    distributed TakeOrdered; k rows broadcast). Callers can override
    with an explicit ``n_centroids`` (e.g. a k-means-style budget) or
    pin exact ``centroid_ids``. At 100 TB, push k beyond broadcast
    range only with hierarchical (coarse→fine) assignment; cells stay
    ~sqrt(2n) so the verify join never degenerates to all-pairs."""
    if centroid_ids is not None:
        cents = df.where(F.col(id_col).isin(centroid_ids)).select(
            F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec")
        )
    else:
        if n_centroids is None:
            n = df.count()  # bounded: one scalar aggregate
            n_centroids = semantic_centroid_count(n)
        cents = (
            df.orderBy(F.col(id_col))
            .limit(int(n_centroids))
            .select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
        )
    # one lazy materialization: _semantic_drop_list references withc on
    # BOTH join sides, so without a cut the centroid assignment (the
    # n x k cosine pass) and the upstream scan execute twice; the frame
    # is one (id, vec, cell) row per corpus row — the same footprint
    # the verify join shuffles anyway
    withc = (
        df.select(F.col(id_col), F.col(vec_col))
        .join(semantic_cells(df, id_col, vec_col, cents), id_col)
        .localCheckpoint(eager=False)
    )
    return _semantic_drop_list(withc, withc, id_col, vec_col, threshold)


def semantic_cells(
    df: DataFrame, id_col: str, vec_col: str, cents: DataFrame
) -> DataFrame:
    """(id, _cell): decimal-exact max-cosine assignment to the centroid
    set ``cents`` (columns _cid, _cvec). Argmax via one MAX(struct)
    aggregate — deterministic tie-break (highest cosine, then lowest
    centroid id), no window shuffle. NULL cosines (zero-norm vectors)
    sink below every real score."""
    pairs = df.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(cents))
    scored = _exact_cosine_best(pairs, [id_col, "_cid"], vec_col, "_cvec")
    best = F.max(
        F.struct(
            F.coalesce(F.col("cosine"), F.lit(-2.0)).alias("c"),
            (-F.col("_cid")).alias("negcid"),
            F.col("_cid").alias("cid"),
        )
    )
    return scored.groupBy(id_col).agg(best.getField("cid").alias("_cell"))


def _semantic_drop_list(
    lower: DataFrame, upper: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Keep-first pair verify: (id, dup_of, n_dups) for every ``upper``
    row beaten by a LOWER-id ``lower`` row in the same cell within the
    cosine threshold. Both inputs carry (id, vec, _cell); the join is
    cell-blocked — never all-pairs."""
    a = lower.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_cell")
    b = upper.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_cell")
    # round-robin spread of the candidate pairs BEFORE the cosine
    # verify: the cell join's output hangs off an exchange keyed by
    # _cell (~sqrt(2n) distinct values, sizes skewed), which AQE
    # coalesces to a couple of partitions at fixture scale — the whole
    # 64x-explode decimal-cosine battery then ran in 2 tasks (profiled
    # 6.5 s of a 10.6 s run, r13 optimization round). Pair rows are
    # skinny (2 ids + 2 vectors); the keyless exchange costs far less
    # than the per-pair cosine work it parallelizes, at any scale —
    # and the verify's own groupBy(id_a, id_b) re-exchanges anyway,
    # so no partitioning is lost
    cand = (
        a.join(b, "_cell")
        .where(F.col("id_a") < F.col("id_b"))
        .repartition(a.sparkSession.sparkContext.defaultParallelism)
    )
    sc = _exact_cosine_best(cand, ["id_a", "id_b"], "_va", "_vb").where(
        F.col("cosine") >= threshold
    )
    return sc.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("dup_of"), F.count(F.lit(1)).alias("n_dups")
    )


def semantic_cell_version(centroid_ids: list[int], threshold: float) -> str:
    """Store version tag binding the centroid set AND threshold: a
    store assigned under one codebook can never be silently stepped
    against another (the lsh_band_store sig_version discipline)."""
    import hashlib

    key = ",".join(str(i) for i in sorted(centroid_ids)) + f"|t={threshold!r}"
    return "semcells:" + hashlib.md5(key.encode()).hexdigest()[:16]


def semantic_dedup_step(
    store: DataFrame | None,
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    cents: DataFrame,
    threshold: float,
    version_tag: str,
) -> tuple[DataFrame, DataFrame]:
    """Incremental SemDeDup (the lsh_band_store/incremental ANN shape
    for embeddings — r8 verdict #8): one batch is cell-assigned and
    verified against the persisted cell store PLUS its own lower-id
    rows; per-batch cost is (batch × centroids) assignment + pairs in
    the touched cells only (store rows outside the batch's cells are
    pruned by a left-semi join, i.e. partition-prunable when the store
    is written partitioned by _cell). Returns (drop list for the
    batch, the batch's store rows to append). The store holds EVERY
    seen vector — keep-first verdicts cite the smallest matching id,
    dropped or not, so id-ordered replay reproduces the one-shot
    drop list EXACTLY (gate-pinned: `dedup_semantic_incremental`
    shares the one-shot oracle). ORDER-INVARIANT: the step emits BOTH
    directions — batch rows beaten by (store ∪ batch) lower ids, AND
    store rows beaten by lower-id batch arrivals — so each (a, b)
    pair is examined exactly once, when the later of the two batches
    lands. The step therefore returns PARTIAL drop rows; callers
    aggregate across batches with groupBy(id).agg(MIN(dup_of),
    SUM(n_dups)), which equals the one-shot drop list under ANY
    arrival order (streaming replay included — per-batch overwrite
    dirs keep re-deliveries idempotent). Version-tag mismatches fail
    loudly before any pair math."""
    bc = batch.select(F.col(id_col), F.col(vec_col)).join(
        semantic_cells(batch, id_col, vec_col, cents), id_col
    )
    lower = bc
    pruned = None
    if store is not None:
        if "cell_version" not in store.columns:
            raise ValueError(
                f"semantic cell store has no cell_version column — refusing "
                f"to step an unversioned store (expected {version_tag})"
            )
        versions = sorted(
            str(r[0]) for r in store.select("cell_version").distinct().collect()
        )
        if versions not in ([], [version_tag]):
            raise ValueError(
                f"semantic cell store version {versions} != expected "
                f"{version_tag!r} — re-assign the store instead"
            )
        pruned = store.select(F.col(id_col), F.col(vec_col), "_cell").join(
            bc.select("_cell").distinct(), "_cell", "left_semi"
        )
        lower = pruned.unionByName(bc)
    drops = _semantic_drop_list(lower, bc, id_col, vec_col, threshold)
    if pruned is not None:
        # new evidence against OLD rows: lower-id batch arrivals can
        # beat store rows that arrived earlier out of id order
        drops = drops.unionByName(
            _semantic_drop_list(bc, pruned, id_col, vec_col, threshold)
        )
    return drops, bc.withColumn("cell_version", F.lit(version_tag))


def ivf_kmeans_exact_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k_cells: int = 8,
    iters: int = 2,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF top-k whose coarse quantizer is TRAINED k-means, yet fully
    oracle-exact (r11 verdict #5: port the PQ bit-determinism to the
    IVF trainer). Every arithmetic step is engine-portable: vectors
    live on the shared integer grid (global_int_grid — identical IEEE
    multiply + floor), Lloyd assignment is an integer-L2 argmin (ties
    to the lowest cell via (dist, cell) struct min), and the mean
    update RE-QUANTIZES each centroid onto the grid with
    floor(sum/count + 0.5) — one correctly-rounded double division of
    exact int64s, so DuckDB replays the whole training as unrolled
    CTEs and lands on bit-identical centroids. Fixed ``iters``
    supersteps keep the plan static (the k-core/LPA discipline).

    Scale shape: per iteration ONE broadcast join of the (id, dim, x)
    long form against the k_cells x dim centroid table + two bounded
    aggregates; only k_cells x dim integer sums reach the driver. The
    probed-candidate scoring is the decimal-exact cosine on the
    ORIGINAL floats. At 100 TB you train on a content-hash sample
    (pq_train_codebooks' sample_rate pattern) and assign the full
    corpus once — the assignment pass is the same broadcast join."""
    import math

    spark = df.sparkSession
    g = df.select(
        F.col(id_col),
        F.posexplode(global_int_grid(F.col(vec_col))).alias("dim", "x"),
    )
    init = (
        df.select(global_int_grid(F.col(vec_col)).alias("qv"))
        .orderBy(F.col(id_col))
        .limit(k_cells)
        .collect()
    )
    if len(init) < k_cells:
        # r12 ADVICE: with fewer rows than cells, cents[c] below would
        # raise a bare IndexError (or cents[0] on an empty df) far from
        # the cause — refuse with the actual counts instead.
        raise ValueError(
            f"ivf_kmeans_exact_topk needs at least k_cells={k_cells} rows "
            f"to seed the coarse quantizer; df has only {len(init)}"
        )
    cents: list[list[int]] = [[int(x) for x in r["qv"]] for r in init]
    dim = len(cents[0])

    def _cdf():
        rows = [(c, d, cents[c][d]) for c in range(k_cells) for d in range(dim)]
        return F.broadcast(
            spark.createDataFrame(
                spark.sparkContext.parallelize(rows, 1), "cid int, dim int, c long"
            )
        )

    def _cells():
        dd = F.col("x") - F.col("c")
        dist = (
            g.join(_cdf(), "dim")
            .groupBy(id_col, "cid")
            .agg(F.sum(dd * dd).alias("dist"))
        )
        return dist.groupBy(id_col).agg(
            F.min(F.struct("dist", "cid")).getField("cid").alias("cell")
        )

    for _ in range(iters):
        sums = (
            g.join(_cells(), id_col)
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        got: dict[tuple[int, int], int] = {}
        for r in sums:
            # identical to the oracle's FLOOR(s::DOUBLE / n::DOUBLE + 0.5):
            # python int/int is the same correctly-rounded IEEE division
            got[(r["cell"], r["dim"])] = math.floor(r["s"] / r["n"] + 0.5)
        cents = [
            [got.get((c, d), cents[c][d]) for d in range(dim)]
            for c in range(k_cells)
        ]

    cells = _cells()
    qq = [math.floor(float(x) * 127 + 0.5) for x in query_vec]
    qdist = sorted(
        (sum((qq[d] - cents[c][d]) ** 2 for d in range(dim)), c)
        for c in range(k_cells)
    )
    probe = [c for _, c in qdist[:n_probe]]
    cand = cells.where(F.col("cell").isin(probe)).select(id_col)
    cands = df.join(cand, id_col)
    scored = exact_cosine(cands, [id_col], F.col(vec_col), _lit_vec(query_vec))
    return _topk_ranked(scored, id_col, k)


def pq_adc_exact_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    anchors: list[list[int]],
    n_sub: int = 8,
    d_sub: int = 8,
    k: int = 10,
) -> DataFrame:
    """ADC top-k that is fully oracle-exact — the exact twin of
    pq_adc_topk's float scoring, completing the exact-twin set for
    every ANN variant (LSH/multiprobe/IVF/IVF-kmeans already have
    theirs; r12). Vectors AND the query live on the shared integer
    grid, encoding is pq_codes_exact's integer argmin, and the ADC
    lookup table is the integer L2 between the query's grid
    subvectors and the anchors — so the approximate distance
    sum(LUT[m, code_m]) is a pure int64 and top-k ties break to the
    lowest id identically on any engine. Same scale shape as the
    float path: codebook broadcast, one encode join, one per-id sum,
    TakeOrderedAndProject + O(k) rank aggregate."""
    spark = df.sparkSession
    qq = [int(__import__("math").floor(float(x) * 127 + 0.5)) for x in query_vec]
    lrows = []
    for m in range(n_sub):
        qs = qq[m * d_sub : (m + 1) * d_sub]
        for code, a in enumerate(anchors):
            av = [int(x) for x in a[m * d_sub : (m + 1) * d_sub]]
            lrows.append(
                (m, code, int(sum((x - y) * (x - y) for x, y in zip(qs, av))))
            )
    ldf = spark.createDataFrame(
        spark.sparkContext.parallelize(lrows, 1), "subspace int, code int, lut long"
    )
    codes = pq_codes_exact(df, id_col, vec_col, anchors, n_sub=n_sub, d_sub=d_sub)
    scored = (
        codes.join(F.broadcast(ldf), ["subspace", "code"])
        .groupBy(id_col)
        .agg(F.sum("lut").cast("bigint").alias("adc_dist"))
    )
    top = scored.orderBy("adc_dist", F.col(id_col)).limit(k)
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("adc_dist"), F.col(id_col)))
    )
    return (
        top.agg(arr.alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_e"))
        .select(
            F.col(f"_e.{id_col}").alias(id_col),
            F.col("_e.adc_dist").alias("adc_dist"),
            (F.col("_pos") + 1).cast("int").alias("rank"),
        )
    )
