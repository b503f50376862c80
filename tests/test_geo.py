"""Geo family (queries/geo.py): the geohash must match an independent
from-the-spec implementation (not just the SQL twin — both engines
sharing one wrong formula would still gate green), and grid-kNN must
agree with a brute-force scan under its documented ring-bounded
semantics."""

import sys

sys.path.insert(0, ".")

from etlalchemy_spark.registry import all_queries

SF = "/root/testdata/sf0.001"

_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def ref_geohash(lat_mdeg: int, lon_mdeg: int, chars: int = 8) -> str:
    """Textbook bisection geohash (floating point, independent of the
    integer-arithmetic production path)."""
    lat_lo, lat_hi = -90000.0, 90000.0
    lon_lo, lon_hi = -180000.0, 180000.0
    bits = []
    even = True
    while len(bits) < chars * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon_mdeg >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat_mdeg >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for c in range(chars):
        v = 0
        for b in bits[c * 5 : c * 5 + 5]:
            v = (v << 1) | b
        out.append(_ALPHABET[v])
    return "".join(out)


def test_geohash_matches_reference_implementation(spark):
    rows = (
        all_queries()["geo_geohash_encode"].fn(spark, SF).limit(200).collect()
    )
    assert rows
    for r in rows:
        lat3 = round(r.lat * 1000)
        lon3 = round(r.lon * 1000)
        assert r.geohash8 == ref_geohash(lat3, lon3), (lat3, lon3)
        assert r.geohash4 == r.geohash8[:4]


def test_grid_knn_matches_bruteforce_within_ring(spark):
    from etlalchemy_spark.queries.geo import _CELL, _KNN_K, _coords_spark
    from etlalchemy_spark.operators.sampling import hash_bucket
    from etlalchemy_spark.queries._util import t as load
    import pyspark.sql.functions as F

    # sf0.01: the 2% hash sample lands ~0 of sf0.001's 150 customers
    sf = "/root/testdata/sf0.01"
    got = {
        (r.c_custkey, r.rank): (r.s_suppkey, r.dist2_millideg)
        for r in all_queries()["geo_grid_knn"].fn(spark, sf).collect()
    }

    c = load(spark, sf, "customer")
    alat, alon = _coords_spark(F.col("c_custkey"), "geo:")
    a = (
        c.where(hash_bucket(F.col("c_custkey"), "gsel:") < 20000)
        .select("c_custkey", alat.alias("lat3"), alon.alias("lon3"))
        .collect()
    )
    s = load(spark, sf, "supplier")
    blat, blon = _coords_spark(F.col("s_suppkey"), "geos:")
    b = s.select("s_suppkey", blat.alias("lat3"), blon.alias("lon3")).collect()

    def cell(lat3, lon3):
        return ((lat3 + 90000) // _CELL, (lon3 + 180000) // _CELL)

    assert a, "sample selected no query points"
    for qa in a:
        ca = cell(qa.lat3, qa.lon3)
        cands = [
            (
                (qa.lat3 - sb.lat3) ** 2 + (qa.lon3 - sb.lon3) ** 2,
                sb.s_suppkey,
            )
            for sb in b
            if abs(cell(sb.lat3, sb.lon3)[0] - ca[0]) <= 1
            and abs(cell(sb.lat3, sb.lon3)[1] - ca[1]) <= 1
        ]
        cands.sort()
        for rank, (d2, sk) in enumerate(cands[:_KNN_K], start=1):
            assert got[(qa.c_custkey, rank)] == (sk, d2)
