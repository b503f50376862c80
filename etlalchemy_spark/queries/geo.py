"""Geospatial operators (r10): geohash encoding, grid-bucketed spatial
kNN join, bounding-box containment, and cell-density hotspots.

Upstream etlalchemy has no spatial surface (SURVEY.md §2 Table A) —
this is mandated extension surface: training-data pipelines carry
lat/lon exhaust (user geo, EXIF, POI joins) and the scale-correct
spatial primitive is GRID BUCKETING: quantize to cells, equi-join on
cell ids (± one ring for kNN), verify distance only on candidates —
pairs bounded by cell density, never |A|×|B|. The same shape Spark's
own range-join and the MinHash-LSH family use.

Determinism: the fixture tables carry no coordinates, so points are
SYNTHESIZED content-addressed — integer milli-degrees derived from the
portable 60-bit md5 hash (operators/sampling.py), identical in both
engines. ALL geometry here is exact integer arithmetic (squared
equirectangular distance in milli-degrees, binary-subdivision geohash
bits); no trig, no floats, no cross-engine libm risk. The tradeoff —
planar distance, no antimeridian wrap — is documented per query; at
real scale you'd swap the distance kernel, not the join shape.

Geohash reference: the public Gustavo Niemeyer scheme — interleaved
binary subdivision of (lon, lat), base32-coded 5 bits per character
(alphabet 0-9 b-z minus a,i,l,o). Implemented from the spec as integer
arithmetic over both engines' SQL dialects (shiftright vs >>).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t
from etlalchemy_spark.queries.sampling import _bucket_sql

_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 20  # per axis; 40 bits total = 8 base32 chars


def _coords_sql(key_expr: str, prefix: str) -> str:
    """Integer milli-degree synthetic coordinates for a key, as SQL
    column exprs (DuckDB dialect; the hash twin is dialect-shared):
    lat3 in [-90000, 90000), lon3 in [-180000, 180000)."""
    lat = f"(({_bucket_sql(key_expr, prefix + 'lat:')}) % 180000 - 90000)"
    lon = f"(({_bucket_sql(key_expr, prefix + 'lon:')}) % 360000 - 180000)"
    return lat, lon


def _coords_spark(key, prefix: str):
    from etlalchemy_spark.operators.sampling import hash_bucket

    lat = (hash_bucket(key, prefix + "lat:") % 180000 - 90000).cast("bigint")
    lon = (hash_bucket(key, prefix + "lon:") % 360000 - 180000).cast("bigint")
    return lat, lon


def _geohash_expr(dialect: str, lat_col: str = "lat3", lon_col: str = "lon3") -> str:
    """Base32 geohash (8 chars / 40 bits) from integer milli-degree
    columns, as one SQL expression in the given dialect. Binary
    subdivision == floor((v - lo) * 2^bits / range) in exact integer
    arithmetic; bit interleave (lon first, per spec) and base32 slicing
    are plain shifts/masks. Values < 2^41 throughout — bigint-safe."""
    if dialect == "spark":
        shr = lambda x, n: f"shiftright({x}, {n})"  # noqa: E731
        idiv = lambda a, b: f"(({a}) div {b})"  # noqa: E731
    else:
        shr = lambda x, n: f"(({x}) >> {n})"  # noqa: E731
        idiv = lambda a, b: f"(({a}) // {b})"  # noqa: E731
    latb = idiv(f"(CAST({lat_col} AS BIGINT) + 90000) * 1048576", 180000)
    lonb = idiv(f"(CAST({lon_col} AS BIGINT) + 180000) * 1048576", 360000)
    # interleave: even bit positions (from MSB) take lon bits
    terms = []
    for i in range(_GH_BITS):
        terms.append(f"(({shr(f'_lonb', 19 - i)}) & 1) * {1 << (39 - 2 * i)}")
        terms.append(f"(({shr(f'_latb', 19 - i)}) & 1) * {1 << (38 - 2 * i)}")
    gh = " + ".join(terms)
    chars = " || ".join(
        f"substring('{_ALPHABET}', CAST((({shr('_gh', 35 - 5 * c)}) & 31) + 1 AS INT), 1)"
        for c in range(8)
    )
    # stage the subdivision + interleave through named fields so each
    # computes once (dialect-portable via nested scalar subexpressions
    # is not; callers wrap this in a projection pipeline instead)
    return latb, lonb, gh, chars


# --- geohash encode ----------------------------------------------------------------

def _geohash_sql() -> str:
    lat, lon = _coords_sql("c_custkey", "geo:")
    latb, lonb, gh, chars = _geohash_expr("duck")
    return f"""
WITH pts AS (
  SELECT c_custkey, {lat} AS lat3, {lon} AS lon3 FROM customer
),
b AS (SELECT c_custkey, lat3, lon3, {latb} AS _latb, {lonb} AS _lonb FROM pts),
g AS (SELECT c_custkey, lat3, lon3, {gh} AS _gh FROM b)
SELECT c_custkey,
       CAST(lat3 AS DOUBLE) / 1000.0 AS lat,
       CAST(lon3 AS DOUBLE) / 1000.0 AS lon,
       {chars} AS geohash8,
       substring({chars}, 1, 4) AS geohash4
FROM g
"""


@register("geo_geohash_encode", oracle=_geohash_sql(), tags=("geo", "scalar"))
def geo_geohash_encode(spark, sf_dir):
    """Geohash encoding (8-char base32, r10) — the standard
    prefix-shardable spatial key: equal prefixes = nearby cells, so a
    geohash column turns any spatial filter into a string-prefix scan
    and any proximity join into an equi-join on a prefix. Implemented
    from the public spec as EXACT integer arithmetic (binary
    subdivision = one multiply + one integer divide per axis, bit
    interleave = shifts/masks, base32 = substring lookups) — no
    floats, so both engines agree bit-for-bit. Coordinates are
    content-addressed synthetic milli-degrees (fixture tables carry no
    geo). Narrow map over the scan — shuffles nothing, scales
    linearly."""
    c = t(spark, sf_dir, "customer")
    lat, lon = _coords_spark(F.col("c_custkey"), "geo:")
    pts = c.select("c_custkey", lat.alias("lat3"), lon.alias("lon3"))
    latb, lonb, gh, chars = _geohash_expr("spark")
    b = pts.select(
        "c_custkey", "lat3", "lon3",
        F.expr(latb).alias("_latb"), F.expr(lonb).alias("_lonb"),
    )
    g = b.select("c_custkey", "lat3", "lon3", F.expr(gh).alias("_gh"))
    return g.select(
        "c_custkey",
        (F.col("lat3").cast("double") / 1000.0).alias("lat"),
        (F.col("lon3").cast("double") / 1000.0).alias("lon"),
        F.expr(chars).alias("geohash8"),
        F.expr(f"substring({chars}, 1, 4)").alias("geohash4"),
    )


# --- grid-bucketed kNN join --------------------------------------------------------

_CELL = 30000  # 30-degree cells in milli-degrees
_KNN_K = 3
_KNN_SAMPLE = 20000  # 2% of customers as query points


def _knn_sql() -> str:
    alat, alon = _coords_sql("c_custkey", "geo:")
    blat, blon = _coords_sql("s_suppkey", "geos:")
    return f"""
WITH a AS (
  SELECT c_custkey, {alat} AS lat3, {alon} AS lon3
  FROM customer
  WHERE {_bucket_sql("c_custkey", "gsel:")} < {_KNN_SAMPLE}
),
b AS (
  SELECT s_suppkey, {blat} AS lat3, {blon} AS lon3,
         ((({blat}) + 90000) // {_CELL}) AS clat,
         ((({blon}) + 180000) // {_CELL}) AS clon
  FROM supplier
),
probe AS (
  SELECT a.c_custkey, a.lat3, a.lon3,
         ((a.lat3 + 90000) // {_CELL}) + dy.d AS clat,
         ((a.lon3 + 180000) // {_CELL}) + dx.d AS clon
  FROM a, (VALUES (-1), (0), (1)) dy(d), (VALUES (-1), (0), (1)) dx(d)
),
cand AS (
  SELECT p.c_custkey, b.s_suppkey,
         (CAST(p.lat3 - b.lat3 AS BIGINT) * (p.lat3 - b.lat3)
          + CAST(p.lon3 - b.lon3 AS BIGINT) * (p.lon3 - b.lon3)) AS d2
  FROM probe p JOIN b ON p.clat = b.clat AND p.clon = b.clon
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                               ORDER BY d2, s_suppkey) AS rn
  FROM cand
)
SELECT c_custkey, s_suppkey, CAST(d2 AS BIGINT) AS dist2_millideg,
       CAST(rn AS BIGINT) AS rank
FROM rk WHERE rn <= {_KNN_K}
"""


@register("geo_grid_knn", oracle=_knn_sql(), tags=("geo", "join", "scale", "bench"))
def geo_grid_knn(spark, sf_dir):
    """Grid-bucketed spatial kNN join (r10): nearest suppliers for a
    2% content-addressed sample of customers. THE scale shape for
    spatial joins — quantize both sides to 30-degree cells, probe each
    query point against its 3x3 cell ring via an EQUI-join on cell id,
    rank only the candidates: pairs are bounded by ring density,
    never |A|x|B|, and the per-point rank window partitions on the
    query key (ring-sized groups). Distance is squared
    equirectangular in integer milli-degrees — exact, no trig; kNN
    semantics are ring-bounded (a point whose k-th neighbor lies
    beyond the adjacent ring reports fewer rows — the documented
    tradeoff every LSH-style bucketed search makes; widen _CELL to
    trade candidates for recall). No antimeridian wrap in the
    synthetic frame."""
    from pyspark.sql import Window as W

    from etlalchemy_spark.operators.sampling import hash_bucket

    c = t(spark, sf_dir, "customer")
    alat, alon = _coords_spark(F.col("c_custkey"), "geo:")
    a = (
        c.where(hash_bucket(F.col("c_custkey"), "gsel:") < _KNN_SAMPLE)
        .select("c_custkey", alat.alias("lat3"), alon.alias("lon3"))
    )
    s = t(spark, sf_dir, "supplier")
    blat, blon = _coords_spark(F.col("s_suppkey"), "geos:")
    b = s.select(
        "s_suppkey",
        blat.alias("blat3"),
        blon.alias("blon3"),
        ((blat + 90000) / _CELL).cast("bigint").alias("clat"),
        ((blon + 180000) / _CELL).cast("bigint").alias("clon"),
    )
    ring = F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
    probe = (
        a.withColumn("dy", ring)
        .withColumn("dx", ring)
        .select(
            "c_custkey", "lat3", "lon3",
            (((F.col("lat3") + 90000) / _CELL).cast("bigint") + F.col("dy")).alias("clat"),
            (((F.col("lon3") + 180000) / _CELL).cast("bigint") + F.col("dx")).alias("clon"),
        )
    )
    cand = probe.join(F.broadcast(b), ["clat", "clon"]).select(
        "c_custkey",
        "s_suppkey",
        (
            (F.col("lat3") - F.col("blat3")) * (F.col("lat3") - F.col("blat3"))
            + (F.col("lon3") - F.col("blon3")) * (F.col("lon3") - F.col("blon3"))
        ).alias("d2"),
    )
    w = W.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KNN_K)
        .select(
            "c_custkey",
            "s_suppkey",
            F.col("d2").cast("bigint").alias("dist2_millideg"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


# --- bounding-box containment ------------------------------------------------------

_BOXES = [
    # (name, lat_lo, lat_hi, lon_lo, lon_hi) in milli-degrees
    ("equatorial_band", -15000, 15000, -180000, 180000),
    ("north_atlantic", 30000, 60000, -60000, 0),
    ("east_asia", 20000, 50000, 100000, 145000),
    ("southern_ocean", -90000, -60000, -180000, 180000),
]


def _bbox_sql() -> str:
    lat, lon = _coords_sql("c_custkey", "geo:")
    rows = ", ".join(
        f"('{n}', {a}, {b}, {c}, {d})" for n, a, b, c, d in _BOXES
    )
    return f"""
WITH pts AS (
  SELECT c_custkey, c_acctbal, {lat} AS lat3, {lon} AS lon3 FROM customer
),
boxes(box, lat_lo, lat_hi, lon_lo, lon_hi) AS (VALUES {rows})
SELECT b.box,
       CAST(COUNT(p.c_custkey) AS BIGINT) AS n_points,
       CAST(ROUND(SUM(CAST(p.c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS acctbal_sum
FROM boxes b
LEFT JOIN pts p
  ON p.lat3 >= b.lat_lo AND p.lat3 < b.lat_hi
 AND p.lon3 >= b.lon_lo AND p.lon3 < b.lon_hi
GROUP BY b.box
"""


@register("geo_bbox_contains", oracle=_bbox_sql(), tags=("geo", "join"))
def geo_bbox_contains(spark, sf_dir):
    """Point-in-rectangle containment aggregation (r10) — count and
    account-balance mass of customers inside named bounding boxes
    (geofences / map-tile extents / shard boundaries). The box table
    is a tiny literal dimension BROADCAST to every executor; the
    containment predicate is a pure range conjunction on integer
    milli-degrees evaluated in the scan stage, so the fact side never
    shuffles for the join — only the k-box aggregate moves. LEFT join
    keeps empty boxes visible (a geofence with zero points is a
    signal, not an absent row)."""
    c = t(spark, sf_dir, "customer")
    lat, lon = _coords_spark(F.col("c_custkey"), "geo:")
    pts = c.select(
        "c_custkey", "c_acctbal", lat.alias("lat3"), lon.alias("lon3")
    )
    boxes = spark.createDataFrame(
        _BOXES, "box string, lat_lo long, lat_hi long, lon_lo long, lon_hi long"
    )
    # inner-join with the BOX side broadcast (a left join could only
    # broadcast the fact side), then left-join the k-row aggregate
    # back onto boxes so empty geofences stay visible
    j = pts.join(
        F.broadcast(boxes),
        (F.col("lat3") >= F.col("lat_lo"))
        & (F.col("lat3") < F.col("lat_hi"))
        & (F.col("lon3") >= F.col("lon_lo"))
        & (F.col("lon3") < F.col("lon_hi")),
        "inner",
    )
    agg = j.groupBy("box").agg(
        F.count("c_custkey").cast("bigint").alias("n_points"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("acctbal_sum"),
    )
    return boxes.select("box").join(agg, "box", "left").select(
        "box",
        F.coalesce(F.col("n_points"), F.lit(0)).cast("bigint").alias("n_points"),
        F.col("acctbal_sum"),
    )


# --- grid cell density hotspots ----------------------------------------------------

_DENS_CELL = 10000  # 10-degree density cells


def _density_sql() -> str:
    lat, lon = _coords_sql("o_custkey", "geod:")
    return f"""
WITH pts AS (
  SELECT (({lat}) + 90000) // {_DENS_CELL} AS clat,
         (({lon}) + 180000) // {_DENS_CELL} AS clon,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(clat AS BIGINT) AS cell_lat,
       CAST(clon AS BIGINT) AS cell_lon,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue
FROM pts
GROUP BY clat, clon
ORDER BY n_points DESC, cell_lat, cell_lon
LIMIT 20
"""


@register("geo_grid_density", oracle=_density_sql(), tags=("geo", "agg"))
def geo_grid_density(spark, sf_dir):
    """Spatial density hotspots (r10): order volume per 10-degree grid
    cell, top-20 — the heatmap/hotspot aggregation behind every ops
    dashboard and the skew PROFILER for spatial partitioning (the top
    cell's share tells you whether a cell-keyed join needs salting,
    same role etl_skew_profile plays for join keys). One narrow map
    (two integer divides) + one hash aggregate + TakeOrderedAndProject
    — the fact table is scanned once and only cell rows move."""
    o = t(spark, sf_dir, "orders")
    lat, lon = _coords_spark(F.col("o_custkey"), "geod:")
    pts = o.select(
        ((lat + 90000) / _DENS_CELL).cast("bigint").alias("cell_lat"),
        ((lon + 180000) / _DENS_CELL).cast("bigint").alias("cell_lon"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return (
        pts.groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            (F.sum("cents").cast("double") / 100.0).alias("revenue"),
        )
        .orderBy(F.desc("n_points"), "cell_lat", "cell_lon")
        .limit(20)
    )


# --- exact point-in-polygon (r11) ---------------------------------------------------------

# (lon3, lat3) milli-degree vertex rings (closed implicitly); one
# convex, one concave, one crossing the antimeridian-free far east
_POLYGONS = [
    ("triangle_eq", [(0, 0), (40000, 0), (20000, 30000)]),
    ("concave_arrow", [(-60000, -20000), (-20000, -20000), (-40000, 0),
                       (-20000, 20000), (-60000, 20000)]),
    ("east_quad", [(100000, 30000), (150000, 35000), (155000, 70000),
                   (95000, 60000)]),
]


def _pip_crossings(dialect: str, name: str, ring) -> str:
    """Unrolled exact ray-casting crossing count for one polygon, as a
    SQL expression over integer columns lon3/lat3. For edge
    (x1,y1)->(x2,y2) and point (px,py): the rightward horizontal ray
    crosses iff the edge straddles py AND sign((x2-x1)(py-y1)
    - (px-x1)(y2-y1)) == sign(y2-y1) — the cross-multiplied form of
    px < x_intersect, pure int64 (products < 1e11), no division, no
    floats, so both engines agree to the bit. Points ON an edge
    follow the half-open y-straddle convention (y1 > py) != (y2 > py),
    the classic Franklin PNPOLY rule."""
    terms = []
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        d = f"({x2 - x1} * (lat3 - {y1}) - (lon3 - {x1}) * {y2 - y1})"
        straddle = f"(({y1} > lat3) != ({y2} > lat3))"
        cross = f"({d} > 0) = ({y2 > y1})".replace("True", "TRUE").replace(
            "False", "FALSE"
        )
        terms.append(f"CASE WHEN {straddle} AND ({cross}) THEN 1 ELSE 0 END")
    return " + ".join(terms)


_PIP_SQL = f"""
WITH pts AS (
  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,4)) AS bal,
         {_coords_sql('c_custkey', 'geo:')[0]} AS lat3,
         {_coords_sql('c_custkey', 'geo:')[1]} AS lon3
  FROM customer
),
flags AS (
  SELECT c_custkey, bal,
         {', '.join(f'(({_pip_crossings("duckdb", n, ring)}) % 2 = 1) AS in_{i}'
                    for i, (n, ring) in enumerate(_POLYGONS))}
  FROM pts
)
{' UNION ALL '.join(
    f"SELECT '{n}' AS polygon, CAST(COUNT(*) FILTER (WHERE in_{i}) AS BIGINT) AS n_inside, "
    f"CAST(ROUND(COALESCE(SUM(bal) FILTER (WHERE in_{i}), 0), 4) AS DOUBLE) AS bal_inside "
    f"FROM flags"
    for i, (n, ring) in enumerate(_POLYGONS))}
ORDER BY polygon
"""


@register("geo_point_in_polygon", oracle=_PIP_SQL, tags=("geo",))
def geo_point_in_polygon(spark, sf_dir):
    """EXACT point-in-polygon aggregation (r11) — arbitrary-shape
    geofences (the bbox query's general case; one ring is concave, so
    the even-odd rule is actually load-bearing): Franklin-style ray
    casting with the division-free cross-multiplied crossing test —
    pure int64 arithmetic over milli-degree coordinates, no floats,
    no epsilon, both engines agree to the bit. The polygon rings are
    LITERALS unrolled into the projection (the `ts_ewma` idiom), so
    containment for all polygons evaluates IN THE SCAN STAGE with
    zero joins and zero extra shuffles — at 100 TB the only thing
    that moves is one k-row aggregate. Adding a polygon adds one
    column expression, not a join."""
    c = t(spark, sf_dir, "customer")
    lat, lon = _coords_spark(F.col("c_custkey"), "geo:")
    pts = c.select(
        F.col("c_acctbal").cast("decimal(18,4)").alias("bal"),
        lat.alias("lat3"), lon.alias("lon3"),
    )
    flags = pts.select(
        "bal",
        *[
            (F.expr(_pip_crossings("spark", n, ring)) % 2 == 1).alias(f"in_{i}")
            for i, (n, ring) in enumerate(_POLYGONS)
        ],
    )
    parts = []
    for i, (n, ring) in enumerate(_POLYGONS):
        parts.append(
            flags.agg(
                F.count(F.when(F.col(f"in_{i}"), 1)).cast("bigint").alias("n_inside"),
                F.coalesce(
                    F.sum(F.when(F.col(f"in_{i}"), F.col("bal"))),
                    F.lit(0).cast("decimal(18,4)"),
                ).cast("decimal(38,4)").cast("double").alias("bal_inside"),
            ).select(F.lit(n).alias("polygon"), "n_inside", "bal_inside")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("polygon")
