"""Scalar-function coverage: string / date / math / json / conditional /
array expressions (SURVEY.md §2 Table B row "String/date/math/array/
map/json scalars").

All JVM-side built-ins inside whole-stage codegen — no UDFs. Oracle
notes: functions whose float behavior is not IEEE-determined across
engines (log, exp, round-on-raw-doubles) are deliberately absent from
oracle'd outputs; sums of array elements go through decimal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t

_STRING_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       SUBSTR(p_name, 1, 10) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       REPLACE(p_type, 'ECONOMY', 'ECO') AS type_short,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       TRIM('  ' || p_brand || ' ') AS brand_trimmed,
       REVERSE(p_brand) AS brand_rev,
       STRPOS(p_name, 'a') AS first_a,
       REGEXP_EXTRACT(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
       CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold
FROM part
"""


@register("scalar_string", oracle=_STRING_SQL, tags=("scalar",))
def scalar_string(spark, sf_dir):
    """String scalar battery over part."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trimmed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).alias("has_gold"),
    )


_DATE_SQL = """
SELECT o_orderkey,
       YEAR(o_orderdate) AS yr,
       MONTH(o_orderdate) AS mo,
       DAY(o_orderdate) AS dy,
       QUARTER(o_orderdate) AS qtr,
       DAYOFYEAR(o_orderdate) AS doy,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       STRFTIME(o_orderdate, '%Y-%m') AS ym
FROM orders
"""


@register("scalar_date", oracle=_DATE_SQL, tags=("scalar",))
def scalar_date(spark, sf_dir):
    """Date/time scalar battery over orders (UTC session, midnight
    timestamps → no boundary ambiguity)."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.date_trunc("month", d).alias("month_start"),
        # DATE results are cast to TIMESTAMP: engines disagree on how
        # DATE surfaces through Arrow/pandas (date objects vs datetimes)
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.last_day(d.cast("date")).cast("timestamp").alias("month_end"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


_MATH_SQL = """
SELECT p_partkey,
       ABS(p_size - 25) AS dist_from_25,
       CAST(CEIL(p_retailprice / 100) AS BIGINT) AS price_ceil_100,
       CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_floor_100,
       SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
       CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT) AS size_sq,
       p_size % 7 AS size_mod7,
       CAST(SIGN(p_size - 25) AS BIGINT) AS size_sign,
       GREATEST(p_size, 10) AS size_at_least_10,
       LEAST(p_size, 40) AS size_at_most_40
FROM part
"""


@register("scalar_math", oracle=_MATH_SQL, tags=("scalar",))
def scalar_math(spark, sf_dir):
    """Math scalar battery (sqrt is IEEE-correctly-rounded → safe;
    transcendentals like log/exp are not and stay out of oracles)."""
    p = t(spark, sf_dir, "part")
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        F.abs(s - 25).alias("dist_from_25"),
        F.ceil(F.col("p_retailprice") / 100).cast("bigint").alias("price_ceil_100"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_floor_100"),
        F.sqrt(s.cast("double")).alias("size_sqrt"),
        (s.cast("bigint") * s.cast("bigint")).alias("size_sq"),
        (s % 7).alias("size_mod7"),
        F.signum((s - 25).cast("double")).cast("bigint").alias("size_sign"),
        F.greatest(s, F.lit(10)).alias("size_at_least_10"),
        F.least(s, F.lit(40)).alias("size_at_most_40"),
    )


_JSON_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
"""


@register("scalar_json", oracle=_JSON_SQL, tags=("scalar", "json"))
def scalar_json(spark, sf_dir):
    """JSON extraction from the string props column (driver fixture is
    JSON-ish per FIXTURES.md)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
        F.when(k.cast("bigint") >= 50, "high").otherwise("low").alias("k_band"),
    )


_COND_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS wealth_band,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
       IF(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
FROM customer
"""


@register("scalar_conditional", oracle=_COND_SQL, tags=("scalar",))
def scalar_conditional(spark, sf_dir):
    """CASE / COALESCE / NULLIF / IF battery."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("wealth_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "nation_parity"
        ),
    )


_ARRAY_SQL = """
SELECT e.vec_id,
       len(e.embedding) AS dim,
       CAST(e.embedding[1] AS DOUBLE) AS first_elem,
       list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS elem_sum,
       list_max(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS elem_max
FROM embeddings e
"""


@register("scalar_array", oracle=_ARRAY_SQL, tags=("scalar", "array"))
def scalar_array(spark, sf_dir):
    """Array scalars over the embedding column: size, element access,
    explode → decimal-exact element sum (float → decimal is a single
    correctly-rounded conversion in both engines)."""
    e = t(spark, sf_dir, "embeddings")
    # elem_sum: SEQUENTIAL double fold in array order (F.aggregate ==
    # DuckDB list_sum) — deterministic order makes plain IEEE addition
    # cross-engine exact; a groupBy SUM would be order-dependent, and
    # decimal rescaling hits round-half ties the engines break
    # differently
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x).alias("elem_sum"),
        F.array_max(dbl).alias("elem_max"),
    )


_MAP_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       len(json_keys(props)) AS n_keys,
       array_to_string(json_keys(props), ',') AS key_list
FROM events
"""


@register("scalar_map_json", oracle=_MAP_SQL, tags=("scalar", "json", "map"))
def scalar_map_json(spark, sf_dir):
    """props parsed into a MAP column (from_json), then map scalars:
    element_at, size, sorted key list (map_keys order is unspecified →
    sort before joining for determinism)."""
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("key_list"),
    )


_REGEX_SQL = """
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CASE WHEN regexp_matches(p_name, '^(red|blue|green)') THEN 1 ELSE 0 END AS is_color_first
FROM part
"""


@register("scalar_regexp", oracle=_REGEX_SQL, tags=("scalar", "regexp"))
def scalar_regexp(spark, sf_dir):
    """Regexp family: extract / extract_all / replace / rlike. Patterns
    restricted to the POSIX-compatible core both engines' regex
    dialects agree on (no lookaround, no \\d classes)."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).alias("n_vowels"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_name").rlike("^(red|blue|green)"), 1).otherwise(0).alias("is_color_first"),
    )


_PORTABLE_SQL = """
SELECT n_name, COUNT(*) AS n_suppliers, MIN(s_acctbal) AS min_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 0
GROUP BY n_name
ORDER BY n_name
"""


@register("sql_api_passthrough", oracle=_PORTABLE_SQL, tags=("sql", "sources"))
def sql_api_passthrough(spark, sf_dir):
    """The SQL entry point: the ORACLE STRING ITSELF runs through
    spark.sql over registered views — one portable SQL text, two
    engines, identical results (Catalyst still optimizes it like any
    DataFrame plan)."""
    from etlalchemy_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_SQL)


_TRY_CAST_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_ok,
       TRY_CAST(json_extract_string(props, '$.k') || 'x' AS BIGINT) AS s_fails_to_null,
       TRY_CAST('not a date' AS TIMESTAMP) AS bad_ts
FROM events
"""


@register("scalar_try_cast", oracle=_TRY_CAST_SQL, tags=("scalar",))
def scalar_try_cast(spark, sf_dir):
    """Safe casts under ANSI mode: try_cast yields NULL where a plain
    CAST would raise — the ingestion-cleaning idiom (reference D1 row
    fixes without a Python row loop)."""
    # map-bound per-row cast battery over a single-row-group scan —
    # footer-guarded spread (whole query was ONE task / 1.1 s)
    from etlalchemy_spark.catalog import load_table_spread

    ev = load_table_spread(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_ok"),
        # a genuinely malformed numeric string: proves try_cast returns
        # NULL on parse failure (not just on missing keys)
        F.concat(F.get_json_object("props", "$.k"), F.lit("x"))
        .try_cast("bigint")
        .alias("s_fails_to_null"),
        F.lit("not a date").try_cast("timestamp").alias("bad_ts"),
    )


_NULLSEM_SQL = """
SELECT c_custkey,
       c_acctbal + NULL AS arith_null,
       c_nationkey IS DISTINCT FROM NULL AS distinct_from_null,
       CASE WHEN c_acctbal IS NOT DISTINCT FROM 0.0 THEN 'zero' ELSE 'nonzero' END AS ndist_zero,
       GREATEST(c_acctbal, NULL) AS greatest_w_null,
       c_name || NULL AS concat_null
FROM customer
"""


@register("scalar_null_semantics", oracle=_NULLSEM_SQL, tags=("scalar", "nulls"))
def scalar_null_semantics(spark, sf_dir):
    """NULL-propagation battery: three-valued arithmetic, IS [NOT]
    DISTINCT FROM (Spark eqNullSafe), null-skipping GREATEST, and
    `||` null poisoning (trap pinned here: DuckDB's CONCAT() skips
    NULLs while its `||` and Spark's concat() poison — the oracle uses
    `||` for the shared semantics)."""
    c = t(spark, sf_dir, "customer")
    null_d = F.lit(None).cast("double")
    return c.select(
        "c_custkey",
        (F.col("c_acctbal") + null_d).alias("arith_null"),
        (~F.col("c_nationkey").eqNullSafe(F.lit(None).cast("int"))).alias("distinct_from_null"),
        F.when(F.col("c_acctbal").eqNullSafe(F.lit(0.0)), "zero")
        .otherwise("nonzero")
        .alias("ndist_zero"),
        F.greatest(F.col("c_acctbal"), null_d).alias("greatest_w_null"),
        F.concat(F.col("c_name"), F.lit(None).cast("string")).alias("concat_null"),
    )


_EXPLODE_OUTER_SQL = """
SELECT e.vec_id, CAST(u.x AS DOUBLE) AS x
FROM (
  SELECT vec_id,
         embedding[1 : CASE WHEN vec_id % 10 = 0 THEN 0 ELSE 3 END] AS arr
  FROM embeddings
) e
LEFT JOIN LATERAL UNNEST(e.arr) AS u(x) ON TRUE
"""


@register("scalar_explode_outer", oracle=_EXPLODE_OUTER_SQL, tags=("scalar", "array"))
def scalar_explode_outer(spark, sf_dir):
    """explode_outer: rows with empty arrays survive as NULL
    (plain explode silently DROPS them — the lateral-join trap). Every
    10th vector's array is emptied to prove the preserved row."""
    e = t(spark, sf_dir, "embeddings")
    arr = F.when(
        F.col("vec_id") % 10 == 0, F.slice("embedding", 1, 0)
    ).otherwise(F.slice("embedding", 1, 3))
    return (
        e.select("vec_id", arr.alias("arr"))
        .select("vec_id", F.explode_outer("arr").alias("xf"))
        .select("vec_id", F.col("xf").cast("double").alias("x"))
    )


_BITOPS_SQL = """
SELECT p_partkey,
       p_size & 15 AS low_nibble,
       p_size | 64 AS with_flag,
       xor(p_size, 255) AS xored,
       p_size << 2 AS shifted_l,
       p_size >> 1 AS shifted_r
FROM part
"""


@register("scalar_bitwise", oracle=_BITOPS_SQL, tags=("scalar",))
def scalar_bitwise(spark, sf_dir):
    """Bitwise scalar operators (&, |, xor, shifts) — exact integer
    semantics, identical across engines."""
    p = t(spark, sf_dir, "part")
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        s.bitwiseAND(F.lit(15)).alias("low_nibble"),
        s.bitwiseOR(F.lit(64)).alias("with_flag"),
        s.bitwiseXOR(F.lit(255)).alias("xored"),
        F.shiftleft(s, 2).alias("shifted_l"),
        F.shiftright(s, 1).alias("shifted_r"),
    )


_VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
"""


@register("scalar_variant_extract", oracle=_VARIANT_SQL, tags=("scalar", "json"))
def scalar_variant_extract(spark, sf_dir):
    """Semi-structured VARIANT type (Spark 4 open binary format): the
    props JSON is parsed ONCE into a variant value, then every path is
    a typed O(1) extraction on the binary encoding — unlike
    get_json_object (scalar_json), which re-parses the source string
    per path. At 100 TB with many extracted paths the single-parse
    representation is the difference between one decode and N; the
    same binary format is what Parquet variant shredding stores
    columnarly. try_variant_get returns NULL (not an error) on missing
    paths and failed casts — the ANSI-safe ingestion path."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k_typed"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


_COLLATION_SQL = """
SELECT lower(seg) AS seg, COUNT(*) AS n
FROM (
  SELECT CASE WHEN c_custkey % 2 = 0
              THEN concat(upper(substr(c_mktsegment, 1, 1)),
                          lower(substr(c_mktsegment, 2)))
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
GROUP BY lower(seg)
"""


@register("scalar_collation_group", oracle=_COLLATION_SQL, tags=("scalar", "collation"))
def scalar_collation_group(spark, sf_dir):
    """String collations (Spark 4): rows carry the segment in two
    casings (Initcap for even keys, lower otherwise); grouping on the
    column COLLATED as UTF8_LCASE merges them into one group per
    segment — the engine-level alternative to sprinkling lower() into
    every comparison, and unlike lower() it composes with comparisons,
    joins and sorts at no expression cost. The emitted key is
    normalized with lower() only for display determinism (the collated
    group's representative value is otherwise partition-order
    dependent); the ORACLE does the whole thing with lower() — same
    result, proving the collation semantics."""
    c = t(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.initcap("c_mktsegment"))
        .otherwise(F.lower(F.col("c_mktsegment")))
        .alias("seg")
    )
    return mixed.groupBy(F.collate("seg", "UTF8_LCASE").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lower("k").alias("seg"), "n")


_PARAM_SQL_TEXT = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderdate >= :start_ts
  AND o_totalprice > :min_price
GROUP BY o_orderpriority
"""


@register(
    "sql_parameterized_query",
    oracle=_PARAM_SQL_TEXT.replace(":start_ts", "TIMESTAMP '1995-06-01 00:00:00'").replace(
        ":min_price", "100000"
    ),
    tags=("sql",),
)
def sql_parameterized_query(spark, sf_dir):
    """Parameterized spark.sql (named markers + args dict): the SQL
    TEXT is constant and the values bind as literals server-side — no
    string interpolation, no injection surface, and one parse/plan
    cache entry for every parameter set. The oracle is the same text
    with the literals inlined."""
    from etlalchemy_spark.catalog import register_views

    register_views(spark, sf_dir)
    import datetime

    return spark.sql(
        _PARAM_SQL_TEXT,
        args={
            "start_ts": datetime.datetime(1995, 6, 1),
            "min_price": 100000,
        },
    )


_PIPE_SQL = """
SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS ord_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority, year(o_orderdate)
HAVING COUNT(*) > 5
ORDER BY o_orderpriority, ord_year
"""


@register("sql_pipe_syntax", oracle=_PIPE_SQL, tags=("sql",))
def sql_pipe_syntax(spark, sf_dir):
    """Spark 4 SQL pipe syntax: the same logical plan as classic
    WHERE/GROUP BY/HAVING/ORDER BY expressed as a linear |> pipeline
    (FROM → WHERE → EXTEND → AGGREGATE...GROUP BY → post-aggregation
    WHERE → ORDER BY). Purely front-end sugar — Catalyst receives the
    identical plan, so pushdown/pruning behave exactly as in the
    classic form; the oracle IS the classic form."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_pipe_orders")
    return spark.sql("""
        FROM _pipe_orders
        |> WHERE o_orderstatus = 'F'
        |> EXTEND CAST(year(o_orderdate) AS INT) AS ord_year
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
           GROUP BY o_orderpriority, ord_year
        |> WHERE n_orders > 5
        |> ORDER BY o_orderpriority, ord_year
    """)


_IDENT_SQL = """
SELECT n_name, CAST(n_regionkey AS BIGINT) AS region_key
FROM nation WHERE n_regionkey < 3
"""


@register("sql_identifier_param", oracle=_IDENT_SQL, tags=("sql",))
def sql_identifier_param(spark, sf_dir):
    """Spark 4 IDENTIFIER clause: table and column names bound as SQL
    PARAMETERS (constant text + args), closing the injection surface
    for dynamic identifiers the same way sql_parameterized_query
    closes it for literals — templating a table name with f-strings is
    the SQL-injection shape; IDENTIFIER(:t) parses the argument as ONE
    identifier or fails."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("_id_nation")
    return spark.sql(
        "SELECT n_name, CAST(IDENTIFIER(:keycol) AS BIGINT) AS region_key "
        "FROM IDENTIFIER(:tbl) WHERE IDENTIFIER(:keycol) < 3",
        args={"tbl": "_id_nation", "keycol": "n_regionkey"},
    )


_GBALL_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_GBALL_SQL, tags=("sql",))
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL / ORDER BY ALL (Spark 4 and DuckDB share the
    dialect, so the oracle is the SAME text): the analyzer derives the
    grouping set from the non-aggregate select items and the sort keys
    from the full select list — sugar only, the plan is the explicit
    partial+final hash aggregate + sort. Kills the classic drift bug
    where a new select item is forgotten in the GROUP BY clause."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_gball_li")
    return spark.sql(_GBALL_SQL.replace("FROM lineitem", "FROM _gball_li"))


_TRY_ARITH_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DOUBLE)
         / CAST(NULLIF(CAST(l_quantity AS BIGINT) - 25, 0) AS DOUBLE)
         AS price_per_excess_unit,
       CASE WHEN CAST(l_quantity AS BIGINT) - 25 = 0 THEN NULL
            ELSE CAST(l_partkey AS BIGINT) % (CAST(l_quantity AS BIGINT) - 25)
       END AS mod_or_null
FROM lineitem
WHERE l_orderkey % 31 = 0
"""


@register("scalar_try_arithmetic", oracle=_TRY_ARITH_SQL, tags=("scalar",))
def scalar_try_arithmetic(spark, sf_dir):
    """ANSI-mode-safe arithmetic: Spark 4 runs with
    spark.sql.ansi.enabled=true, where division/modulo by zero is a
    RUNTIME ERROR, not a quiet NULL — the single biggest migration
    trap for pipelines ported from 3.x. try_divide/try_mod are the
    sanctioned escape hatches: NULL on the poison rows, exact
    arithmetic everywhere else (the oracle expresses the same
    semantics with NULLIF/CASE — the pre-ANSI idiom, so this query
    also documents the translation). Narrow filter pushed to the
    scan, pure codegen expressions."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    return li.where(F.col("l_orderkey") % 31 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice").cast("double"), (q - 25).cast("double")
        ).alias("price_per_excess_unit"),
        F.try_mod(F.col("l_partkey").cast("bigint"), q - 25).alias("mod_or_null"),
    )


# --- SQL session variables (r9) -------------------------------------------------

_SESSVAR_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice > 150000.0 AND o_orderkey % 4 = 1
GROUP BY o_orderpriority
"""


@register("sql_session_variables", oracle=_SESSVAR_SQL, tags=("sql",))
def sql_session_variables(spark, sf_dir):
    """Spark 4 SQL session variables (DECLARE VARIABLE / SET VAR /
    read as IDENTIFIER-free scalar refs): thresholds flow into the
    query as TYPED session state instead of f-string splices — the
    procedural-SQL affordance migration scripts lean on (the upstream
    reference templated literals into INSERT text; variables are the
    injection-safe Spark-native form next to sql_parameterized_query
    and sql_identifier_param). The plan under it is the same
    scan+filter+agg, so the oracle just inlines the values."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_sv_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE min_total DOUBLE")
    spark.sql("DECLARE OR REPLACE VARIABLE key_mod INT")
    spark.sql("SET VAR min_total = 150000.0")
    spark.sql("SET VAR key_mod = 4")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM _sv_orders
        WHERE o_totalprice > min_total AND o_orderkey % key_mod = 1
        GROUP BY o_orderpriority
        """
    )


# --- IPv4 render/parse + CIDR containment (r10) -------------------------------------

# (name, network int, prefix length) — a.b.c.d/p as integers so both
# engines share one containment formula: ip >> (32-p) == net >> (32-p)
_CIDR_BLOCKS = [
    ("corp_10_8", 10 << 24, 8),           # 10.0.0.0/8
    ("dmz_172_16_12", (172 << 24) | (16 << 16), 12),  # 172.16.0.0/12
    ("lan_192_168_16", (192 << 24) | (168 << 16), 16),  # 192.168.0.0/16
    ("cdn_203_0_113_24", (203 << 24) | (113 << 8), 24),  # 203.0.113.0/24
    ("upper_half_1", 1 << 31, 1),         # 128.0.0.0/1
]


def _ipv4_sql() -> str:
    from etlalchemy_spark.queries.sampling import _bucket_sql

    rows = ", ".join(f"('{n}', {net}, {p})" for n, net, p in _CIDR_BLOCKS)
    ip = f"((({_bucket_sql('event_id', 'ip4:')}) * 4297) % 4294967296)"
    return f"""
WITH e AS (
  SELECT user_id, {ip} AS ip FROM events
),
s AS (
  SELECT user_id,
         CAST((ip // 16777216) % 256 AS VARCHAR) || '.' ||
         CAST((ip // 65536) % 256 AS VARCHAR) || '.' ||
         CAST((ip // 256) % 256 AS VARCHAR) || '.' ||
         CAST(ip % 256 AS VARCHAR) AS dotted
  FROM e
),
p AS (
  SELECT user_id, dotted,
         CAST(split_part(dotted, '.', 1) AS BIGINT) * 16777216
         + CAST(split_part(dotted, '.', 2) AS BIGINT) * 65536
         + CAST(split_part(dotted, '.', 3) AS BIGINT) * 256
         + CAST(split_part(dotted, '.', 4) AS BIGINT) AS ip
  FROM s
),
blocks(block, net, pfx) AS (VALUES {rows})
SELECT b.block,
       CAST(COUNT(p.ip) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT p.ip) AS BIGINT) AS n_ips,
       CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users
FROM blocks b
LEFT JOIN p ON (p.ip // (CAST(1 AS BIGINT) << (32 - b.pfx)))
             = (b.net // (CAST(1 AS BIGINT) << (32 - b.pfx)))
GROUP BY b.block
"""


@register("scalar_ipv4_cidr", oracle=_ipv4_sql(), tags=("scalar", "events"))
def scalar_ipv4_cidr(spark, sf_dir):
    """IPv4 render -> parse -> CIDR containment (r10) — the
    access-log enrichment every ops pipeline runs: render a 32-bit
    address to dotted-quad, PARSE it back (proving the string path,
    not just int arithmetic — the parse is what real logs need), and
    aggregate per literal CIDR block with the one containment formula
    ip >> (32-p) == net >> (32-p). Addresses are content-addressed
    synthetic (the fixture has no IP column). A repartition on the
    rendered string sits between render and parse: it models the real
    ingestion boundary (dotted quads ARRIVE over the network; the
    parser never sees the generator) and it is what keeps the plan
    sane — without the exchange, Catalyst's CollapseProject inlines
    the md5 render chain into every one of the parser's four
    split_part calls (~30 md5 evaluations per row; 12s at sf0.1 ->
    0.6s). Block dimension broadcast; per-block distinct counts are
    the only wide aggregate; the left join-back keeps empty
    watchlist blocks visible."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    ev = t(spark, sf_dir, "events")
    ip = ((hash_bucket(F.col("event_id"), "ip4:") * 4297) % 4294967296).cast("bigint")
    s = ev.select(
        "user_id",
        F.concat_ws(
            ".",
            ((ip / 16777216).cast("bigint") % 256).cast("string"),
            ((ip / 65536).cast("bigint") % 256).cast("string"),
            ((ip / 256).cast("bigint") % 256).cast("string"),
            (ip % 256).cast("string"),
        ).alias("dotted"),
    ).repartition(32, "dotted")
    p = s.select(
        "user_id",
        (
            F.expr("CAST(split_part(dotted, '.', 1) AS BIGINT)") * 16777216
            + F.expr("CAST(split_part(dotted, '.', 2) AS BIGINT)") * 65536
            + F.expr("CAST(split_part(dotted, '.', 3) AS BIGINT)") * 256
            + F.expr("CAST(split_part(dotted, '.', 4) AS BIGINT)")
        ).alias("ip"),
    )
    # containment as a LITERAL case array + explode, not a join: the
    # blocks are compile-time constants, so each membership test is
    # ip div 2^k == const inside whole-stage codegen — a
    # BroadcastNestedLoopJoin with the same predicate ran its
    # interpreted condition per (row, block) pair and cost 6s at
    # sf0.1; this single-pass shape is 0.6s
    tags = F.array(
        *[
            F.when(
                (F.col("ip") / F.lit(1 << (32 - pfx))).cast("bigint")
                == F.lit(net >> (32 - pfx)),
                F.lit(name),
            )
            for name, net, pfx in _CIDR_BLOCKS
        ]
    )
    matched = (
        p.select("user_id", "ip", F.explode(tags).alias("block"))
        .where(F.col("block").isNotNull())
    )
    agg = matched.groupBy("block").agg(
        F.count("ip").cast("bigint").alias("n_events"),
        F.countDistinct("ip").cast("bigint").alias("n_ips"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    blocks = spark.createDataFrame(
        [(n,) for n, _, _ in _CIDR_BLOCKS], "block string"
    )
    return blocks.join(agg, "block", "left").select(
        "block",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("n_ips"), F.lit(0)).cast("bigint").alias("n_ips"),
        F.coalesce(F.col("n_users"), F.lit(0)).cast("bigint").alias("n_users"),
    )


# --- RFC 4122 v3 (md5, name-based) UUID surrogate keys (r10) --------------------------

# Shared SQL fragment, valid verbatim in BOTH engines: md5 hex of the
# namespaced name, re-laid-out 8-4-4-4-12 with the version nibble
# forced to '3' and the variant nibble folded into 8/9/a/b.
_UUID3_VARIANT = (
    "CASE WHEN substring(h, 17, 1) IN ('0', '4', '8', 'c') THEN '8' "
    "WHEN substring(h, 17, 1) IN ('1', '5', '9', 'd') THEN '9' "
    "WHEN substring(h, 17, 1) IN ('2', '6', 'a', 'e') THEN 'a' "
    "ELSE 'b' END"
)
_UUID3_EXPR = (
    "substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-3' || substring(h, 14, 3)"
    f" || '-' || {_UUID3_VARIANT} || substring(h, 18, 3) || '-' || substring(h, 21, 12)"
)

_UUID3_SQL = f"""
WITH src AS (
  SELECT md5('etlalchemy:customer:' || CAST(c_custkey AS STRING)) AS h
  FROM customer
),
u AS (SELECT {_UUID3_EXPR} AS uuid FROM src)
SELECT substring(uuid, 15, 1) AS version_nibble,
       substring(uuid, 20, 1) AS variant_nibble,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT uuid) AS BIGINT) AS n_distinct
FROM u
GROUP BY 1, 2
"""


@register("scalar_uuid3_surrogate", oracle=_UUID3_SQL, tags=("scalar", "etl"))
def scalar_uuid3_surrogate(spark, sf_dir):
    """RFC 4122 version-3 (name-based, md5) UUIDs as surrogate keys
    (r10) — the cross-system-stable identifier a migration mints when
    the target wants UUID PKs but re-running the pipeline must mint
    the SAME ids (uuid() is an RNG; v3 is a pure function of
    namespace+name, so retries, engines, and both halves of a
    dual-write agree — the `etl_surrogate_keys` discipline in
    standard-UUID clothing). The layout fragment — version nibble
    forced to '3', variant nibble folded into 8/9/a/b — is ONE SQL
    string evaluated verbatim by both engines. Aggregated readout
    pins the version/variant distribution and that distinct names
    yield distinct UUIDs (md5 collision-free at fixture scale).
    Narrow map in the scan stage; shuffles only the 4-row
    aggregate."""
    c = t(spark, sf_dir, "customer")
    src = c.select(
        F.md5(
            F.concat(F.lit("etlalchemy:customer:"), F.col("c_custkey").cast("string"))
        ).alias("h")
    )
    u = src.select(F.expr(_UUID3_EXPR).alias("uuid"))
    return u.groupBy(
        F.expr("substring(uuid, 15, 1)").alias("version_nibble"),
        F.expr("substring(uuid, 20, 1)").alias("variant_nibble"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("uuid").cast("bigint").alias("n_distinct"),
    )


# --- Luhn checksum validation (r11) ----------------------------------------------------------


def _luhn_exprs(dialect: str):
    """Shared Luhn machinery over a 16-digit BIGINT column `pan`:
    digit i (from the right) doubles on odd positions, 2d > 9 folds to
    2d - 9, valid iff the total is 0 mod 10. Pure integer div/mod —
    only the div operator spelling differs per dialect."""
    idiv = (lambda a, b: f"(({a}) div {b})") if dialect == "spark" else (
        lambda a, b: f"(({a}) // {b})"
    )
    terms = []
    for i in range(16):
        d = f"({idiv('pan', 10 ** i)} % 10)"
        if i % 2 == 1:
            terms.append(f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)")
        else:
            terms.append(d)
    return f"(({' + '.join(terms)}) % 10 = 0)"


def _luhn_check_digit(dialect: str, base: str) -> str:
    """Check digit for a 15-digit base (digit positions shift by one
    once the check digit is appended: base digit i sits at position
    i+1 of the final PAN, so EVEN base positions double)."""
    idiv = (lambda a, b: f"(({a}) div {b})") if dialect == "spark" else (
        lambda a, b: f"(({a}) // {b})"
    )
    terms = []
    for i in range(15):
        d = f"({idiv(base, 10 ** i)} % 10)"
        if i % 2 == 0:
            terms.append(f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)")
        else:
            terms.append(d)
    return f"((10 - (({' + '.join(terms)}) % 10)) % 10)"


def _luhn_sql() -> str:
    base = "(400000000000000 + o_orderkey % 100000000000000)"
    chk = _luhn_check_digit("duckdb", base)
    return f"""
WITH pans AS (
  SELECT CAST({base} * 10 + {chk} AS BIGINT) AS pan FROM orders
),
legs AS (
  SELECT pan,
         (pan // 10) * 10 + (pan % 10 + 1) % 10 AS corrupt,
         (pan // 100000) * 100000
           + (pan // 1000 % 10) * 10000
           + (pan // 10000 % 10) * 1000
           + pan % 1000 AS swapped
  FROM pans
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(*) FILTER (WHERE {_luhn_exprs('duckdb')}) AS BIGINT) AS n_valid,
       CAST(COUNT(*) FILTER (WHERE NOT {_luhn_exprs('duckdb').replace('pan', 'corrupt')})
            AS BIGINT) AS n_corrupt_caught,
       CAST(COUNT(*) FILTER (WHERE NOT {_luhn_exprs('duckdb').replace('pan', 'swapped')})
            AS BIGINT) AS n_swap_caught
FROM legs
"""


@register("scalar_luhn_checksum", oracle=_luhn_sql(), tags=("scalar", "bench"))
def scalar_luhn_checksum(spark, sf_dir):
    """Luhn (mod-10) checksum generation AND validation over synthetic
    16-digit account numbers — the standard structural-validity gate
    for card/IMEI-shaped columns in an ETL quarantine step, and a
    checksum whose ERROR-DETECTION limits this query measures rather
    than asserts: every +1 single-digit corruption is caught
    (n_corrupt_caught = n_total), while adjacent-transposition catches
    exclude the classic 09<->90 blind spot (n_swap_caught <= n_total,
    the gap visible in the output). Everything is unrolled integer
    div/mod arithmetic in the scan stage — no UDF, no strings; one
    map-side-combined aggregate leaves the executors."""
    base = "(400000000000000 + o_orderkey % 100000000000000)"
    chk = _luhn_check_digit("spark", base)
    o = t(spark, sf_dir, "orders")
    pans = o.select(
        F.expr(f"CAST({base} * 10 + {chk} AS BIGINT)").alias("pan")
    )
    legs = pans.selectExpr(
        "pan",
        "(pan div 10) * 10 + (pan % 10 + 1) % 10 AS corrupt",
        "(pan div 100000) * 100000 + (pan div 1000 % 10) * 10000"
        " + (pan div 10000 % 10) * 1000 + pan % 1000 AS swapped",
    )
    valid = _luhn_exprs("spark")
    return legs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.count(F.when(F.expr(valid), 1)).cast("bigint").alias("n_valid"),
        F.count(F.when(~F.expr(valid.replace("pan", "corrupt")), 1))
        .cast("bigint").alias("n_corrupt_caught"),
        F.count(F.when(~F.expr(valid.replace("pan", "swapped")), 1))
        .cast("bigint").alias("n_swap_caught"),
    )
