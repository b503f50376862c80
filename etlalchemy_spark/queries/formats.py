"""File-format roundtrip queries: the engine's CSV/JSON source+sink
surface (W1/S2) exercised end-to-end — write with dialect conventions,
read back with explicit schema, prove value fidelity against the oracle
reading the ORIGINAL parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.sources.files import read_file, write_csv_for_bulk_load, write_file
from etlalchemy_spark.queries._util import scratch_dir, t

_NATION_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@register("fmt_csv_roundtrip", oracle=_NATION_SQL, tags=("sources",))
def fmt_csv_roundtrip(spark, sf_dir):
    """parquet → dialect CSV (postgres conventions: \\N nulls) → read
    back with explicit schema → identical values. Proves the W1 dump
    path round-trips types, not just that files appear."""
    nation = t(spark, sf_dir, "nation")
    tmp = scratch_dir("csv", sf_dir)
    path = os.path.join(tmp, "nation_csv")
    write_csv_for_bulk_load(nation, path, dialect="postgresql", header=True)
    return read_file(
        spark,
        path,
        fmt="csv",
        schema="n_nationkey int, n_name string, n_regionkey int",
        header=True,
        nullValue=r"\N",
    )


@register("fmt_json_roundtrip", oracle=_NATION_SQL, tags=("sources",))
def fmt_json_roundtrip(spark, sf_dir):
    """parquet → JSON lines → schema-first read back (no inference —
    an extra full pass at scale)."""
    nation = t(spark, sf_dir, "nation")
    tmp = scratch_dir("json", sf_dir)
    path = os.path.join(tmp, "nation_json")
    write_file(nation, path, fmt="json")
    return read_file(
        spark, path, fmt="json", schema="n_nationkey int, n_name string, n_regionkey int"
    )


_ORC_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


@register("fmt_orc_roundtrip", oracle=_ORC_SQL, tags=("sources",))
def fmt_orc_roundtrip(spark, sf_dir):
    """parquet → ORC → read back (the other columnar format; pushdown
    and pruning apply the same way)."""
    sup = t(spark, sf_dir, "supplier")
    tmp = scratch_dir("orc", sf_dir)
    path = os.path.join(tmp, "supplier_orc")
    write_file(sup, path, fmt="orc")
    return read_file(spark, path, fmt="orc")


_PARTITIONED_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


@register("fmt_partitioned_write", oracle=_PARTITIONED_SQL, tags=("sources",))
def fmt_partitioned_write(spark, sf_dir):
    """Hive-style partitioned write (partitionBy priority) then a
    partition-pruned read-back count per partition — the lake layout
    that stands in for the reference's index epilogue (M1)."""
    orders = t(spark, sf_dir, "orders")
    tmp = scratch_dir("part", sf_dir)
    path = os.path.join(tmp, "orders_part")
    write_file(orders, path, fmt="parquet", partition_by=["o_orderpriority"])
    back = read_file(spark, path, fmt="parquet")
    return back.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


_BUCKETED_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("fmt_bucketed_join", oracle=_BUCKETED_SQL, tags=("sources", "join"))
def fmt_bucketed_join(spark, sf_dir):
    """Shuffle-free fact-fact join via bucketing: both tables written
    bucketBy(8, orderkey) + sortBy, so the join consumes bucket layout
    directly — zero Exchange on either side (asserted in
    tests/test_plans.py). At 100 TB this is THE repeated-join
    optimization: pay the layout shuffle once at write, never again."""
    import shutil
    from urllib.parse import urlparse

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_li, t_or = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in (t_li, t_or):
        # a previous session may have left the managed location behind
        # without the catalog entry — clear both
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(t_li)
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(t_or)
    )
    bli = spark.table(t_li)
    bor = spark.table(t_or)
    return (
        bli.join(bor, bli.l_orderkey == bor.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


_ZORDER_TERMS = " + ".join(
    f"(((o_custkey >> {i}) & 1) << {2 * i}) + (((o_orderkey >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
)

_ZORDER_SQL = f"""
SELECT o_orderkey, o_custkey,
       CAST({_ZORDER_TERMS} AS BIGINT) AS zvalue
FROM orders
"""


@register("scalar_zorder_interleave", oracle=_ZORDER_SQL, tags=("scalar", "layout"))
def scalar_zorder_interleave(spark, sf_dir):
    """Morton z-value of (o_custkey, o_orderkey) — the bit-interleave
    expression behind z-order clustering, unrolled literal shifts in
    codegen (oracle recomputes the identical arithmetic)."""
    from etlalchemy_spark.operators.layout import zorder_value

    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        zorder_value(F.col("o_custkey"), F.col("o_orderkey")).alias("zvalue"),
    )


_ZWRITE_SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"


@register("fmt_zorder_clustered_write", oracle=_ZWRITE_SQL, tags=("sources", "layout"))
def fmt_zorder_clustered_write(spark, sf_dir):
    """Z-order clustered write (range-partition + sort on the Morton
    value of (custkey, orderkey)) then read-back — the lake-layout
    stand-in for the reference's secondary-index epilogue (M1): footer
    min/max on BOTH keys become selective, so scans filtered on either
    column prune most files. Value fidelity proven against the
    original table; clustering quality asserted in tests/test_layout.py."""
    from etlalchemy_spark.operators.layout import zorder_write

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    tmp = os.path.join(scratch_dir("zorder", sf_dir), "orders_z")
    zorder_write(o, tmp, "o_custkey", "o_orderkey", n_files=8)
    return spark.read.parquet(tmp)


_TEXT_SQL = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '[\n\r]', ' ', 'g'), '\t', ' ', 'g') AS text_line
FROM documents
"""


@register("fmt_text_roundtrip", oracle=_TEXT_SQL, tags=("sources",))
def fmt_text_roundtrip(spark, sf_dir):
    """documents → line-delimited text files (id TAB text, control
    chars stripped — the reference's D1 delimiter cleaning) → read
    back with spark.read.text and re-split. Text is the lowest common
    denominator for corpus interchange; the explicit-schema re-split
    keeps the read one narrow projection."""
    d = t(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), "[\\n\\r]", " "), "\\t", " "
    )
    line = F.concat(F.col("doc_id").cast("string"), F.lit("\t"), clean)
    tmp = scratch_dir("textfmt", sf_dir)
    path = os.path.join(tmp, "documents_text")
    d.select(line.alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 2)
    return back.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.element_at(parts, 2).alias("text_line"),
    )


_EVOLVE_SQL = """
SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
FROM orders WHERE o_orderkey < 2000
UNION ALL
SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderstatus
FROM orders WHERE o_orderkey < 2000
"""


@register("fmt_schema_evolution", oracle=_EVOLVE_SQL, tags=("sources",))
def fmt_schema_evolution(spark, sf_dir):
    """Schema evolution on the lake: two parquet batches written at
    different times with different column sets (a column added, one
    dropped) read back as ONE table via mergeSchema — missing columns
    null-fill per file. This is the footer-union read that replaces a
    blocking ALTER TABLE migration at 100 TB; the merge cost is
    per-file footer metadata only, not data. (Production default keeps
    mergeSchema off and pins the schema in the catalog; this query is
    the evolution path itself.)"""
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    orders = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    tmp = scratch_dir("evolve", sf_dir)
    base = os.path.join(tmp, "orders_evolving")
    orders.select("o_orderkey", "o_totalprice").write.mode("overwrite").parquet(
        os.path.join(base, "v1")
    )
    orders.select("o_orderkey", "o_orderstatus").write.mode("overwrite").parquet(
        os.path.join(base, "v2")
    )
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(base, "v1"), os.path.join(base, "v2"))
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


_PERMISSIVE_SQL = """
SELECT o_orderkey, o_orderstatus,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 7 = 0
            THEN CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ',not-a-number'
            ELSE NULL END AS corrupt_rec
FROM orders WHERE o_orderkey < 2000
"""


@register("fmt_csv_permissive_corrupt", oracle=_PERMISSIVE_SQL, tags=("sources",))
def fmt_csv_permissive_corrupt(spark, sf_dir):
    """Malformed-row tolerance on ingest: a CSV feed where some rows
    carry an unparseable value (every 7th here, injected
    deterministically) read in PERMISSIVE mode — the bad column nulls
    out, the raw line is captured in the corrupt-record column, and
    the load NEVER fails. This is the reference's bulk-load error
    tolerance re-expressed as a first-class read mode: quarantine =
    `WHERE corrupt_rec IS NOT NULL`, clean load = the rest, one pass,
    no driver involvement."""
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    orders = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    price = F.when(
        F.col("o_orderkey") % 7 == 0, F.lit("not-a-number")
    ).otherwise(F.col("o_totalprice").cast("string"))
    lines = orders.select(
        F.concat_ws(
            ",", F.col("o_orderkey").cast("string"), F.col("o_orderstatus"), price
        ).alias("value")
    )
    path = os.path.join(scratch_dir("permissive", sf_dir), "orders_feed")
    lines.write.mode("overwrite").text(path)
    return (
        spark.read.schema(
            "o_orderkey bigint, o_orderstatus string, o_totalprice double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("_corrupt_record").alias("corrupt_rec"),
        )
    )


_SUPPLIER_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


@register("fmt_csv_mysql_dialect", oracle=_SUPPLIER_SQL, tags=("sources",))
def fmt_csv_mysql_dialect(spark, sf_dir):
    """W1 with MySQL LOAD DATA conventions (backslash escapes, \\N
    nulls) — the second dialect of the bulk-load CSV matrix, proving
    the conventions table round-trips values, not just postgres's."""
    sup = t(spark, sf_dir, "supplier")
    tmp = scratch_dir("csv_mysql", sf_dir)
    path = os.path.join(tmp, "supplier_csv")
    write_csv_for_bulk_load(sup, path, dialect="mysql", header=True)
    return read_file(
        spark,
        path,
        fmt="csv",
        schema="s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double",
        header=True,
        nullValue=r"\N",
        escape="\\",
    )


_PYDS_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_price
FROM orders
WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


@register("fmt_python_datasource_pushdown", oracle=_PYDS_SQL, tags=("sources", "pyds"))
def fmt_python_datasource_pushdown(spark, sf_dir):
    """Spark 4 Python Data Source API: the W1 duckdb-dialect dump read
    back through the custom ``dialect_csv`` source
    (sources/pydatasource.py) — one InputPartition per part file, Arrow
    RecordBatch reads, and SOURCE-SIDE filter pushdown: the price/status
    predicates are applied to Arrow columns inside the Python worker,
    so rejected rows never cross the Arrow→JVM boundary (the pushed
    scan is pinned equal to Spark's generic CSV reader on the same
    dialect options in tests/test_pydatasource.py)."""
    from etlalchemy_spark.sources.files import write_csv_for_bulk_load
    from etlalchemy_spark.sources.pydatasource import register_dialect_csv

    register_dialect_csv(spark)
    orders = t(spark, sf_dir, "orders")
    path = os.path.join(scratch_dir("pyds", sf_dir), "orders_dialect_csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_csv_for_bulk_load(orders, path, dialect="duckdb")
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    back = spark.read.format("dialect_csv").schema(schema).load(path)
    return (
        back.where((F.col("o_totalprice") > 150000) & (F.col("o_orderstatus") == "O"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("sum_price"),
        )
    )


_FOOTER_SQL = """
SELECT CAST(o_orderkey % 4 AS INT) AS bkt,
       COUNT(*) AS n_rows,
       CAST(0 AS BIGINT) AS null_count,
       MIN(o_orderkey) AS min_orderkey,
       MAX(o_orderkey) AS max_orderkey
FROM orders
GROUP BY 1
"""


@register("fmt_parquet_footer_audit", oracle=_FOOTER_SQL, tags=("sources", "layout"))
def fmt_parquet_footer_audit(spark, sf_dir):
    """Lake-layout observability: DISTRIBUTED parquet footer reads.
    Orders are written partitioned by a bucket column, then the audit
    reads ONLY footers (pyarrow metadata — no data pages) across
    executors via mapInPandas over the file list, aggregating per-
    partition row counts, null counts, and o_orderkey min/max from the
    row-group statistics. The oracle recomputes the same numbers from
    the DATA — footer stats must agree exactly, which is precisely the
    invariant min/max pruning (and the Z-order write path,
    operators/layout.py) depends on. 100 TB shape: the driver handles
    only file PATHS (at scale, from the table manifest); footer I/O is
    partition-parallel and touches a few KB per file regardless of
    file size."""
    from etlalchemy_spark.queries._util import scratch_dir

    base = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", (F.col("o_orderkey") % 4).cast("int").alias("bkt")
    )
    tmp = os.path.join(scratch_dir("footer", sf_dir), "orders_bkt")
    base.repartition(4, "bkt").write.mode("overwrite").partitionBy("bkt").parquet(tmp)
    files = sorted(
        os.path.join(dp, n)
        for dp, _dirs, names in os.walk(tmp)
        for n in names
        if n.endswith(".parquet")
    )
    fdf = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        min(8, len(files))
    )

    def read_footers(batches):
        import re

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                bkt = int(re.search(r"bkt=(\d+)", p).group(1))
                mins, maxs, nulls = [], [], 0
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    col = next(
                        rg.column(j)
                        for j in range(rg.num_columns)
                        if rg.column(j).path_in_schema == "o_orderkey"
                    )
                    st = col.statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                    nulls += st.null_count
                rows.append((bkt, md.num_rows, nulls, min(mins), max(maxs)))
            yield pd.DataFrame(
                rows,
                columns=["bkt", "n_rows", "null_count", "min_orderkey", "max_orderkey"],
            )

    footers = fdf.mapInPandas(
        read_footers,
        "bkt int, n_rows bigint, null_count bigint, "
        "min_orderkey bigint, max_orderkey bigint",
    )
    # layout-robust: a partition written as several files folds here
    return footers.groupBy("bkt").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("null_count").alias("null_count"),
        F.min("min_orderkey").alias("min_orderkey"),
        F.max("max_orderkey").alias("max_orderkey"),
    )


_COMPACT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
"""


@register("fmt_compact_small_files", oracle=_COMPACT_SQL, tags=("sources", "layout"))
def fmt_compact_small_files(spark, sf_dir):
    """Small-file compaction (operators/layout.py compact_small_files):
    a deliberately fragmented copy of orders (32 tiny files — the
    typical residue of a micro-batching sink) is compacted into
    size-targeted, range-clustered files; the measured result is the
    compacted table's content, which must be IDENTICAL to the source
    (compaction moves bytes, never changes them — the oracle is the
    source itself). tests/test_layout.py pins the file-count reduction
    and the post-compaction clustering (disjoint o_orderkey ranges)."""
    from etlalchemy_spark.operators.layout import compact_small_files
    from etlalchemy_spark.queries._util import scratch_dir

    base = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    root = scratch_dir("compact", sf_dir)
    frag = os.path.join(root, "fragmented")
    compacted = os.path.join(root, "compacted")
    base.repartition(32).write.mode("overwrite").parquet(frag)
    compact_small_files(
        spark, frag, compacted, target_bytes=4 * 1024 * 1024, order_col="o_orderkey"
    )
    return spark.read.parquet(compacted)


_LINEAGE_SQL = """
SELECT o_orderkey,
       'bucket=' || CAST(o_orderkey % 4 AS VARCHAR) AS part_dir,
       ROW_NUMBER() OVER (PARTITION BY o_orderkey % 4 ORDER BY o_orderkey) - 1
         AS row_idx
FROM orders
"""


@register("fmt_row_lineage", oracle=_LINEAGE_SQL, tags=("sources",))
def fmt_row_lineage(spark, sf_dir):
    """Row-level provenance via the parquet ``_metadata`` hidden
    columns (file_path + row_index) — the thing a 100 TB corpus needs
    to answer "which shard and offset did this training example come
    from" without writing an id column into the data. The fixture is
    written deterministically (hash-partitioned into 4 bucket dirs,
    sorted within each file), so file identity and in-file position
    are pure functions of the data and the oracle can recompute both:
    row_index must equal the rank within the bucket. ``_metadata`` is
    scan-time metadata, not stored bytes — zero storage cost, exact
    lineage."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey")
    tmp = scratch_dir("lineage", sf_dir)
    path = os.path.join(tmp, "orders_lineage")
    bucketed = orders.withColumn("bucket", F.col("o_orderkey") % 4)
    # sort by (bucket, o_orderkey): this satisfies the partitionBy
    # write's required ordering directly, so the planner inserts no
    # second Sort above it — sorting by o_orderkey alone relied on the
    # inserted Sort(bucket) preserving tie order, which is stable for
    # in-memory sorts but NOT a contract across spill-merge runs
    # (r7 review finding)
    (
        bucketed.repartition(4, "bucket")
        .sortWithinPartitions("bucket", "o_orderkey")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.select(
        "o_orderkey",
        F.regexp_extract(F.col("_metadata.file_path"), r"(bucket=\d+)", 1).alias(
            "part_dir"
        ),
        F.col("_metadata.row_index").alias("row_idx"),
    )


_BLOOM_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderkey IN (42, 4242, 424242)
"""


@register("fmt_parquet_bloom", oracle=_BLOOM_SQL, tags=("sources",))
def fmt_parquet_bloom(spark, sf_dir):
    """Parquet bloom filters on a high-cardinality key
    (``parquet.bloom.filter.enabled#col``): min/max row-group stats
    prune RANGES, but a point lookup on a key that's uniformly spread
    (like o_orderkey across unsorted shards) matches every row group's
    [min,max] — the bloom filter is what lets the reader skip row
    groups that cannot contain the probed keys, turning a 100 TB
    needle-in-haystack lookup from a full scan into a handful of row
    groups. The write-side option cost is a few KB per row group
    (size delta pinned in tests/test_formats_bloom.py); results are
    byte-identical to scanning the source."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tmp = scratch_dir("bloom", sf_dir)
    path = os.path.join(tmp, "orders_bloom")
    (
        orders.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "100000")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.where(F.col("o_orderkey").isin(42, 4242, 424242))


def _shard_sql() -> str:
    from etlalchemy_spark.queries.sampling import _bucket_sql

    return f"""
WITH assigned AS (
  SELECT doc_id, {_bucket_sql("doc_id", "shard:")} % 8 AS shard,
         n_chars
  FROM documents
)
SELECT CAST(shard AS INT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS n_chars_total
FROM assigned GROUP BY shard
"""


@register("fmt_balanced_shards", oracle=_shard_sql(), tags=("sources", "sampling"))
def fmt_balanced_shards(spark, sf_dir):
    """Hash-balanced shard layout for training exports: shard =
    content-hash of the doc id (deterministic across engines, retries,
    and re-runs — a trainer can reproduce the exact shard membership
    from the id alone), so shard sizes concentrate tightly around
    corpus/n with zero coordination and no sort. The query returns the
    per-shard audit (doc and char totals — what a dataloader needs to
    plan epochs); the actual 8-file write and its balance bound are
    pinned in tests/test_formats_bloom.py. At 100 TB this is the
    no-shuffle alternative to repartition(n): the assignment column
    prunes straight into partitioned writes."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    d = t(spark, sf_dir, "documents")
    assigned = d.select(
        "doc_id",
        "n_chars",
        (hash_bucket(F.col("doc_id"), "shard:") % 8).cast("int").alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("bigint").alias("n_chars_total"),
    )


_MINMAX_PRUNE_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("fmt_sorted_minmax_pruning", oracle=_MINMAX_PRUNE_SQL, tags=("sources",))
def fmt_sorted_minmax_pruning(spark, sf_dir):
    """Time-range layout + footer min/max pruning: lineitem is
    range-partitioned AND sorted on l_shipdate into 8 files (each file
    owns a disjoint date span, so its parquet footer min/max is
    maximally selective), then a quarter-long range scan reads it
    back. This is the single-dimension sibling of
    fmt_zorder_clustered_write (z-order trades per-column selectivity
    across TWO keys; a pure sort gives one key everything) and the
    layout a time-series lake should default to: at 100 TB a
    quarter-scan touches ~1/24 of the files, and WITHIN each touched
    file row-group stats skip further. Value fidelity is the oracle
    (same range predicate on the original table); the disjoint-span +
    PushedFilters claims are pinned in tests/test_layout.py."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    tmp = os.path.join(scratch_dir("minmax", sf_dir), "lineitem_by_shipdate")
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    back = spark.read.parquet(tmp)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    return back.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))


_CSV_GZIP_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS o_totalprice
FROM orders
"""


@register("fmt_csv_gzip_roundtrip", oracle=_CSV_GZIP_SQL, tags=("sources",))
def fmt_csv_gzip_roundtrip(spark, sf_dir):
    """orders → gzip-compressed CSV → read back with an explicit
    schema. Compressed text interchange is how most external vendors
    actually ship data; the catch this query pins is that gzip is an
    UNSPLITTABLE codec — each .csv.gz file is one task on read, so
    the WRITE side must control file count (8 here) or a 100 TB feed
    collapses to single-digit read parallelism. (Columnar or
    zstd/bzip2 feeds don't have this failure mode — documented here
    rather than hidden.) Money survives the text round trip as an
    explicit DECIMAL(15,2) schema, never a double re-parse."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )
    tmp = os.path.join(scratch_dir("csvgz", sf_dir), "orders_gz")
    o.repartition(8).write.mode("overwrite").option("compression", "gzip").option(
        "header", True
    ).csv(tmp)
    back = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice decimal(15,2)"
    ).option("header", True).csv(tmp)
    # decimal(15,2) -> double only for the cross-engine compare; the
    # typed decimal is what the schema carries through the round trip
    return back.withColumn("o_totalprice", F.col("o_totalprice").cast("double"))


_XML_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


@register("fmt_xml_roundtrip", oracle=_XML_SQL, tags=("sources",))
def fmt_xml_roundtrip(spark, sf_dir):
    """parquet → XML (Spark 4's NATIVE xml source — rowTag elements,
    no external package) → schema-first read back → identical values.
    XML is the interchange format the enterprise systems upstream
    etlalchemy migrates from still emit; schema-first read avoids the
    full inference pass, and the writer/reader pair proves typed
    round-tripping (longs, decimals, strings with markup-escapable
    characters), not just that files appear."""
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    tmp = scratch_dir("xml", sf_dir)
    path = os.path.join(tmp, "supplier_xml")
    (
        sup.write.mode("overwrite")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .format("xml")
        .save(path)
    )
    schema_src = t(spark, sf_dir, "supplier").schema
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in schema_src.fields
        if f.name in {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"}
    )
    return spark.read.option("rowTag", "supplier").schema(schema).format("xml").load(path)


# --- Bucketed tables: co-located shuffle-free join (r9) -----------------------

_BUCKETED_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@register(
    "fmt_bucketed_join_no_shuffle",
    oracle=_BUCKETED_SQL,
    tags=("sources", "layout", "join", "scale"),
)
def fmt_bucketed_join_no_shuffle(spark, sf_dir):
    """Hive-style BUCKETED tables (`bucketBy(8, key).sortBy(key)`) —
    the storage-level answer to the big-join shuffle: both fact tables
    are written pre-hashed into the same bucket layout, so the
    SortMergeJoin reads bucket i against bucket i with NO Exchange on
    either side (pinned in tests/test_layout.py: zero shuffles between
    the scans and the join). At 100 TB this converts every recurring
    join on the bucket key from a full network shuffle into a local
    merge — THE reason warehouses bucket fact tables; pairs with
    `fmt_zorder_clustered_write` (pruning) and `join_bloom_prefilter`
    (runtime row filtering). The aggregate result is oracle-checked;
    bucketing must not change a single row."""
    import hashlib as _hashlib

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    t_orders, t_lines = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    # a FRESH session's in-memory catalog doesn't know tables a prior
    # session left in the warehouse dir, and managed-table creation
    # refuses to reuse the orphaned location — drop both table and
    # leftover directory (Hadoop FS: works on any filesystem)
    jvm = spark._jvm
    fs_conf = spark._jsc.hadoopConfiguration()
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    for name in (t_orders, t_lines):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        p = jvm.org.apache.hadoop.fs.Path(warehouse, name)
        p.getFileSystem(fs_conf).delete(p, True)
    (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .saveAsTable(t_orders)
    )
    (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .saveAsTable(t_lines)
    )
    o = spark.table(t_orders)
    li = spark.table(t_lines)
    j = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("revenue"),
    )


# --- Fixed-width interchange (r9) ------------------------------------------------

_FW_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders WHERE o_orderkey % 5 = 0
"""


@register("fmt_fixed_width_roundtrip", oracle=_FW_SQL, tags=("sources", "etl"))
def fmt_fixed_width_roundtrip(spark, sf_dir):
    """Fixed-width (COBOL/mainframe copybook) interchange — the one
    legacy-migration format the reference's world runs on that has no
    Spark reader: rows render as fixed-offset text (zero-padded
    numerics, right-padded strings — lpad/rpad expressions), write
    through the text sink, read back with spark.read.text, and parse
    by SUBSTRING offsets with typed casts. Roundtrip identity is the
    oracle. Both directions are pure codegen string expressions — a
    copybook layout is just (offset, width, type) triples, so the
    parser generalizes to any spec; at 100 TB the parse is a narrow
    map over the text scan, splittable per line, no shuffle."""
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )
    # layout: orderkey 12 (zero-pad), custkey 12 (zero-pad),
    # status 1, priority 15 (right-pad)
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("o_custkey").cast("string"), 12, "0"),
        F.col("o_orderstatus"),
        F.rpad(F.col("o_orderpriority"), 15, " "),
    ).alias("value")
    out = os.path.join(scratch_dir("fw", sf_dir), "orders_fw")
    o.select(line).write.mode("overwrite").text(out)
    raw = spark.read.text(out)
    return raw.select(
        F.substring("value", 1, 12).cast("bigint").alias("o_orderkey"),
        F.substring("value", 13, 12).cast("bigint").alias("o_custkey"),
        F.substring("value", 25, 1).alias("o_orderstatus"),
        F.rtrim(F.substring("value", 26, 15)).alias("o_orderpriority"),
    )


# --- Arrow IPC interchange (r10) ---------------------------------------------------

_ARROW_IPC_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


@register("fmt_arrow_ipc_roundtrip", oracle=_ARROW_IPC_SQL, tags=("sources",))
def fmt_arrow_ipc_roundtrip(spark, sf_dir):
    """parquet → Arrow IPC (Feather V2) files → read back → identical
    values. Arrow IPC is the zero-copy interchange lingua franca
    between Spark, pandas, DuckDB, Polars and every ML dataloader —
    the format you hand a training job that refuses parquet decode
    cost. No Spark datasource exists for it, so BOTH directions run
    executor-side through Arrow `mapInPandas`: the writer emits one
    .arrows file per partition (TaskContext partition id names it —
    deterministic, rerun-overwrites), the reader parallelizes the
    FILE LIST (driver touches names only, never bytes) and each task
    streams its file's record batches back out. Typed roundtrip
    (long, double, string) is exact — Arrow is the same memory format
    pandas-on-Spark already speaks."""
    import glob as _glob
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out_dir = os.path.join(scratch_dir("arrow_ipc", sf_dir), "supplier_arrows")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [pa.Table.from_pandas(b) for b in batches]
        import pandas as pd

        if tables:
            path = os.path.join(out_dir, f"part-{pid:05d}.arrows")
            with pa.OSFile(path, "wb") as f:
                with pa.ipc.new_file(f, tables[0].schema) as w:
                    for tb in tables:
                        w.write_table(tb)
        yield pd.DataFrame({"path": [f"part-{pid:05d}"], "n": [sum(len(t) for t in tables)]})

    # materialize the write; the manifest is one row per partition —
    # a bounded metadata collect (file names, never data)
    sup.mapInPandas(write_part, "path string, n bigint").collect()

    files = sorted(_glob.glob(os.path.join(out_dir, "*.arrows")))
    flist = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(max(len(files), 1))

    def read_part(batches):
        import pyarrow as pa

        for b in batches:
            for path in b["path"]:
                with pa.OSFile(path, "rb") as f:
                    reader = pa.ipc.open_file(f)
                    for i in range(reader.num_record_batches):
                        yield reader.get_batch(i).to_pandas()

    schema = "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
    return flist.mapInPandas(read_part, schema)


# --- Protobuf wire-format interchange (r10) ------------------------------------------

_PROTO_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"

_PROTO_SPEC = [
    (1, "s_suppkey", "int64"),
    (2, "s_name", "string"),
    (3, "s_nationkey", "int64"),
    (4, "s_acctbal", "double"),
]


@register("fmt_protobuf_roundtrip", oracle=_PROTO_SQL, tags=("sources", "bench"))
def fmt_protobuf_roundtrip(spark, sf_dir):
    """parquet → protobuf length-delimited stream files → decode back →
    identical values. Protobuf is the RPC-exhaust format event
    pipelines ingest by the petabyte; no proto library ships in the
    sandbox, so the WIRE FORMAT itself is implemented from the public
    spec (operators/protowire.py — varints, tags, fixed64 doubles,
    length-delimited framing compatible with writeDelimitedTo; golden
    bytes pinned in tests/test_protowire.py). Both directions run
    inside Arrow `mapInPandas`: encode writes one .pb file per
    partition, decode parallelizes the file list — bytes never touch
    the driver. Doubles roundtrip bit-exact (fixed64 IS the IEEE
    image), so the oracle hash-matches."""
    import glob as _glob
    import os
    import shutil

    from etlalchemy_spark.operators.protowire import (
        decode_delimited_stream,
        encode_delimited_stream,
    )
    from etlalchemy_spark.queries._util import scratch_dir

    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out_dir = os.path.join(scratch_dir("protobuf", sf_dir), "supplier_pb")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        blobs = []
        n = 0
        for b in batches:
            rows = b.to_dict("records")
            n += len(rows)
            blobs.append(encode_delimited_stream(iter(rows), _PROTO_SPEC))
        if n:
            with open(os.path.join(out_dir, f"part-{pid:05d}.pb"), "wb") as f:
                for blob in blobs:
                    f.write(blob)
        yield pd.DataFrame({"n": [n]})

    sup.mapInPandas(write_part, "n bigint").collect()

    files = sorted(_glob.glob(os.path.join(out_dir, "*.pb")))
    flist = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(max(len(files), 1))

    def read_part(batches):
        import pandas as pd

        for b in batches:
            for path in b["path"]:
                buf = open(path, "rb").read()
                rows = list(decode_delimited_stream(buf, _PROTO_SPEC))
                if rows:
                    yield pd.DataFrame(rows)

    schema = "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
    return flist.mapInPandas(read_part, schema)


# --- CSV with quoted newlines / embedded quotes (r10) --------------------------------

_CSV_TORTURE_SQL = """
SELECT doc_id,
       'line1
"quoted" middle,' || CAST(doc_id AS STRING) || '
tail' AS gnarly,
       CASE WHEN doc_id % 3 = 0 THEN NULL ELSE 'v' || CAST(doc_id AS STRING) END
         AS maybe_null
FROM documents WHERE doc_id < 200
"""


@register("fmt_csv_quoted_newlines", oracle=_CSV_TORTURE_SQL, tags=("sources",))
def fmt_csv_quoted_newlines(spark, sf_dir):
    """CSV torture roundtrip (r10): values containing EMBEDDED
    NEWLINES, embedded double quotes, and commas — the cases that
    break naive line-splitting ingestion — written with full quoting
    and read back with ``multiLine=true`` (without it Spark's
    line-oriented reader splits records mid-value; the option trades
    per-line splittability for record correctness, the documented
    cost on huge single files). NULL vs empty-string round-tripping
    is pinned too (nullValue vs quoted empty — the classic silent CSV
    corruption). Values reconstruct exactly; the oracle recomputes
    them without touching the files."""
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    src = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.concat(
                F.lit('line1\n"quoted" middle,'),
                F.col("doc_id").cast("string"),
                F.lit("\ntail"),
            ).alias("gnarly"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("v"), F.col("doc_id").cast("string")))
            .alias("maybe_null"),
        )
    )
    path = os.path.join(scratch_dir("csv_torture", sf_dir), "gnarly_csv")
    (
        src.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .schema("doc_id bigint, gnarly string, maybe_null string")
        .csv(path)
    )


# --- Dynamic partition overwrite: idempotent backfill (r10) ---------------------------

_BACKFILL_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS total_price,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_backfilled
FROM orders
GROUP BY o_orderstatus
"""


@register("fmt_backfill_partition_overwrite", oracle=_BACKFILL_SQL, tags=("sources", "etl", "layout"))
def fmt_backfill_partition_overwrite(spark, sf_dir):
    """Idempotent partition backfill via DYNAMIC partition overwrite
    (r10) — the daily-pipeline contract: re-running yesterday's load
    must replace exactly yesterday's partition, never truncate the
    table (static overwrite mode's infamous foot-gun) and never
    duplicate rows (append mode's). Sequence: write all partitions;
    re-run the 'F'-status backfill TWICE with
    partitionOverwriteMode=dynamic; read the table back. The oracle
    is the plain one-shot aggregate — any truncation of untouched
    partitions or duplication in the backfilled one breaks the hash.
    At 100 TB this is THE reprocessing primitive: the overwrite's
    file operations touch only the partition directories present in
    the incoming data."""
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = os.path.join(scratch_dir("backfill_dyn", sf_dir), "orders_part")
    (
        o.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    backfill = o.where(F.col("o_orderstatus") == "F")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for _ in range(2):  # idempotence: the re-run must be a no-op
            (
                backfill.write.mode("overwrite")
                .partitionBy("o_orderstatus")
                .parquet(path)
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("total_price"),
        F.sum((F.col("o_orderstatus") == "F").cast("int"))
        .cast("bigint")
        .alias("n_backfilled"),
    )


# --- Avro Object Container File interchange (r11) ------------------------------------

_AVRO_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"

_AVRO_SPEC = [
    ("s_suppkey", "long"),
    ("s_name", "string"),
    ("s_nationkey", "long"),
    ("s_acctbal", "double"),
]


def _avro_roundtrip(spark, sf_dir, codec: str, tag: str):
    """Shared body for the two Avro gate queries: parquet → one .avro
    Object Container File per partition → schema-driven decode back.
    Both directions inside Arrow `mapInPandas`; the file list (a
    bounded manifest, never data) is the only driver-side collect."""
    import glob as _glob
    import os
    import shutil

    from etlalchemy_spark.operators.avrowire import read_ocf, write_ocf
    from etlalchemy_spark.queries._util import scratch_dir

    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out_dir = os.path.join(scratch_dir(f"avro_{tag}", sf_dir), "supplier_avro")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for b in batches:
            rows.extend(b.to_dict("records"))
        if rows:
            blob = write_ocf(iter(rows), _AVRO_SPEC, codec=codec, record_name="supplier")
            with open(os.path.join(out_dir, f"part-{pid:05d}.avro"), "wb") as f:
                f.write(blob)
        yield pd.DataFrame({"n": [len(rows)]})

    sup.mapInPandas(write_part, "n bigint").collect()

    files = sorted(_glob.glob(os.path.join(out_dir, "*.avro")))
    flist = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(max(len(files), 1))

    def read_part(batches):
        import pandas as pd

        for b in batches:
            for path in b["path"]:
                buf = open(path, "rb").read()
                _, rows = read_ocf(buf, _AVRO_SPEC)
                if rows:
                    yield pd.DataFrame(rows)

    schema = "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
    return flist.mapInPandas(read_part, schema)


@register("fmt_avro_roundtrip", oracle=_AVRO_SQL, tags=("sources", "bench"))
def fmt_avro_roundtrip(spark, sf_dir):
    """parquet → Avro Object Container Files → decode back → identical
    values. Avro is THE Kafka/Hive-lineage interchange format — the
    last mainstream format with zero coverage here (no spark-avro
    connector jar offline, no avro library in the sandbox), so the
    container format is implemented from the public spec
    (operators/avrowire.py — zigzag varint longs, IEEE-LE doubles,
    metadata map with embedded schema JSON, 16-byte sync-marker block
    framing; golden bytes incl. the spec's own zigzag/varint examples
    pinned in tests/test_avrowire.py). Decode is schema-DRIVEN from
    the embedded avro.schema, so third-party files over the supported
    subset read without caller config. Both directions run inside
    Arrow `mapInPandas`: encode writes one .avro per partition, decode
    parallelizes the file list — bytes never touch the driver. Longs
    zigzag-roundtrip exactly and doubles are the raw IEEE image, so
    the oracle hash-matches. Upstream parity: etlalchemy file
    dump/load surface (ETLAlchemySource.py ≈L750–800)."""
    return _avro_roundtrip(spark, sf_dir, "null", "null")


@register("fmt_avro_deflate_roundtrip", oracle=_AVRO_SQL, tags=("sources",))
def fmt_avro_deflate_roundtrip(spark, sf_dir):
    """Avro OCF with the ``deflate`` codec — per-block raw RFC-1951
    compression (zlib -15 window bits, no zlib header), the spec's
    required-if-any compression codec and the common Kafka-archive
    setting. Same partition-local write/read shape as
    `fmt_avro_roundtrip`; blocks decompress independently so a reader
    can still split on sync markers at scale. Compression is
    bit-transparent — the oracle hash-match proves decode(inflate(
    deflate(encode(x)))) == x end to end."""
    return _avro_roundtrip(spark, sf_dir, "deflate", "deflate")


# --- parquet compression-codec matrix (r11) --------------------------------------------------

_CODEC_SQL = """
WITH base AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(o_orderkey * 31 + o_custkey) AS BIGINT) AS key_checksum,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE)
           AS price_sum
  FROM orders
)
SELECT codec, CAST(n_rows AS BIGINT) AS n_rows, key_checksum, price_sum
FROM base, (VALUES ('gzip'), ('lz4'), ('snappy'), ('zstd')) AS c(codec)
ORDER BY codec
"""


@register("fmt_parquet_codec_matrix", oracle=_CODEC_SQL, tags=("sources",))
def fmt_parquet_codec_matrix(spark, sf_dir):
    """orders written and read back through FOUR parquet compression
    codecs (snappy/gzip/zstd/lz4) — the knob every 100 TB lake tunes
    (zstd ~30% smaller than snappy at similar scan cost; gzip smaller
    still but CPU-bound on write): each leg is a REAL write + read of
    separate files, proving codec round-trip fidelity, and the
    returned per-codec row-count / key-checksum / decimal price sum
    must all agree with the source (parquet pages are codec-compressed
    INSIDE the splittable container, so unlike fmt_csv_gzip_roundtrip
    there is no parallelism cliff — documented contrast). One row per
    codec keeps the gate cheap; sizes vary per build so only content
    facts ship."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(18,4)").alias("o_totalprice"),
    )
    out = None
    root = scratch_dir("codecs", sf_dir)
    for codec in ("gzip", "lz4", "snappy", "zstd"):
        path = os.path.join(root, f"orders_{codec}")
        src.write.mode("overwrite").option("compression", codec).parquet(path)
        back = spark.read.parquet(path)
        leg = back.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_orderkey") * 31 + F.col("o_custkey"))
            .cast("bigint").alias("key_checksum"),
            F.sum("o_totalprice").cast("decimal(38,4)").cast("double")
            .alias("price_sum"),
        ).select(F.lit(codec).alias("codec"), "*")
        out = leg if out is None else out.unionAll(leg)
    return out.orderBy("codec")


_JSONL_EVOLVE_SQL = """
SELECT doc_id,
       lang,
       source,
       CAST(NULL AS DOUBLE) AS quality_score,
       CAST(NULL AS BIGINT) AS quality_toks,
       1 AS schema_version
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id,
       lang,
       source,
       CAST(n_chars % 100 AS DOUBLE) / 100.0 AS quality_score,
       CAST(n_chars AS BIGINT) AS quality_toks,
       2 AS schema_version
FROM documents WHERE doc_id % 2 = 1
"""


@register("fmt_jsonl_nested_evolution", oracle=_JSONL_EVOLVE_SQL, tags=("sources",))
def fmt_jsonl_nested_evolution(spark, sf_dir):
    """JSONL feed whose NESTED metadata struct evolved between batches
    (r11 verdict #7 — the last common interchange shape without
    external jars): batch v1 carries meta={lang, source}; batch v2
    DEEPENS it to meta={lang, source, quality:{score, toks}}. Both
    batches are written as real JSON Lines text, then read back
    through ONE merged from_json schema — the superset struct — so v1
    rows null-fill the fields their writer never knew about, exactly
    the mergeSchema semantics fmt_schema_evolution proves for parquet
    footers, but at the JSON-text layer where there ARE no footers
    (the schema union is declared, not discovered; at 100 TB that's
    the difference between one schema literal and a full inference
    scan per batch). from_json runs JVM-side (JacksonParser inside
    codegen — no UDF); the final projection flattens the nested
    quality struct to typed top-level columns."""
    import os

    from pyspark.sql import types as T

    from etlalchemy_spark.queries._util import scratch_dir

    docs = t(spark, sf_dir, "documents")
    tmp = scratch_dir("jsonl_evolve", sf_dir)
    base = os.path.join(tmp, "docs_jsonl")
    v1 = docs.where(F.col("doc_id") % 2 == 0).select(
        F.to_json(
            F.struct(
                F.col("doc_id"),
                F.struct(F.col("lang"), F.col("source")).alias("meta"),
            )
        ).alias("value")
    )
    v2 = docs.where(F.col("doc_id") % 2 == 1).select(
        F.to_json(
            F.struct(
                F.col("doc_id"),
                F.struct(
                    F.col("lang"),
                    F.col("source"),
                    F.struct(
                        ((F.col("n_chars") % 100).cast("double") / F.lit(100.0)).alias("score"),
                        F.col("n_chars").cast("bigint").alias("toks"),
                    ).alias("quality"),
                ).alias("meta"),
            )
        ).alias("value")
    )
    v1.write.mode("overwrite").text(os.path.join(base, "v1"))
    v2.write.mode("overwrite").text(os.path.join(base, "v2"))
    merged = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField("source", T.StringType()),
                        T.StructField(
                            "quality",
                            T.StructType(
                                [
                                    T.StructField("score", T.DoubleType()),
                                    T.StructField("toks", T.LongType()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )
    back = spark.read.text(
        [os.path.join(base, "v1"), os.path.join(base, "v2")]
    )
    j = back.select(F.from_json("value", merged).alias("r"))
    return j.select(
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.meta.lang").alias("lang"),
        F.col("r.meta.source").alias("source"),
        F.col("r.meta.quality.score").alias("quality_score"),
        F.col("r.meta.quality.toks").alias("quality_toks"),
        F.when(F.col("r.meta.quality").isNull(), 1).otherwise(2).alias("schema_version"),
    )
