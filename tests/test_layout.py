"""Z-order layout: interleave correctness + clustering quality."""

import os

from pyspark.sql import functions as F

from etlalchemy_spark.operators.layout import zorder_value, zorder_write


def _py_z(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_python(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_z(x, y)


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    # a grid where row id correlates with NEITHER dim alone
    rows = [(i % 64, (i * 37) % 64, i) for i in range(4096)]
    df = spark.createDataFrame(rows, "x int, y int, payload int")
    path = os.path.join(str(tmp_path), "z")
    zorder_write(df, path, "x", "y", n_files=8, bits=6)

    back = spark.read.parquet(path).withColumn("f", F.input_file_name())
    spans = back.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
    ).collect()
    # each file must cover well under the full 0..63 range in BOTH dims
    avg_sx = sum(r["sx"] for r in spans) / len(spans)
    avg_sy = sum(r["sy"] for r in spans) / len(spans)
    assert avg_sx < 48 and avg_sy < 48
    # and the data round-trips completely
    assert back.count() == 4096


def test_compact_small_files_reduces_count_and_clusters(spark, tmp_path):
    """Compaction must (a) hit the computed file count, (b) keep
    content identical, (c) leave DISJOINT o-key ranges per file when an
    order column is given (footer pruning stays selective)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.layout import compact_small_files

    frag = os.path.join(str(tmp_path), "frag")
    out = os.path.join(str(tmp_path), "out")
    df = spark.range(20000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    df.repartition(24).write.parquet(frag)
    n_frag = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_frag == 24
    total = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    n = compact_small_files(spark, frag, out, target_bytes=total // 3 + 1, order_col="k")
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) == n <= 4
    back = spark.read.parquet(out)
    assert back.count() == 20000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # disjoint, sorted k-ranges across files
    ranges = []
    for p in files:
        md = pq.ParquetFile(p).metadata
        ks = [
            md.row_group(i).column(j)
            for i in range(md.num_row_groups)
            for j in range(md.row_group(i).num_columns)
            if md.row_group(i).column(j).path_in_schema == "k"
        ]
        ranges.append((min(c.statistics.min for c in ks), max(c.statistics.max for c in ks)))
    ranges.sort()
    assert all(a[1] < b[0] for a, b in zip(ranges, ranges[1:])), f"overlap: {ranges}"


def test_minmax_pruning_layout_disjoint_and_pushed(spark):
    """fmt_sorted_minmax_pruning's claims: (a) each written file owns a
    near-disjoint l_shipdate span (footer min/max selective), (b) the
    range predicate reaches the parquet scan as PushedFilters."""
    import glob
    import os

    import pyarrow.parquet as pq

    from etlalchemy_spark.plans.inspect import explain_formatted
    from etlalchemy_spark.queries._util import scratch_dir
    from etlalchemy_spark.queries.formats import fmt_sorted_minmax_pruning
    from tests.conftest import SF_DIR

    df = fmt_sorted_minmax_pruning(spark, SF_DIR)
    plan = explain_formatted(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:300]

    tmp = os.path.join(scratch_dir("minmax", SF_DIR), "lineitem_by_shipdate")
    spans = []
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for i in range(md.num_row_groups):
            for j in range(md.row_group(i).num_columns):
                c = md.row_group(i).column(j)
                if c.path_in_schema == "l_shipdate" and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4
    spans.sort()
    # range partitioning: spans may touch at a boundary value but not
    # properly overlap
    for a, b in zip(spans, spans[1:]):
        assert a[1] <= b[0], f"overlapping spans: {a} {b}"


def test_bucketed_join_has_no_exchange(spark):
    """The whole point of fmt_bucketed_join_no_shuffle: with both
    sides bucketed (8, key) and sorted, the SortMergeJoin consumes the
    bucket layout directly — ZERO Exchange operators between the scans
    and the join (the groupBy above it may still shuffle; we pin the
    JOIN subtree)."""
    import hashlib

    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    from etlalchemy_spark.registry import all_queries

    # build the bucketed tables via the registered query (it returns
    # the aggregate; re-derive the join-only plan from the tables)
    all_queries()["fmt_bucketed_join_no_shuffle"].fn(spark, sf_dir).collect()
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    o = spark.table(f"bkt_orders_{tag}")
    li = spark.table(f"bkt_lineitem_{tag}")
    j = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:2000]
