"""End-to-end migration tests (O1/O2 + sources)."""

import os
import tempfile

from etlalchemy_spark.migrate import FileSource, Migration, Target, print_timings
from etlalchemy_spark.operators.ddl import FKSpec, IndexSpec
from etlalchemy_spark.operators.rules import SchemaRules
from etlalchemy_spark.sources.files import read_file
from etlalchemy_spark.sources.jdbc import column_types_ddl, dialect_of
from etlalchemy_spark.sources.reflection import information_schema_query, reflect_dir

from conftest import SF_DIR


def test_migrate_parquet_to_parquet(spark, tmp_path):
    mig = Migration(
        source=FileSource(SF_DIR, included_tables=["nation", "region"]),
        target=Target(str(tmp_path)),
    )
    reports, ddl = mig.run(spark)
    assert {r.table for r in reports} == {"nation", "region"}
    nation = read_file(spark, str(tmp_path / "nation.parquet"))
    assert nation.count() == 25
    # standardizer narrowed the int32 keys (values 0..24 → tinyint)
    assert dict(nation.dtypes)["n_nationkey"] == "tinyint"
    assert "nation" in print_timings(reports)


def test_migrate_with_rules_and_ddl(spark, tmp_path):
    rules = SchemaRules.from_csv(
        table_csv="Table Name, New Table Name, Delete\nregion, zones,\nnation, , true\n",
    )
    mig = Migration(
        source=FileSource(SF_DIR, included_tables=["nation", "region"]),
        target=Target(str(tmp_path)),
        rules=rules,
        indexes=[IndexSpec("zones", ["r_regionkey"])],
        fks=[FKSpec("zones", ["r_regionkey"], "zones", ["r_regionkey"])],
        validate_fks=True,
    )
    reports, ddl = mig.run(spark)
    # nation deleted by rule; region renamed
    assert [r.dest_table for r in reports] == ["zones"]
    assert os.path.exists(tmp_path / "zones.parquet")
    assert any("CREATE INDEX" in s for s in ddl)
    assert any("FOREIGN KEY" in s for s in ddl)


def test_migrate_to_csv(spark, tmp_path):
    mig = Migration(
        source=FileSource(SF_DIR, included_tables=["region"]),
        target=Target(str(tmp_path), fmt="csv"),
        standardize_types=False,
    )
    reports, _ = mig.run(spark)
    assert reports[0].n_rows == 5
    back = read_file(spark, str(tmp_path / "region.csv"), fmt="csv")
    assert back.count() == 5


def test_reflect_include_exclude(spark):
    infos = reflect_dir(spark, SF_DIR, excluded_tables=["lineitem", "orders"], with_schema=False)
    names = [i.name for i in infos]
    assert "lineitem" not in names and "customer" in names
    only = reflect_dir(spark, SF_DIR, included_tables=["part"])
    assert [i.name for i in only] == ["part"]
    assert only[0].schema is not None  # footer-read schema


def test_jdbc_helpers():
    assert dialect_of("jdbc:postgresql://h/db") == "postgresql"
    assert column_types_ddl({"b": 8, "a": 4}) == "a VARCHAR(4), b VARCHAR(8)"
    q = information_schema_query(schema="public")
    assert "information_schema.tables" in q and "table_schema = 'public'" in q


def test_migrate_duckdb_bulk_target(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "dest.duckdb")
    mig = Migration(
        source=FileSource(SF_DIR, included_tables=["nation", "region"]),
        target=Target(db, fmt="duckdb", mode="error", drop_destination=True),
    )
    reports, _ = mig.run(spark)
    assert {r.dest_table: r.n_rows for r in reports} == {"nation": 25, "region": 5}
    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM nation").fetchall()[0][0] == 25
    # standardizer decisions survive into the loaded schema via the
    # narrowed DataFrame types (0..24 keys → TINYINT)
    types = {r[1]: r[2] for r in con.execute("PRAGMA table_info('nation')").fetchall()}
    assert types["n_nationkey"] == "TINYINT"
    con.close()
    # mode=error now refuses (tables exist, destination not dropped)
    mig2 = Migration(
        source=FileSource(SF_DIR, included_tables=["nation"]),
        target=Target(db, fmt="duckdb", mode="error"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode=error"):
        mig2.run(spark)
    # drop_destination resets the whole database file
    mig3 = Migration(
        source=FileSource(SF_DIR, included_tables=["nation"]),
        target=Target(db, fmt="duckdb", mode="error", drop_destination=True),
    )
    reports3, _ = mig3.run(spark)
    assert [r.n_rows for r in reports3] == [25]
    con = duckdb.connect(db)
    assert [r[0] for r in con.execute("SHOW TABLES").fetchall()] == ["nation"]
    con.close()


def test_migrate_file_target_modes(spark, tmp_path):
    src = FileSource(SF_DIR, included_tables=["region"])
    tgt = str(tmp_path / "out")
    Migration(source=src, target=Target(tgt, mode="overwrite")).run(spark)
    # error mode refuses to clobber existing table files
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):
        Migration(source=src, target=Target(tgt, mode="error")).run(spark)
    # drop_destination removes the directory first, so error mode passes
    reports, _ = Migration(
        source=src, target=Target(tgt, mode="error", drop_destination=True)
    ).run(spark)
    assert reports[0].n_rows == 5


def test_reflection_query_executes_on_live_information_schema(tmp_path):
    # No JDBC driver jars ship in this sandbox, so the S1 JDBC probe
    # can't ride spark.read.jdbc here — but the generated SQL itself
    # runs verbatim against a live information_schema (DuckDB speaks
    # the standard), proving the reflection string is not dead code.
    import duckdb

    con = duckdb.connect(str(tmp_path / "cat.duckdb"))
    con.execute("CREATE TABLE t1 (a INTEGER)")
    con.execute("CREATE TABLE t2 (b VARCHAR)")
    con.execute("CREATE VIEW v1 AS SELECT * FROM t1")
    sub = information_schema_query()
    # strip the JDBC dbtable wrapper "( ... ) t" -> plain SELECT
    inner = sub.strip()
    assert inner.startswith("(") and inner.endswith(") t")
    got = sorted(r[0] for r in con.execute(inner[1:-3]).fetchall())
    # names come back schema-qualified; BASE TABLE filter excludes the view
    assert got == ["main.t1", "main.t2"]
    schema_q = information_schema_query(schema="main")
    got2 = sorted(r[0] for r in con.execute(schema_q.strip()[1:-3]).fetchall())
    assert got2 == ["main.t1", "main.t2"]
    # literal escaping: a quote in the schema filter must not break the
    # probe (or inject through it)
    evil = information_schema_query(schema="o'brien")
    assert "'o''brien'" in evil
    assert con.execute(evil.strip()[1:-3]).fetchall() == []
    con.close()


def test_migrate_duckdb_append_double_load_audit(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "app.duckdb")
    mk = lambda: Migration(
        source=FileSource(SF_DIR, included_tables=["nation"]),
        target=Target(db, fmt="duckdb", mode="append"),
    )
    reports1, _ = mk().run(spark)
    assert [r.n_rows for r in reports1] == [25]  # create-if-absent leg
    reports2, _ = mk().run(spark)
    # the row-count audit reports the table's post-load total: 2x rows
    assert [r.n_rows for r in reports2] == [50]
    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM nation").fetchall()[0][0] == 50
    assert (
        con.execute("SELECT COUNT(DISTINCT n_nationkey) FROM nation").fetchall()[0][0]
        == 25
    )
    con.close()


# --- resumable migration (per-table completion manifest) ---------------------


def test_resume_skips_completed_and_redoes_partial_derby(spark):
    """Kill a two-table Derby migration mid-way (first table loaded,
    second caught mid-load with partial rows at the destination), then
    resume: the completed table is NOT rewritten, the partial table is
    overwritten, and the end state is oracle-exact vs a clean run."""
    import etlalchemy_spark.migrate as migmod
    from etlalchemy_spark.migrate import JdbcSource
    from etlalchemy_spark.sources.jdbc import write_jdbc
    from pyspark.sql import functions as F

    import pytest

    src_url = "jdbc:derby:memory:resume_src;create=true"
    dst_url = "jdbc:derby:memory:resume_dst;create=true"
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("n-"), F.col("id")).alias("name")
    )
    write_jdbc(df, src_url, "aaa", mode="overwrite")
    write_jdbc(df, src_url, "bbb", mode="overwrite")

    mk = lambda: Migration(
        source=JdbcSource(src_url, included_tables=["aaa", "bbb"]),
        target=Target(dst_url, fmt="jdbc", mode="error"),
    )

    real_write = migmod.write_jdbc
    calls: list = []

    def crashing_write(df, url, table, mode="overwrite", **kw):
        calls.append((table, mode))
        if table == "bbb":
            # leave PARTIAL rows at the destination, then die — the
            # worst-case crash point for a naive re-run (append would
            # duplicate, error would refuse)
            real_write(df.where(F.col("id") < 30), url, table, mode="overwrite", **kw)
            raise RuntimeError("simulated crash mid-load")
        return real_write(df, url, table, mode=mode, **kw)

    migmod.write_jdbc = crashing_write
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            mk().run(spark)
    finally:
        migmod.write_jdbc = real_write

    # the manifest recorded: aaa loaded, bbb mid-load
    m = mk()._load_manifest()
    assert m["aaa"]["phase"] == "loaded" and m["aaa"]["rows"] == 100
    assert m["bbb"]["phase"] == "loading"

    # resume: only bbb runs, and it runs as OVERWRITE despite mode=error
    calls.clear()
    migmod.write_jdbc = lambda *a, **kw: (calls.append((a[2], kw.get("mode"))), real_write(*a, **kw))[1]
    try:
        reports, _ = mk().run(spark, resume=True)
    finally:
        migmod.write_jdbc = real_write
    assert [c[0] for c in calls] == ["bbb"]
    assert calls[0][1] == "overwrite"
    assert [(r.table, r.n_rows) for r in reports] == [("bbb", 100)]

    for tbl in ("aaa", "bbb"):
        back = (
            spark.read.format("jdbc")
            .option("url", dst_url)
            .option("dbtable", tbl)
            .load()
        )
        assert sorted(int(r["id"]) for r in back.collect()) == list(range(100))
    assert mk()._load_manifest()["bbb"]["phase"] == "loaded"


def test_resume_file_target_manifest_in_destination(spark, tmp_path):
    """File targets keep the manifest inside the destination directory;
    a completed run resumes to a no-op."""
    mk = lambda: Migration(
        source=FileSource(SF_DIR, included_tables=["nation", "region"]),
        target=Target(str(tmp_path), mode="error"),
    )
    reports1, _ = mk().run(spark)
    assert len(reports1) == 2
    assert os.path.exists(tmp_path / "_migration_manifest.json")
    # mode=error would explode on any rewrite — resume must skip both
    reports2, _ = mk().run(spark, resume=True)
    assert reports2 == []


def test_drop_destination_clears_manifest(spark, tmp_path):
    mk = lambda kw: Migration(
        source=FileSource(SF_DIR, included_tables=["region"]),
        target=Target(str(tmp_path), mode="overwrite", **kw),
    )
    mk({}).run(spark)
    assert os.path.exists(tmp_path / "_migration_manifest.json")
    reports, _ = mk({"drop_destination": True}).run(spark, resume=True)
    # history died with the destination: the table re-runs fully
    assert [r.table for r in reports] == ["region"]


def test_resume_append_mode_partial_refuses(spark, tmp_path):
    """A mid-load crash in APPEND mode is not safely resumable: partial
    rows can't be told apart from pre-existing destination rows, so
    overwrite would destroy legacy data and append would duplicate.
    Resume must refuse loudly."""
    import json

    import pytest

    mk = lambda: Migration(
        source=FileSource(SF_DIR, included_tables=["region"]),
        target=Target(str(tmp_path), mode="append"),
    )
    mk().run(spark)
    # simulate the crash: mark region as caught mid-load
    mp = tmp_path / "_migration_manifest.json"
    m = json.loads(mp.read_text())
    m["region"]["phase"] = "loading"
    mp.write_text(json.dumps(m))
    with pytest.raises(ValueError, match="append"):
        mk().run(spark, resume=True)


def test_resume_reverifies_destination_existence(spark, tmp_path):
    """A manifest can outlive its destination (url-keyed jdbc temp
    manifests especially). Resume must not trust 'loaded' entries whose
    table is absent from the CURRENT destination."""
    import shutil

    mk = lambda: Migration(
        source=FileSource(SF_DIR, included_tables=["nation", "region"]),
        target=Target(str(tmp_path / "dest"), mode="overwrite",
                      manifest_path=str(tmp_path / "manifest.json")),
    )
    reports1, _ = mk().run(spark)
    assert len(reports1) == 2
    # destination recreated empty behind our back; manifest survives
    shutil.rmtree(tmp_path / "dest")
    reports2, _ = mk().run(spark, resume=True)
    assert sorted(r.table for r in reports2) == ["nation", "region"]
    assert os.path.exists(tmp_path / "dest" / "nation.parquet")


def test_resume_still_validates_fks_for_skipped_tables(spark, tmp_path):
    """Skipping a LOAD on resume must not silently skip its FK
    VALIDATION: skipped tables are read back from the destination."""
    import etlalchemy_spark.migrate as migmod

    calls = []
    real = migmod.fk_orphan_count

    def counting(child, parent, fk):
        calls.append(fk.table)
        return real(child, parent, fk)

    mk = lambda: Migration(
        source=FileSource(SF_DIR, included_tables=["nation", "region"]),
        target=Target(str(tmp_path), mode="error"),
        fks=[FKSpec("nation", ["n_regionkey"], "region", ["r_regionkey"])],
        validate_fks=True,
    )
    mk().run(spark)
    migmod.fk_orphan_count = counting
    try:
        reports, _ = mk().run(spark, resume=True)
    finally:
        migmod.fk_orphan_count = real
    assert reports == []  # both tables skipped...
    assert calls == ["nation"]  # ...but the FK check still ran


def test_jdbc_manifest_keyed_on_source_and_destination():
    """The default JDBC resume manifest must differ when the SOURCE
    differs, even for the same destination url — otherwise a second
    migration from another source adopts the first run's manifest and
    silently skips its tables as 'loaded'."""
    from etlalchemy_spark.migrate import FileSource, JdbcSource, Migration, Target

    dst = Target(path="jdbc:derby:memory:manifestkey", fmt="jdbc")
    a = Migration(source=FileSource(path="/data/a"), target=dst)
    b = Migration(source=FileSource(path="/data/b"), target=dst)
    c = Migration(source=JdbcSource(url="jdbc:derby:memory:src"), target=dst)
    paths = {a._manifest_path(), b._manifest_path(), c._manifest_path()}
    assert len(paths) == 3
    # same (source, destination) pair stays stable across runs
    assert a._manifest_path() == Migration(
        source=FileSource(path="/data/a"), target=dst
    )._manifest_path()
    # explicit manifest_path still wins
    e = Target(path="jdbc:derby:memory:manifestkey", fmt="jdbc", manifest_path="/x/m.json")
    assert Migration(source=a.source, target=e)._manifest_path() == "/x/m.json"
