"""Unit tests for the DDL epilogue + FK validation (M1/M2/W4)."""

from etlalchemy_spark.operators.ddl import (
    DDLEpilogue,
    FKSpec,
    IndexSpec,
    fk_orphan_count,
    fk_orphans,
)


def test_index_ddl_and_uniquify():
    ep = DDLEpilogue("postgresql")
    ep.add_index(IndexSpec("t1", ["a"], name="idx"))
    ep.add_index(IndexSpec("t2", ["b"], name="idx"))  # same name → uniquified
    ddl = ep.index_ddl()
    assert 'CREATE INDEX "idx" ON "t1" ("a")' == ddl[0]
    assert ddl[1].startswith('CREATE INDEX "idx_0"')


def test_unique_index_and_dialect_quoting():
    ep = DDLEpilogue("mysql")
    ep.add_index(IndexSpec("t", ["a", "b"], unique=True))
    assert ep.index_ddl() == ["CREATE UNIQUE INDEX `idx_t_a_b` ON `t` (`a`, `b`)"]


def test_fk_ddl():
    ep = DDLEpilogue("postgresql")
    ep.add_fk(FKSpec("orders", ["custkey"], "customer", ["custkey"]))
    assert ep.fk_ddl() == [
        'ALTER TABLE "orders" ADD CONSTRAINT "fk_orders_custkey" '
        'FOREIGN KEY ("custkey") REFERENCES "customer" ("custkey")'
    ]


def test_fk_orphans_null_is_not_orphan(spark):
    child = spark.createDataFrame([(1, 10), (2, 99), (3, None)], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    fk = FKSpec("child", ["fk"], "parent", ["pk"])
    orphans = fk_orphans(child, parent, fk).collect()
    assert [r.id for r in orphans] == [2]  # NULL fk row is not an orphan
    row = fk_orphan_count(child, parent, fk).collect()[0]
    assert row.n_orphans == 1 and row.fk == "child(fk)->parent"


def test_fk_multi_column(spark):
    child = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], "id long, k1 long, k2 string")
    parent = spark.createDataFrame([(1, "a")], "k1 long, k2 string")
    fk = FKSpec("c", ["k1", "k2"], "p", ["k1", "k2"])
    assert fk_orphan_count(child, parent, fk).collect()[0].n_orphans == 1


def test_hash_mod_predicates_disjoint_covering():
    from etlalchemy_spark.sources.jdbc import hash_mod_predicates

    preds = hash_mod_predicates("c_name", 4, "postgresql")
    assert len(preds) == 4
    assert all("% 4 =" in p for p in preds)
    assert "IS NULL" in preds[0] and "IS NULL" not in preds[1]
    mysql = hash_mod_predicates("c_name", 2, "mysql")
    assert "CRC32" in mysql[0]


def test_create_table_ddl_types_and_varchar():
    from etlalchemy_spark.operators.ddl import create_table_ddl
    from etlalchemy_spark.operators.standardize import ColumnDecision

    ds = [
        ColumnDecision("k", "bigint", "cast", "smallint"),
        ColumnDecision("flag", "bigint", "cast", "boolean"),
        ColumnDecision("name", "string", "keep", varchar_n=64),
        ColumnDecision("bal", "double", "keep"),
        ColumnDecision("dead", "string", "drop_empty"),
        ColumnDecision("amt", "decimal(12,2)", "keep"),
    ]
    pg = create_table_ddl("t", ds, "postgresql")
    assert pg == (
        'CREATE TABLE "t" ("k" SMALLINT, "flag" BOOLEAN, "name" VARCHAR(64), '
        '"bal" DOUBLE PRECISION, "amt" NUMERIC(12,2))'
    )
    my = create_table_ddl("t", ds, "mysql")
    assert "`flag` TINYINT(1)" in my and "`bal` DOUBLE" in my
    assert "dead" not in my
