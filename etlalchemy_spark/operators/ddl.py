"""Index / foreign-key DDL epilogue + FK integrity validation.

Re-expresses M1/M2/W4 (upstream ETLAlchemySource.add_indexes /
add_fks ≈L1100–1350; SURVEY.md §0 caveat). Spark has no secondary
indexes, so — as in the reference — indexes and FKs are METADATA whose
creation is deferred until after data load:

- for JDBC sinks we emit ``CREATE INDEX`` / ``ALTER TABLE ... ADD
  CONSTRAINT`` DDL strings (dialect-aware, names uniquified with a
  global counter like the reference's);
- for lake sinks the moral equivalent is layout: ``partitionBy`` /
  ``bucketBy`` / ``sortWithinPartitions`` hints carried alongside;
- FK *integrity* is actually checkable in Spark: a left-anti join
  counting orphans (the reference never validates, only re-creates).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class IndexSpec:
    table: str
    columns: list[str]
    name: str | None = None
    unique: bool = False


@dataclass
class FKSpec:
    table: str
    columns: list[str]
    ref_table: str
    ref_columns: list[str]
    name: str | None = None


_QUOTE = {"mysql": "`", "postgresql": '"', "sqlite": '"', "mssql": "", "oracle": '"'}


def _q(ident: str, dialect: str) -> str:
    q = _QUOTE.get(dialect, '"')
    if dialect == "mssql":
        return f"[{ident}]"
    return f"{q}{ident}{q}"


class DDLEpilogue:
    """Collects index/FK specs during migration; emits DDL after load.

    Name uniquification mirrors the reference's global counter: reused
    index names across tables get ``_0``, ``_1`` … suffixes.
    """

    def __init__(self, dialect: str = "postgresql"):
        self.dialect = dialect
        self.indexes: list[IndexSpec] = []
        self.fks: list[FKSpec] = []
        self._names: dict[tuple, str] | None = None

    def add_index(self, spec: IndexSpec) -> None:
        self.indexes.append(spec)
        self._names = None

    def add_fk(self, spec: FKSpec) -> None:
        self.fks.append(spec)
        self._names = None

    def _assigned_names(self) -> dict[tuple, str]:
        """Names for every spec, computed in ONE deterministic pass over
        indexes then FKs and cached — repeated index_ddl()/fk_ddl()
        calls (dry-run then execute) emit identical DDL instead of
        re-suffixing on every call."""
        if self._names is not None:
            return self._names
        counter = itertools.count()
        seen: set[str] = set()

        def unique(base: str) -> str:
            if base not in seen:
                seen.add(base)
                return base
            name = f"{base}_{next(counter)}"
            while name in seen:
                name = f"{base}_{next(counter)}"
            seen.add(name)
            return name

        names: dict[tuple, str] = {}
        for i, ix in enumerate(self.indexes):
            base = ix.name or "idx_" + "_".join([ix.table, *ix.columns])
            names[("ix", i)] = unique(base)
        for i, fk in enumerate(self.fks):
            base = fk.name or "fk_" + "_".join([fk.table, *fk.columns])
            names[("fk", i)] = unique(base)
        self._names = names
        return names

    def index_ddl(self) -> list[str]:
        assigned = self._assigned_names()
        out = []
        for i, ix in enumerate(self.indexes):
            name = assigned[("ix", i)]
            cols = ", ".join(_q(c, self.dialect) for c in ix.columns)
            uniq = "UNIQUE " if ix.unique else ""
            out.append(
                f"CREATE {uniq}INDEX {_q(name, self.dialect)} "
                f"ON {_q(ix.table, self.dialect)} ({cols})"
            )
        return out

    def fk_ddl(self) -> list[str]:
        assigned = self._assigned_names()
        out = []
        for i, fk in enumerate(self.fks):
            name = assigned[("fk", i)]
            cols = ", ".join(_q(c, self.dialect) for c in fk.columns)
            refs = ", ".join(_q(c, self.dialect) for c in fk.ref_columns)
            out.append(
                f"ALTER TABLE {_q(fk.table, self.dialect)} "
                f"ADD CONSTRAINT {_q(name, self.dialect)} "
                f"FOREIGN KEY ({cols}) "
                f"REFERENCES {_q(fk.ref_table, self.dialect)} ({refs})"
            )
        return out


def fk_orphans(child: DataFrame, parent: DataFrame, fk: FKSpec) -> DataFrame:
    """Rows of ``child`` whose FK value has no match in ``parent``
    (NULL FKs are not orphans, per SQL semantics). Left-anti join:
    one shuffle (or broadcast when the parent is small)."""
    cond = None
    for c, rc in zip(fk.columns, fk.ref_columns):
        eq = child[c] == parent[rc]
        cond = eq if cond is None else (cond & eq)
    non_null = None
    for c in fk.columns:
        nn = child[c].isNotNull()
        non_null = nn if non_null is None else (non_null & nn)
    return child.where(non_null).join(parent, cond, "left_anti")


def fk_orphan_count(child: DataFrame, parent: DataFrame, fk: FKSpec) -> DataFrame:
    """Single-row DataFrame: (constraint_label, n_orphans)."""
    label = f"{fk.table}({','.join(fk.columns)})->{fk.ref_table}"
    return fk_orphans(child, parent, fk).agg(
        F.lit(label).alias("fk"), F.count(F.lit(1)).alias("n_orphans")
    )


# --- CREATE TABLE emission (W4) --------------------------------------------

# Spark simpleString type → destination DDL type. VARCHAR(n) is injected
# from the standardizer's varchar_n metadata (T4) — the fidelity the
# plain df.write.jdbc DDL path loses (it maps every string to TEXT).
_DDL_TYPES = {
    "postgresql": {
        "tinyint": "SMALLINT",
        "smallint": "SMALLINT",
        "int": "INTEGER",
        "integer": "INTEGER",
        "bigint": "BIGINT",
        "boolean": "BOOLEAN",
        "float": "REAL",
        "double": "DOUBLE PRECISION",
        "string": "TEXT",
        "timestamp": "TIMESTAMP",
        "date": "DATE",
        "binary": "BYTEA",
    },
    "mysql": {
        "tinyint": "TINYINT",
        "smallint": "SMALLINT",
        "int": "INT",
        "integer": "INT",
        "bigint": "BIGINT",
        "boolean": "TINYINT(1)",
        "float": "FLOAT",
        "double": "DOUBLE",
        "string": "TEXT",
        "timestamp": "DATETIME",
        "date": "DATE",
        "binary": "BLOB",
    },
}


def create_table_ddl(table: str, decisions, dialect: str = "postgresql") -> str:
    """Emit ``CREATE TABLE`` DDL from standardizer decisions (upstream
    ``Table.create`` path, ETLAlchemySource.py ≈L1000–1050): dropped
    columns are omitted, downsized int types and data-driven
    ``VARCHAR(n)`` (pow-2 rounded, T4) are preserved — the metadata
    Spark's unbounded StringType cannot carry in-engine."""
    tmap = _DDL_TYPES[dialect]
    cols = []
    for d in decisions:
        if d.action in ("drop_empty", "drop_suffix"):
            continue
        src = d.target_type if d.action == "cast" and d.target_type else d.source_type
        if src == "string" and d.varchar_n:
            ddl_t = f"VARCHAR({d.varchar_n})"
        elif src.startswith("decimal"):
            ddl_t = "NUMERIC" + src[len("decimal"):]
        else:
            ddl_t = tmap.get(src, src.upper())
        cols.append(f"{_q(d.name, dialect)} {ddl_t}")
    return f"CREATE TABLE {_q(table, dialect)} ({', '.join(cols)})"
