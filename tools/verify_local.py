"""Local mimic of the driver's correctness gate.

Runs every registered query on Spark at the given sf_dir, runs its
DuckDB oracle over the same parquet files, and compares:
row count, column names, and order-insensitive exact values
(columns sorted by name, rows sorted by all columns).

Usage:  python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

from etlalchemy_spark.registry import all_queries
from etlalchemy_spark.catalog import TABLE_NAMES
from etlalchemy_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v, na_action="ignore"
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    return a == b


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    issues: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        issues.append(f"columns: spark={sc} duck={dc}")
        return issues
    if issues:
        return issues
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            issues.append(
                f"col {c}: {len(bad)}/{len(av)} mismatches; first @row{i}: spark={x!r} duck={y!r}"
            )
    return issues


def result_hash(pdf: pd.DataFrame) -> str:
    """Canonical value-level fingerprint of a result: columns sorted by
    name, rows sorted by all columns, every cell stringified — md5 of
    the whole. Recorded per query in the gate snapshot so future
    rounds can diff VALUE drift across rounds/machines, not just
    pass/fail status (r7 verdict #6)."""
    import hashlib

    n = normalize(pdf)
    payload = "\x1e".join(
        ["|".join(map(str, n.columns))]
        + ["\x1f".join("" if pd.isna(v) is True else str(v) for v in row)
           for row in n.itertuples(index=False)]
    )
    return hashlib.md5(payload.encode("utf-8", "surrogatepass")).hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    args: list[str] = []
    json_path = None
    timed_runs = 1
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--timed-runs="):
            # median-of-N Spark-leg timing (VERDICT r9 #1: single-shot
            # gate secs let one loaded machine-state fake a 2x
            # regression; the committed GATE snapshot runs with 3)
            timed_runs = max(1, int(a.split("=", 1)[1]))
        elif a.startswith("--json="):
            json_path = a.split("=", 1)[1]
        elif a == "--json":
            # space-separated form: consume the next token as the path
            # (silently treating it as a query filter wrote no snapshot
            # while printing a green '0 pass, 0 fail')
            if i + 1 >= len(argv):
                print("--json requires a path", file=sys.stderr)
                return 2
            i += 1
            json_path = argv[i]
        else:
            args.append(a)
        i += 1
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("verify_local")
    con = duck_con(sf_dir)
    qs = all_queries()
    n_pass = n_fail = n_rows_only = 0
    statuses: dict[str, dict] = {}
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            runs = []
            for _ in range(timed_runs):
                t1 = time.monotonic()
                sdf = q.fn(spark, sf_dir).toPandas()
                runs.append(time.monotonic() - t1)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            statuses[name] = {"status": "fail", "detail": f"spark error: {e}"[:300]}
            n_fail += 1
            continue
        import statistics

        spark_secs = round(statistics.median(runs), 2)
        spread = [round(min(runs), 2), round(max(runs), 2)]
        if q.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            st = {
                "status": "rows_only",
                "rows": len(sdf),
                "secs": spark_secs if timed_runs > 1 else round(time.monotonic() - t0, 2),
                "result_hash": result_hash(sdf),
            }
            if timed_runs > 1:
                st["spread"] = spread
            statuses[name] = st
            n_rows_only += 1
            continue
        try:
            # CTAS-then-fetch: streaming fetchdf() on plans with
            # UNNEST/window pipelines re-executes per output chunk in
            # DuckDB (measured 88s vs 0.7s on a 1M-row interpolation
            # result); materializing once sidesteps it for every oracle
            con.execute("CREATE OR REPLACE TEMP TABLE _oracle_result AS " + q.oracle)
            ddf = con.execute("SELECT * FROM _oracle_result").fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            statuses[name] = {"status": "fail", "detail": f"duckdb error: {e}"[:300]}
            n_fail += 1
            continue
        issues = compare(sdf, ddf)
        if issues:
            print(f"FAIL  {name}: " + " | ".join(issues))
            statuses[name] = {"status": "fail", "detail": " | ".join(issues)[:300]}
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.monotonic()-t0:.1f}s]")
            st = {
                "status": "pass",
                "rows": len(sdf),
                "secs": spark_secs if timed_runs > 1 else round(time.monotonic() - t0, 2),
                "result_hash": result_hash(sdf),
            }
            if timed_runs > 1:
                st["spread"] = spread
            statuses[name] = st
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    slow = sorted(
        ((st["secs"], name) for name, st in statuses.items() if st.get("secs", 0) > 15),
        reverse=True,
    )
    if slow:
        print("SLOW (>15s, gate-time budget r8 verdict #5):")
        for secs, name in slow:
            print(f"  {secs:7.1f}s  {name}")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "timed_runs": timed_runs,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "queries": statuses,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
