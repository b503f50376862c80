"""Physical-plan predicates over ``explain('formatted')`` output."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame, column: str | None = None) -> bool:
    """True if the parquet scan carries PushedFilters (optionally
    mentioning ``column``) — i.e. row-group skipping is in play."""
    plan = explain_formatted(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body and (column is None or column in body):
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scans actually read (ReadSchema) —
    the column-pruning audit: a 2-column projection must not read 11."""
    plan = explain_formatted(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = explain_formatted(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes whose partition spec is EMPTY — the single-partition
    shape that funnels all rows through one task (WindowExec's "No
    Partition Defined" warning). Detected from the simple explain:
    a Window node prints ``Window [exprs], [partitionSpec], [orderSpec]``
    when fully specified; with only two top-level bracket groups the
    second is EITHER a partition spec (fine — no global order) or an
    order spec (the offender): order specs carry ASC/DESC markers."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    offenders: list[str] = []
    for line in buf.getvalue().splitlines():
        stripped = line.strip().lstrip("+-: *()0123456789").strip()
        if not stripped.startswith("Window "):
            continue
        depth, groups, cur = 0, [], []
        for ch in stripped:
            if ch == "[":
                if depth == 0:
                    cur = []
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        if len(groups) >= 3:
            continue
        last = groups[-1] if groups else ""
        if len(groups) < 2 or (" ASC" in last or " DESC" in last):
            offenders.append(stripped[:160])
    return offenders


def has_wholestage_codegen(df: DataFrame) -> bool:
    """Codegen spans show as ``*(n)`` stage markers in the simple plan
    (the formatted mode hides them behind AdaptiveSparkPlan)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    simple = buf.getvalue()
    return bool(re.search(r"\*\(\d+\)", simple)) or "WholeStageCodegen" in simple
