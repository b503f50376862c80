"""Generate docs/OPERATORS.md from the query registry (VERDICT r9 #8):
414+ registered queries are beyond discovery by grep, so the surface is
rendered as one page — name, tags, correctness mode (oracle-exact /
rows-only + its exact twin), and the first docstring sentence. The file
is COMMITTED and tests/test_operators_doc.py fails when it drifts from
the registry; regenerate with `python tools/gen_operators_doc.py`.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def first_sentence(doc: str) -> str:
    text = " ".join((doc or "").split())
    m = re.search(r"(?<=[.!?])\s", text)
    s = text[: m.start()] if m else text
    return s[:220] + ("…" if len(s) > 220 else "")


def render() -> str:
    from etlalchemy_spark.registry import all_queries
    from tests.test_twin_invariant import EXACT_TWINS

    qs = all_queries()
    n_exact = sum(1 for q in qs.values() if q.oracle is not None)
    lines = [
        "# Operator index",
        "",
        "GENERATED from the query registry by `tools/gen_operators_doc.py`",
        "— do not edit by hand (tests/test_operators_doc.py pins freshness).",
        "",
        f"{len(qs)} registered queries: {n_exact} oracle-exact (DuckDB hash-",
        f"compared), {len(qs) - n_exact} rows-only (each bound to an",
        "oracle-exact twin, enforced by tests/test_twin_invariant.py).",
        "Every entry is callable as `queries()[name](spark, sf_dir)` via",
        "`__spark_entry__.py`.",
        "",
        "| query | tags | correctness | what it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(qs):
        q = qs[name]
        tags = " ".join(sorted(q.tags))
        mode = (
            "oracle-exact"
            if q.oracle is not None
            else f"rows-only (twin: {EXACT_TWINS.get(name, '?')})"
        )
        doc = first_sentence(q.doc).replace("|", "\\|")
        lines.append(f"| `{name}` | {tags} | {mode} | {doc} |")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    out = os.path.join(ROOT, "docs", "OPERATORS.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
