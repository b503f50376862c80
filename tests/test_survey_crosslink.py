"""SURVEY §2 ↔ registry truth maintenance (VERDICT r5 ask 6).

SURVEY.md §2 is the operative spec; its rows cite registered query
names in backticks. Nothing previously machine-checked those citations,
so a renamed or deleted query could leave the spec pointing at nothing
(and a new query family could go unspecified). Same discipline
test_gate_file.py applies to the gate, applied to the spec itself:

- FORWARD: every §2 backticked token that *looks like* a query name
  (its prefix family matches a registered family) must be registered —
  modulo a short explicit allowlist of non-query identifiers that
  share a family prefix.
- CONVERSE: every registry tag (operator family) must be represented
  in §2 — by a cited query bearing the tag, or by the tag word itself
  appearing in the section prose.
"""

import re

from etlalchemy_spark.registry import all_queries

SURVEY = "/root/repo/SURVEY.md"

# Backticked identifiers in §2 that share a family prefix with
# registered queries but are NOT queries (format names, API names).
ALLOWED_NON_QUERY = {
    "events_replay",  # streaming source format name
    "pandas_udf",  # PySpark API name
}

# Tags that describe harness roles, not operator families.
META_TAGS = {"bench", "flagship"}

# Tag → spelling used in SURVEY prose where it differs from the tag.
TAG_SPELLING = {"asof": "as-of"}


def _section2() -> str:
    text = open(SURVEY).read()
    m = re.search(r"## 2\. Operator inventory(.*?)\n## 3", text, re.S)
    assert m, "SURVEY.md lost its §2/§3 structure"
    return m.group(1)


def test_survey_citations_resolve_to_registered_queries():
    sec = _section2()
    qs = set(all_queries())
    families = {n.split("_")[0] for n in qs}
    tokens = set(re.findall(r"`([a-z][a-z0-9_]+)`", sec))
    querylike = {t for t in tokens if "_" in t and t.split("_")[0] in families}
    stale = sorted(querylike - qs - ALLOWED_NON_QUERY)
    assert not stale, (
        f"SURVEY §2 cites unregistered query names: {stale} — rename the "
        "citation, re-register the query, or (for a genuine non-query "
        "identifier) extend ALLOWED_NON_QUERY"
    )


def test_every_registry_tag_family_appears_in_survey():
    sec = _section2()
    sec_lower = sec.lower()
    qs = all_queries()
    cited = set(re.findall(r"`([a-z][a-z0-9_]+)`", sec)) & set(qs)
    tags_cited = {t for n in cited for t in qs[n].tags}
    missing = []
    for tag in sorted({t for q in qs.values() for t in q.tags} - tags_cited - META_TAGS):
        if TAG_SPELLING.get(tag, tag) not in sec_lower:
            missing.append(tag)
    assert not missing, (
        f"registry tag families with no SURVEY §2 representation: {missing} "
        "— add a Table B row citing a query of that family"
    )
