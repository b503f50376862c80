"""Text-analysis operators: token counting, quality scoring, language
ID, document fingerprinting.

Mandated extension surface (BASELINE.json). Everything is built-in
string/regex/hash expressions — codegen'd, shuffle-free per-row
transforms that scale embarrassingly. Formulations are chosen so a
DuckDB oracle can recompute them exactly (md5, integer counts, double
ratios of integers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small stopword lexicons per language for the n-gram/stopword-hit
# heuristic language ID (deterministic marker-word scoring).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "los"],
    "zh": ["的", "是", "了", "在", "我"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: alnum runs + individual punctuation marks
    (two regexp_extract_all counts — RE2-compatible, so the DuckDB
    oracle can mirror it; lookarounds are deliberately avoided)."""
    return _count_matches(text, r"[A-Za-z0-9]+") + _count_matches(
        text, r"[^A-Za-z0-9\s]"
    )


def _count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / uppercase features, all exact
    integer counts with double ratios — the standard cheap quality
    signals for corpus filtering."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    words = F.split(F.lower(F.trim(text)), r"\s+")
    n_stop = F.size(F.filter(words, lambda wd: wd.isin(*EN_STOPWORDS)))
    n_punct = _count_matches(text, r"[.!?,;:]")
    n_upper = _count_matches(text, r"[A-Z]")
    denom_c = F.greatest(n_chars, F.lit(1)).cast("double")
    denom_t = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "avg_token_len": (
            (n_chars - (n_tokens - 1)).cast("double") / denom_t
        ),
        "punct_ratio": n_punct.cast("double") / denom_c,
        "upper_ratio": n_upper.cast("double") / denom_c,
        "stopword_ratio": n_stop.cast("double") / denom_t,
    }


def quality_score(feats: dict[str, Column]) -> Column:
    """Composite [0,1]-ish score: rewards mid-length docs with sane
    stopword density, penalizes punctuation/upper spam. Pure double
    arithmetic on exact counts — deterministic cross-engine."""
    length_ok = F.when(
        (feats["n_tokens"] >= 10) & (feats["n_tokens"] <= 100000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    stop_ok = F.when(feats["stopword_ratio"] >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        length_ok * 0.4
        + stop_ok * 0.3
        + (F.lit(1.0) - F.least(feats["punct_ratio"] * 10, F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(feats["upper_ratio"] * 10, F.lit(1.0))) * 0.1
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """Marker-word hit count per language over the lowercased tokens."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    out = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        out.append(
            (lang, F.size(F.filter(words, lambda wd: wd.isin(*markers))))
        )
    return out


def lang_id(text: Column) -> Column:
    """Argmax language with deterministic tie-break (alphabetical wins
    on equal score; 'und' when nothing matches)."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in REVERSE alphabetical order so that on ties the
    # alphabetically-first language ends up winning (> comparison)
    for lang, score in reversed(scores):
        take = score >= F.greatest(best_score, F.lit(1))
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return best


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def md5_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text
    (cross-engine identical — md5 is md5)."""
    return F.md5(normalize_text(text))


def shingle_min_fingerprint(text: Column, k: int = 8) -> Column:
    """Winnowing-style robust fingerprint: minimum md5 over all k-char
    shingles of the normalized text (locality-sensitive to small edits:
    one edit changes only k of the shingles). Expression-only:
    sequence → transform(substring) → array_min."""
    norm = normalize_text(text)
    n = F.length(norm)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    hashes = F.transform(starts, lambda i: F.md5(F.substring(norm, i, k)))
    return F.array_min(hashes)
