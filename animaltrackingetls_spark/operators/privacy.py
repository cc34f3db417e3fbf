"""PII detection and redaction for training-data pipelines.

Before text reaches a training corpus, contact information has to go.
This module does the classic regex tier — emails, phone numbers, IPv4
addresses, SSN-shaped ids — as pure JVM-side expressions
(`regexp_extract_all` to count, `regexp_replace` to rewrite), so
redaction runs inside whole-stage codegen on the scan, no Python in the
path. At 100 TB this is a map-only stage: no shuffle, fully pushdown-
compatible, and the per-type hit counts aggregate map-side.

Pattern notes:

* Patterns are written in the common subset of Java regex (Spark) and
  RE2 (DuckDB, Go tooling): character classes, bounded repetition and
  ``\\b`` word boundaries only — no backreferences, no lookaround. This
  keeps the operator verifiable against a second engine and portable to
  RE2-based scanners.
* Order matters where patterns could overlap (an SSN is a substring
  shape of some phone formats), so :func:`redact_pii` applies patterns
  in the declared dict order and counts matches on the ORIGINAL text —
  counts are what the scanner saw, not what survived earlier rewrites.
* This is the cheap 90%: names/addresses need an NER model, which lives
  behind the same batched-inference seam as ``enrichment.enrich_batched``
  (mapInPandas, Arrow batches) — out of scope for the regex tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Declared order is application order (email first: it contains digits
# and dots that the looser numeric patterns must never see first).
DEFAULT_PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{2,3}-\d{3}-\d{3,4}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _token(name: str) -> str:
    return f"[{name.upper()}]"


def pii_counts(c: Column, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """Per-type match counts on the raw text (before any rewriting)."""
    pats = patterns or DEFAULT_PII_PATTERNS
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in pats.items()
    }


def redact_text(c: Column, patterns: dict[str, str] | None = None) -> Column:
    """The text with every match replaced by its ``[TYPE]`` token, types
    applied in dict order."""
    pats = patterns or DEFAULT_PII_PATTERNS
    out = c
    for name, pat in pats.items():
        out = F.regexp_replace(out, pat, _token(name))
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Attach ``n_<type>`` count columns and the redacted text.

    ``out_col`` defaults to replacing ``text_col`` in place; pass a
    different name to keep the original alongside (e.g. for a
    before/after audit sample).
    """
    pats = patterns or DEFAULT_PII_PATTERNS
    c = F.col(text_col)
    cols = {f"n_{name}": cnt for name, cnt in pii_counts(c, pats).items()}
    cols[out_col or text_col] = redact_text(c, pats)
    return df.withColumns(cols)


def pii_document_filter(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    max_hits: int = 0,
) -> DataFrame:
    """Drop documents whose total PII hit count exceeds ``max_hits`` —
    the "too contaminated to salvage" policy (redaction tokens degrade
    LM training signal when they dominate a document)."""
    counts = list(pii_counts(F.col(text_col), patterns).values())
    total = counts[0]
    for extra in counts[1:]:
        total = total + extra
    return df.filter(total <= F.lit(max_hits))


def oracle_redaction_sql(
    text_expr: str, patterns: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """DuckDB twins for the gate: returns (redacted-text SQL expression,
    [per-type count SQL expressions]) over ``text_expr``. DuckDB's
    ``regexp_replace`` needs the explicit ``'g'`` flag Spark implies;
    the patterns themselves are shared verbatim (RE2-safe subset)."""
    pats = patterns or DEFAULT_PII_PATTERNS

    def q(p: str) -> str:
        # DuckDB string literals don't process backslash escapes — the
        # pattern goes in verbatim, only quotes need doubling.
        return "'" + p.replace("'", "''") + "'"

    redacted = text_expr
    counts = []
    for name, pat in pats.items():
        counts.append(
            f"CAST(len(regexp_extract_all({text_expr}, {q(pat)})) AS BIGINT)"
            f" AS n_{name}"
        )
        redacted = (
            f"regexp_replace({redacted}, {q(pat)}, '{_token(name)}', 'g')"
        )
    return redacted, counts
