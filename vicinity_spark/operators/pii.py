"""PII detection and redaction for pretraining corpora (r7 ★).

Large-scale training pipelines scrub personally identifiable
information before anything else sees the text (emails, phone
numbers, IP addresses, national-id shapes). Both surfaces here are
PURE per-row projections — `regexp_count` / chained `regexp_replace`
in whole-stage codegen, zero shuffles, zero Python — so at 100 TB
they ride the ingest scan for free.

The pattern table is deliberately restricted to the regex dialect
intersection of Java (Spark) and RE2 (DuckDB, Go, etc.): character
classes, bounded repetition, `\\b` word boundaries — no lookaround,
no backreferences. That keeps every pattern oracle-checkable
cross-engine AND portable to whatever scrubber runs next to Spark in
a real pipeline.

Redaction order is FIXED (email → ipv4 → ssn → phone) and matters:
an email's local part may contain digits and dots, so it must leave
the text before the numeric shapes scan it. The four shipped shapes
are mutually non-overlapping after that ordering (ipv4 needs three
dots; ssn/phone digit-group shapes are disjoint), so the chain is
confluent — each category sees text in which earlier categories have
already been replaced by non-matching tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# category → (pattern, replacement token); insertion order IS the
# redaction order (see module docstring)
PII_PATTERNS: "dict[str, tuple[str, str]]" = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def pii_count_cols(text_col: str = "text") -> "list":
    """One `n_<category>` LongType column expression per category —
    match counts over the ORIGINAL text (counting before redaction is
    the audit contract: redaction must remove exactly what was
    counted)."""
    return [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{cat}")
        for cat, (pat, _) in PII_PATTERNS.items()
    ]


def redact_col(text_col: str = "text"):
    """The redacted-text column expression: the fixed-order
    `regexp_replace` chain. A pure projection — compose it into any
    scan/clean pipeline without a materialization step."""
    out = F.col(text_col)
    for _cat, (pat, repl) in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_ssn, n_phone, n_pii, redacted) —
    per-doc PII audit counts plus the scrubbed text, in one
    projection. `n_pii` is the total match count across categories;
    filter `n_pii > 0` for the quarantine set, select `redacted` for
    the clean corpus — both from this single plan."""
    counts = pii_count_cols(text_col)
    total = sum(
        (F.regexp_count(F.col(text_col), F.lit(p)).cast("long") for _, (p, _) in PII_PATTERNS.items()),
        F.lit(0).cast("long"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *counts,
        total.alias("n_pii"),
        redact_col(text_col).alias("redacted"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """`docs` with `text_col` scrubbed in place — every other column
    untouched, schema preserved. The writer-side form of `pii_scan`."""
    return docs.withColumn(text_col, redact_col(text_col))
