"""PII redaction for training-data pipelines — pure Column expressions.

Large-scale corpus preparation scrubs personally identifiable
information before training: email addresses, IPv4 addresses, and
phone-shaped number runs are the standard regex-detectable classes
(the ML-detectable classes — names, addresses — need a model pass and
are out of scope for an engine operator).

Everything here is `regexp_replace` / `regexp_count` on JVM-side
codegen'd expressions — no UDF, no shuffle; redaction is a map-only
stage that composes with any downstream operator. Patterns are written
in the common subset of Java regex (Spark) and RE2 (DuckDB/others) so
oracle checks stay portable: no backreferences, no lookbehind.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Conservative, portable patterns (no lookaround/backreferences).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# Phone-ish: optional +country, then 3-4 groups of digits with -/./space
# separators, 7+ digits total. Kept deliberately strict to bound false
# positives on ordinary numbers.
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,6}(?:[-. ][0-9]{2,6})?"

REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_text(col: Column | str) -> Column:
    """Return `col` with every PII match replaced by its class token.

    Order matters: emails first (their domain part would otherwise be
    clipped by later passes), then IPs, then phones.
    """
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in REDACTIONS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """Per-class match counts (for audit metrics / filtering docs whose
    PII density is too high to keep even redacted)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}") for name, pat, _ in REDACTIONS
    ]


def redact_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level redaction pass: adds `<text_col>_redacted` plus
    n_email / n_ipv4 / n_phone audit counts. Map-only — safe to run
    before any partition-sensitive stage."""
    return df.select(
        "*",
        redact_text(text_col).alias(f"{text_col}_redacted"),
        *pii_counts(text_col),
    )
