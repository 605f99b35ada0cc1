"""PII detection/redaction as pure column expressions (north-star
training-data pipeline scope — scrub emails/phones/IPs before a corpus
ships to training).

Patterns are deliberately written in the regex subset shared by Java
(Spark) and RE2 (DuckDB) so the DuckDB oracle runs the IDENTICAL pattern:
no lookbehind, no backrefs, no possessive quantifiers. Redaction is a
chain of ``regexp_replace`` calls — fully codegen'd, no UDF, safe at any
scale (per-row work is linear in text length).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: type -> (pattern, replacement token). Order matters: email first so the
#: host part of an address is never half-eaten by the IP rule.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its type token."""
    out = text
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII type (bigint)."""
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(text, F.lit(pattern)).cast("bigint")


def pii_total(text: Column) -> Column:
    """Total PII matches across all types (bigint)."""
    total = F.lit(0).cast("bigint")
    for kind in PII_PATTERNS:
        total = total + pii_count(text, kind)
    return total


# --- DuckDB twins -----------------------------------------------------------


# DuckDB's standard single-quoted strings pass backslashes through
# verbatim (no escape processing), so the Java-side pattern string drops
# straight in — only embedded quotes would need doubling.


def dd_pii_count(text: str, kind: str) -> str:
    pattern, _ = PII_PATTERNS[kind]
    return f"CAST(len(regexp_extract_all({text}, '{pattern}')) AS BIGINT)"


def dd_redact_pii(text: str) -> str:
    out = text
    for pattern, token in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out
