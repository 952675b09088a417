"""PII detection and redaction for training-data pipelines.

No reference counterpart; this is the scrub pass that runs between
ingest and dedup in an LM data pipeline (emails / phone numbers / IPv4
literals are the classic C4-style redaction targets). Pure Column
expressions -- regexp_extract_all + chained regexp_replace, JVM-side
whole-stage codegen, zero exchanges, zero Python -- so the pass is a
free rider on whatever scan already touches the text at 100 TB.

Patterns deliberately use the Java-regex/RE2 common subset (character
classes, bounded quantifiers, \\b, non-capturing groups) so the DuckDB
oracle replays them verbatim; redaction order is fixed (email -> ipv4 ->
phone) and tokens are swapped for typed placeholders rather than
deleted, preserving document length statistics downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

# (pattern, placeholder) in application order: emails first (they may
# contain dots that would otherwise be nibbled by the IP pattern), then
# IPs, then phones.
_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def email_count(col: Column) -> Column:
    return _count(col, EMAIL_RE)


def ipv4_count(col: Column) -> Column:
    return _count(col, IPV4_RE)


def phone_count(col: Column) -> Column:
    return _count(col, PHONE_RE)


def scrub_pii(col: Column) -> Column:
    """Redact emails, IPv4 literals and NNN-NNN-NNNN phones with typed
    placeholders, in that fixed order."""
    out = col
    for pattern, placeholder in _RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out
