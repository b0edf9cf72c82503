"""PII detection + redaction for the training-data pipeline (task brief:
operations a large-scale training-data pipeline needs): email / IPv4 /
phone-number counting and in-place redaction, entirely as JVM
``regexp_extract_all`` / ``regexp_replace`` column expressions — no Python
in the hot path, so the scan stays inside whole-stage codegen and the
filter/projection pushes down at 100 TB.

The patterns are deliberately restricted to the regex dialect shared by
Spark's Java engine and DuckDB's RE2 (no lookahead/lookbehind, no
backrefs), so every function has an exact oracle twin in
``__spark_entry__.oracle_sql()``; value hashes must match.

Redaction replaces matches with typed placeholders (``<EMAIL>``,
``<PHONE>``, ``<IP>``) rather than deleting them — downstream token counts
stay stable and the redaction is idempotent (placeholders contain no
character that re-matches any pattern). Order is load-bearing: emails are
redacted first (their local part may contain digit runs an IP/phone
pattern would shred), then phones, then IPs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dialect-shared patterns (Java regex == RE2 for these constructs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast(
        "bigint"
    )


def email_count(text: Column) -> Column:
    return _count(text, EMAIL_RE)


def phone_count(text: Column) -> Column:
    return _count(text, PHONE_RE)


def ipv4_count(text: Column) -> Column:
    """IPv4-shaped dotted quads. NOTE: counted on the RAW text, so a
    dotted-quad inside an email's local part is counted both as part of the
    email and as an IP — the count is a detection signal, not a partition
    of the text (redaction resolves overlaps by order)."""
    return _count(text, IPV4_RE)


def pii_count(text: Column) -> Column:
    """Total PII hits (the usual filter signal: drop or route documents
    whose count exceeds a budget)."""
    return email_count(text) + phone_count(text) + ipv4_count(text)


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its typed placeholder. Three chained
    ``regexp_replace`` calls — one projection, zero shuffles, codegen'd."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")
