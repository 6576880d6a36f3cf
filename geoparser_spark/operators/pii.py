"""PII detection and redaction for training-data curation.

A 100 TB curation pipeline scrubs personally-identifying strings before
anything downstream sees the text.  Everything here is native column
expressions (`regexp_count` / `regexp_replace` — JVM, whole-stage
codegen, zero Python), map-only: no shuffle at any scale.

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (the DuckDB oracle): character classes, bounded
repetition, alternation, `\\b` — no backreferences, no lookaround — so
the oracle SQL in __spark_entry__ mirrors them verbatim.

Redaction replaces matches with typed tags (``<EMAIL>`` etc.), the
standard corpus-scrubbing convention, in a fixed order (email → IPv4 →
phone); tags contain no digits or ``@``, so later passes can never
re-match inside an earlier redaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# E.164-style international, or NANP dashed local form
PHONE_RE = r"(\+\d{7,15}|\b\d{3}-\d{3}-\d{4}\b)"

_TAGS = ((EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document PII match counts (n_email, n_ipv4, n_phone)."""
    c = F.col(text_col)
    return docs.withColumns({
        "n_email": F.regexp_count(c, F.lit(EMAIL_RE)).cast("int"),
        "n_ipv4": F.regexp_count(c, F.lit(IPV4_RE)).cast("int"),
        "n_phone": F.regexp_count(c, F.lit(PHONE_RE)).cast("int"),
    })


def pii_redact(docs: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Append ``out_col``: text with every PII match replaced by its
    typed tag, in the fixed email → IPv4 → phone order."""
    c = F.col(text_col)
    for pat, tag in _TAGS:
        c = F.regexp_replace(c, pat, tag)
    return docs.withColumn(out_col, c)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Signals + redaction in one projection (single codegen stage)."""
    return pii_redact(pii_signals(docs, text_col), text_col)
