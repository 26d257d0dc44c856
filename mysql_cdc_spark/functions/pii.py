"""PII detection and redaction over document text — a standard
pre-training scrub pass.  Pure JVM-side regex expressions (no Python
UDFs); the patterns are written to the RE2-compatible subset so the
DuckDB oracle evaluates the IDENTICAL pattern (no lookaround, no
backreferences — both engines agree on every match).

At 100 TB this is a narrow map-only stage: counts and redaction fuse
into the scan projection; nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns, shared verbatim with the oracle SQL.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]?\d{0,4}"

REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts + fully redacted text.  Counts are
    computed BEFORE redaction; redactions apply in a fixed order
    (email → ip → phone) so output text is deterministic."""
    t = F.col(text_col)
    redacted = t
    for pattern, token in REDACTIONS:
        redacted = F.regexp_replace(redacted, pattern, token)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0))).cast("bigint").alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).cast("bigint").alias("n_phones"),
        redacted.alias("redacted_text"),
    )
