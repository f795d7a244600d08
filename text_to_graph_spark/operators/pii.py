"""PII detection + redaction over the documents table.

A training-data pipeline must scrub personally identifying strings before
the corpus ships; the reference has no equivalent (it extracts triples from
trusted HTML), so this is brief-scope: the LLM-data-pipeline text-analysis
family. Everything is JVM-side `regexp_extract_all` / `regexp_replace` —
no Python in the hot path, and the patterns are written in the common
subset of Java regex (Spark) and RE2 (DuckDB oracle): character classes,
bounded repetition, `\\b` word boundaries — no lookahead, no backrefs.

Scale (100 TB): per-row projection expressions only — zero shuffles; the
scan stage fuses detection and redaction into whole-stage codegen. The
rollup variant is one partial-agg'd groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Patterns deliberately conservative (precision over recall) and portable
# across Java regex / RE2. Text is lowercased upstream in the synthetic
# corpus; [a-zA-Z] classes keep them honest on mixed-case input anyway.
PII_PATTERNS: dict[str, str] = {
    "email": r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "url": r"\bhttps?://[a-zA-Z0-9./_%+?=&#-]+",
}

# Redaction order matters: URLs can contain '.'-runs an ipv4 pattern would
# half-match after the URL is replaced, so redact URLs first, then emails
# (which contain dots), then ipv4, then phones.
_REDACT_ORDER = ("url", "email", "ipv4", "phone")


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII hit counts: (doc_id, n_emails, n_phones, n_ipv4,
    n_urls, n_pii) — the filter/audit table a curation gate consumes.

    Pure projection (size of regexp_extract_all per class); one scan, no
    shuffle, no Python.
    """
    cols = {
        name: F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }
    return docs.select(
        F.col(id_col).alias("doc_id"),
        cols["email"].cast("long").alias("n_emails"),
        cols["phone"].cast("long").alias("n_phones"),
        cols["ipv4"].cast("long").alias("n_ipv4"),
        cols["url"].cast("long").alias("n_urls"),
        (cols["email"] + cols["phone"] + cols["ipv4"] + cols["url"])
        .cast("long")
        .alias("n_pii"),
    )


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redacted corpus: each PII class replaced by its typed placeholder
    (``<EMAIL>``, ``<PHONE>``, ``<IP>``, ``<URL>``), applied in an order
    that keeps the classes from half-matching each other's leftovers.

    Returns (doc_id, text, redacted, was_redacted). Chained
    ``regexp_replace`` stays in one codegen stage — the redacted corpus
    costs one scan, not four.
    """
    placeholder = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>", "url": "<URL>"}
    red = F.col(text_col)
    for name in _REDACT_ORDER:
        red = F.regexp_replace(red, PII_PATTERNS[name], placeholder[name])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        red.alias("redacted"),
        (red != F.col(text_col)).alias("was_redacted"),
    )
