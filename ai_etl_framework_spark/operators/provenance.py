"""Corpus provenance analytics — where does the training data COME
from: per-domain document counts, volume share, length profile and
language spread over a URL column. The first table every web-corpus
card shows (domain mix drives dedup policy, quality weighting and
licensing review). Beyond-reference scope (grep 'domain\\|url' over
/root/reference/src transformers/analyzers: no URL analytics).

Pinned semantics (oracle-replicated):

``extract_domain`` (expression):
- host = first capture of ``^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)``
  lower-cased (scheme-mandatory — scheme-less strings yield NULL:
  provenance needs real URLs, not guesses), with one leading
  ``www.`` stripped AFTER lower-casing. Ports/paths/queries/userinfo
  excluded by the character class. RE2-safe (no backrefs/lookarounds)
  so the DuckDB twin runs the same pattern verbatim.

``domain_stats``:
- one row per non-NULL domain: (domain, n_docs, share, avg_chars,
  n_langs) — share = n_docs / total docs WITH a domain (rounded 6dp),
  avg_chars = mean text length (6dp), n_langs = distinct non-NULL
  lang values; docs with NULL/unparseable url are EXCLUDED from both
  numerator and denominator (they have no provenance) and reported
  via the companion ``n_unattributed`` count column (same value on
  every row — a summary rider, like profile tables do).

Scale shape: one projection (regexp on the URL only — never the
document text) + ONE hash aggregation on the domain + a 1-row scalar
aggregate broadcast for the share denominator. Domain cardinality is
web-host-sized (millions, not corpus-sized); nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["extract_domain", "domain_stats"]

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def extract_domain(url: Column) -> Column:
    """Lower-cased host with one leading www. stripped; NULL when the
    value is not a scheme-qualified URL — module pins."""
    host = F.lower(F.regexp_extract(F.lower(url), _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host != "", host)


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(domain, n_docs, share, avg_chars, n_langs, n_unattributed) —
    module pins."""
    base = df.select(
        extract_domain(F.col(url_col)).alias("__domain"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__len"),
        F.col(lang_col).alias("__lang"),
    )
    counts = base.agg(
        F.count(F.col("__domain")).cast("long").alias("__attr"),
        F.count(F.when(F.col("__domain").isNull(), 1))
        .cast("long")
        .alias("__unattr"),
    )
    per = (
        base.where(F.col("__domain").isNotNull())
        .groupBy(F.col("__domain").alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("__len"), 6).alias("avg_chars"),
            F.countDistinct("__lang").cast("long").alias("n_langs"),
        )
    )
    return per.crossJoin(F.broadcast(counts)).select(
        "domain",
        "n_docs",
        F.round(F.col("n_docs") / F.col("__attr"), 6).alias("share"),
        "avg_chars",
        "n_langs",
        F.col("__unattr").alias("n_unattributed"),
    )
