"""URL canonicalization + URL-level dedup — pure expressions.

Web-scale pretraining corpora dedup by URL before touching content
(CCNet, RefinedWeb, Dolma all do): the same page arrives via tracking-
parameter variants, scheme/host case differences, default ports, and
fragments. ``canonicalize_url`` normalizes all of these with built-in
regexp/HOF expressions (whole-stage codegen, no UDF, no parsing
library), so the canonical form is engine-portable (the DuckDB oracle
reproduces it regexp-for-regexp):

  * fragment stripped (``#...``)
  * scheme and host lowercased (path and query case preserved —
    case-significant on most servers)
  * default ports dropped (``:80`` for http, ``:443`` for https)
  * empty path normalized to ``/``
  * tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
    ``ref``), remaining query parameters SORTED (order-insensitive
    equality), empty query dropped

Contract: absolute http(s) URLs. Intentionally NOT a full RFC 3986
resolver (no percent-decoding, no dot-segment removal) — those rewrites
can change which resource a URL names; dedup wants conservative
normalization that never merges two genuinely different pages.

No reference analogue (SURVEY.md §2.12 dedup family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonicalize_url(c: Column) -> Column:
    u = F.regexp_replace(c, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    raw_path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.sort_array(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def url_dedup_keep(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """One row per canonical URL — the smallest id wins (deterministic).
    Same single-shuffle shape as exact_dedup_keep: canonicalization is a
    narrow projection, the groupBy is map-side combinable."""
    canon = df.withColumn("_curl", canonicalize_url(F.col(url_col)))
    keep = canon.groupBy("_curl").agg(F.min(id_col).alias(id_col))
    return canon.join(keep, [id_col, "_curl"]).drop("_curl")
