"""BM25 keyword retrieval as pure DataFrame algebra.

A training-data pipeline uses lexical retrieval constantly — targeted
decontamination, quality probes ("which documents actually answer this
query"), and hard-negative mining all start from a BM25 top-k. This is
the standard Robertson/Lucene formulation:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

computed entirely with built-in expressions (no UDFs, whole-stage
codegen end to end).

Plan shape, chosen for the 100 TB corpus / small query-set case:
the query terms are BROADCAST into the postings derivation, so the only
wide work is one shuffle of the (already term-filtered) postings on
(doc, term) — the corpus rows that contain no query term never leave
their input partition. Document frequency for the surviving terms is
computed from the filtered postings themselves (every document holding
the term is in the filtered set by construction, so the count is the
global df). The corpus-level constants (N, avgdl) are one tiny
aggregate cross-joined back in; Catalyst plans that as a 1-row broadcast.

Repeated terms inside one query are deduplicated (standard bag-of-words
BM25 with query term frequency capped at 1 — the common Lucene default).
Ranking rounds the score to 6 decimals before ordering and breaks ties
by doc id, so results are reproducible across engines and partitionings
(float summation order differs; 1-ulp noise must not flip ranks).

No reference analogue (SURVEY.md §2.12 text family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text


def tokenize_words(c: Column) -> Column:
    """Whitespace word tokens over dedup-normalized text — the same
    normalization the dedup family uses, so retrieval and dedup agree on
    what a 'word' is."""
    return F.split(normalize_text(c), " ")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Top-k documents per query by BM25.

    Returns (query_id, doc id, rank, score) with rank 1..k per query;
    score is rounded to 6 decimals (see module docstring). ``queries``
    is assumed small (it is broadcast twice: into the postings filter and
    into the final ranking)."""
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        tokenize_words(F.col(text_col)).alias("_toks"),
    ).withColumn("_dl", F.size("_toks"))

    # corpus constants: one 1-row aggregate, cross-joined (broadcast)
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )

    qterms = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.explode(F.array_distinct(tokenize_words(F.col(query_col)))).alias("term"),
    )

    # postings restricted to query terms BEFORE the (doc, term) shuffle:
    # the broadcast semi-filter keeps non-matching corpus tokens narrow
    hit = (
        toks.select("_doc", "_dl", F.explode("_toks").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("_doc", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # global df per surviving term — every doc containing the term is in
    # `hit` by construction, so this count is the corpus-wide df
    df_tbl = hit.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))

    scored = (
        hit.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            # ln(1 + x) written literally (not log1p) so the float result
            # is bit-identical to SQL engines' ln(1 + x) oracle mirror
            "_idf",
            F.log(F.lit(1.0) + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)),
        )
        .withColumn(
            "_w",
            F.col("_idf") * F.col("_tf") * (k1 + 1)
            / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))),
        )
        .join(F.broadcast(qterms), "term")
        .groupBy("_qid", "_doc")
        .agg(F.round(F.sum("_w"), 6).alias("score"))
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("score"), F.asc("_doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_doc").alias(id_col),
            "rank",
            "score",
        )
    )
