"""Skew-aware per-repo analytics — the explicit-salting patterns the north
rule mandates for hot-repo skew (BASELINE.json.north_rule: "explicit
salting/repartition for hot-repo skew").

A hot repo (one repo holding a large fraction of all rows — the generator
plants 3 of them, FIXTURES.md §1) breaks naive per-repo operations: one
reducer gets the whole repo. Two patterns fix the two operation shapes:

  * **aggregation**: two-phase salted agg — partial agg on
    (repo, salt(path)) spreads the hot repo over N reducers, final agg on
    repo combines N partials. (Catalyst's map-side partial aggregation
    already handles plain sum/count; the explicit form is for aggregations
    whose partials are expensive or memory-heavy, e.g. collect-like or
    top-k states.)
  * **per-repo top-k**: partial top-k per (repo, salt) — each salt bucket
    keeps only k candidates — then final top-k per repo over N*k rows.
    A naive window over repo would sort the hot repo on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import salt_column


def repo_file_stats(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-repo file count / byte total via explicit two-phase salted agg."""
    partial = (
        df.withColumn("_salt", salt_column(n_salts, "path"))
        .groupBy("repo", "_salt")
        .agg(
            F.count("*").alias("_files"),
            F.sum(F.length("content")).alias("_bytes"),
            F.approx_count_distinct("lang").alias("_langs"),
        )
    )
    return partial.groupBy("repo").agg(
        F.sum("_files").alias("n_files"),
        F.sum("_bytes").alias("total_bytes"),
        F.max("_langs").alias("approx_langs"),
    )


def top_files_per_repo(
    df: DataFrame, k: int = 5, order_col: str = "_commit_seq", n_salts: int = 16
) -> DataFrame:
    """Top-k files per repo by ``order_col`` (e.g. most recently changed),
    skew-safe: partial top-k per (repo, salt) then final top-k per repo.
    The hot repo is sorted in n_salts independent k-sized heaps, never on
    one reducer."""
    w_partial = Window.partitionBy("repo", "_salt").orderBy(
        F.col(order_col).desc(), F.col("path")
    )
    w_final = Window.partitionBy("repo").orderBy(F.col(order_col).desc(), F.col("path"))
    return (
        df.withColumn("_salt", salt_column(n_salts, "path"))
        .withColumn("_prn", F.row_number().over(w_partial))
        .filter(F.col("_prn") <= k)  # <= n_salts * k rows per repo survive
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .drop("_salt", "_prn")
    )
