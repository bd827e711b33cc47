"""Deterministic sampling and corpus mixing for training-data pipelines.

A 100 TB curation run cannot use ``df.sample``: its membership is a
per-partition RNG draw, so a retry, a repartition, or an AQE re-plan
changes WHICH rows survive — non-reproducible corpora and broken
incremental joins against previously-sampled outputs. These operators
decide membership from a sha256-derived hash of a stable row key, so a
row's fate is a pure function of (key, seed):

  * identical across retries, partitionings, cluster sizes and engines
    (DuckDB mirror: ``('0x' || substring(sha256(k), 1, 15))::UBIGINT``);
  * selection compares INTEGERS — keep iff ``hash60 < floor(f * 2^60)``
    — no float-boundary ambiguity between engines;
  * consistent across tables: sampling two tables by the same key keeps
    the same entities in both (the property "salted user holdout" needs).

Scale shape: every operator here is a narrow filter/union — zero
shuffles, zero sampling passes, zero driver state. Seeds namespace
independent samples (``seed=1`` vs ``seed=2`` are independent draws).

No reference analogue (the reference routes rows by rule predicates,
never statistically); required by the builder brief's training-data
surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_60 = 1 << 60


def sample_hash(key: Column, seed: int = 0) -> Column:
    """Uniform 60-bit non-negative hash of (key, seed) — same sha256-
    derived family as operators/fuzzy.hash60, so any engine with sha256
    reproduces membership bit-for-bit. DuckDB mirror:
    ``('0x' || substring(sha256(k::VARCHAR || '#s<seed>'), 1, 15))::UBIGINT::BIGINT``."""
    s = F.concat(key.cast("string"), F.lit(f"#s{seed}"))
    return F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("long")


def fraction_threshold(fraction: float) -> int:
    """The integer cut for a sampling rate: keep iff hash60 < this.
    Exposed so SQL oracles embed the SAME integer literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"sampling fraction must be in [0, 1], got {fraction}")
    return int(fraction * TWO_60)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash. A pure
    narrow filter — Catalyst pushes it into the scan."""
    return df.filter(
        sample_hash(F.col(key_col), seed) < F.lit(fraction_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample English, keep all of a
    rare language): ``fractions`` maps stratum value -> rate; strata not
    listed get ``default``. One narrow filter — the per-stratum cut is a
    CASE expression, never a per-stratum job or a count pass."""
    cut = reduce(
        lambda acc, kv: acc.when(
            F.col(strata_col) == F.lit(kv[0]), F.lit(fraction_threshold(kv[1]))
        ),
        fractions.items(),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(fraction_threshold(default)))
    return df.filter(sample_hash(F.col(key_col), seed) < cut)


def mix_corpora(
    sources: list[tuple[DataFrame, str, float]],
    key_col: str,
    seed: int = 0,
    source_col: str = "_source",
) -> DataFrame:
    """Weighted corpus mixture — the data-mixing step of a training run:
    each (df, name, rate) contributes a deterministic ``rate``-sample
    tagged with its source name; rows are combined by name so sources
    with extra columns don't misalign (missing columns null-backfill).
    Rates are absolute sampling fractions; to hit target PROPORTIONS,
    compute rates from corpus sizes upstream (this operator stays a
    zero-shuffle union of narrow filters — no count pass)."""
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    parts = [
        hash_sample(df, key_col, rate, seed).withColumn(source_col, F.lit(name))
        for df, name, rate in sources
    ]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
