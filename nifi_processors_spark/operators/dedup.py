"""Last-writer-wins dedup + skew-aware repartitioning.

The reference processes records strictly in file order — order is implicit
in its line iterator (reference: ExecuteRuleEngine.java:438-444) and there
is no dedup at all. The CDC target needs an *order-insensitive* reduction:
for each key ``(repo, path)`` keep only the event with the greatest
``(commit_seq, event_seq)`` — so applying epochs in any order, or replaying
one twice, converges to the same state (BASELINE.json.north_star).

Implementation notes (scale):
  * ``max_by`` keyed by the LWW order is one hash shuffle on the key with
    map-side partial aggregation — upstream tasks pre-collapse to one
    candidate row per key, so the exchange moves ~|keys| rows, not
    |events| (r06; the former row_number window shuffled every event and
    sorted each partition).
  * For hot-repo skew the *window* itself is safe (partition = full key,
    and (repo, path) has high cardinality even for hot repos); skew shows
    up in the merge join, handled by `salted_repartition` + AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY = ["repo", "path"]
ORDER = ["commit_seq", "event_seq"]


def lww_dedup(
    changes: DataFrame, key: list[str] | None = None, order: list[str] | None = None
) -> DataFrame:
    """One winning event per key: the row with max (commit_seq, event_seq).

    Ties are impossible by construction ((commit_seq, event_seq) is unique
    in the envelope), so the winner is deterministic.

    Implemented as ``max_by(struct(row), struct(order))`` — a hash
    aggregation, not a window: the partial (map-side) aggregate collapses
    each scan task's rows to one candidate per key BEFORE the exchange, so
    the shuffle carries ~|keys| rows instead of |events| (66x fewer on the
    sf events table), and no per-partition sort is needed at all (guide
    §2.3 "aggregate before you shuffle"). Winner semantics are identical
    to the previous row_number-desc window: struct comparison orders by
    the order columns left-to-right, and a null order field compares
    smallest exactly like the window's DESC NULLS LAST."""
    key = key or KEY
    order = order or ORDER
    cols = changes.columns
    win = F.max_by(
        F.struct(*[F.col(c) for c in cols]),
        F.struct(*[F.col(c) for c in order]),
    ).alias("_win")
    return (
        changes.groupBy(*[F.col(c) for c in key])
        .agg(win)
        .select(*[F.col(f"_win.{c}").alias(c) for c in cols])
    )


def salt_column(n_salts: int, *cols: str) -> Column:
    """Deterministic salt bucket in [0, n_salts) from non-key columns.

    Used to split a hot key-prefix (e.g. a hot repo) across ``n_salts``
    shuffle partitions before heavy per-repo work, per the explicit
    salting mandate in BASELINE.json.north_rule.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_repartition(df: DataFrame, hot_prefix_col: str, n_salts: int, fine_col: str) -> DataFrame:
    """Repartition by (hot_prefix, salt(fine_col)) so one hot repo spreads
    over ``n_salts`` partitions instead of hot-spotting a single reducer.
    """
    return df.repartition(F.col(hot_prefix_col), salt_column(n_salts, fine_col))
