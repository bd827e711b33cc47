"""Distributed running totals + token-budget selection.

A corpus-curation pipeline ends with "take documents in priority order
until the token budget is spent" — an ordered prefix sum. The naive
Spark spelling (``Window.orderBy`` with no partition key) funnels EVERY
row through one task: a scale-killer at 100 TB. This module implements
the classic two-phase distributed prefix sum instead:

  1. ``repartitionByRange`` on the priority order — partition i holds a
     contiguous slice of the global order (ascending partition ids follow
     the sort direction given).
  2. per-partition prefix sums with an ordinary partitioned window.
  3. per-partition totals (one row per partition) to the driver, prefix
     them there, broadcast the offsets back, add.

Driver traffic is O(num_partitions) rows — the same bounded pattern as
the CDC per-bucket stats — and every heavy step is a partitioned window
or a narrow map. The order must be TOTAL (break ties, e.g. by id):
equal keys land in one partition under range partitioning, so a
non-total order would make the prefix nondeterministic.

Determinism barrier: ``repartitionByRange`` derives its boundaries from
a SAMPLE whose seed depends on the RDD id, so two executions of the same
plan can split boundary rows differently. The totals job (step 3) and
the output job would then disagree about which partition a row is in —
silently wrong prefix sums. The ranged pass is therefore materialized
ONCE with ``localCheckpoint(eager=True)`` before anything reads it: both
jobs see the same frozen blocks, and any executor loss after that point
fails the job LOUDLY (truncated lineage cannot recompute) instead of
recomputing with new boundaries. Same pattern as the connected-components
iteration in ``operators/fuzzy.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_running_total(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all rows at-or-before
    this row in the TOTAL order ``order_by`` (inclusive prefix sum),
    computed without a global single-partition window.

    ``value_col`` must be non-negative (checked in the totals job and
    enforced loudly) when used for budget cuts — see
    ``token_budget_select``."""
    parts = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # materialize the sampled range partitioning ONCE (see module doc:
    # repartitionByRange boundaries are not deterministic across
    # executions, and two jobs read this frame)
    ranged = (
        df.repartitionByRange(parts, *order_by)
        .withColumn("_rt_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_rt_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(out_col, F.sum(value_col).over(w))
    # one row per partition -> driver; prefix there; broadcast back (the
    # min rides along so negative values fail loudly, not silently)
    totals = (
        ranged.groupBy("_rt_pid")
        .agg(F.sum(value_col).alias("_rt_sum"), F.min(value_col).alias("_rt_min"))
        .collect()
    )
    neg = [r for r in totals if r["_rt_min"] is not None and r["_rt_min"] < 0]
    if neg:
        raise ValueError(
            f"with_running_total: {value_col} has negative values "
            f"(min {min(r['_rt_min'] for r in neg)}); prefix-budget semantics "
            "require non-negative values"
        )
    offsets, acc = [], 0
    for r in sorted(totals, key=lambda r: r["_rt_pid"]):
        offsets.append((r["_rt_pid"], acc))
        acc += r["_rt_sum"] or 0
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    off_df = df.sparkSession.createDataFrame(offsets, "_rt_pid int, _rt_off long")
    return (
        local.join(F.broadcast(off_df), "_rt_pid")
        .withColumn(out_col, (F.col(out_col) + F.col("_rt_off")).cast("long"))
        .drop("_rt_pid", "_rt_off")
    )


def token_budget_select(
    df: DataFrame,
    value_col: str,
    budget: int,
    order_by: list[Column],
    out_col: str = "cum_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Keep rows, in ``order_by`` priority, while the inclusive running
    sum of ``value_col`` stays within ``budget`` (greedy prefix — the
    first row that would overflow is dropped, along with everything after
    it in the order). ``value_col`` must be non-negative (enforced by
    ``with_running_total``): with a negative value, a later row's running
    total could dip back under the budget and re-enter after an overflow,
    which is not a prefix."""
    cum = with_running_total(df, order_by, value_col, out_col, num_partitions)
    return cum.filter(F.col(out_col) <= budget)
