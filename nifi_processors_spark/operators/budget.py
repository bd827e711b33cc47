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
    computed without a global single-partition window."""
    parts = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(parts, *order_by).withColumn(
        "_rt_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_rt_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(out_col, F.sum(value_col).over(w))
    # one row per partition -> driver; prefix there; broadcast back
    totals = (
        local.groupBy("_rt_pid").agg(F.sum(value_col).alias("_rt_sum")).collect()
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
    it in the order)."""
    cum = with_running_total(df, order_by, value_col, out_col, num_partitions)
    return cum.filter(F.col(out_col) <= budget)
