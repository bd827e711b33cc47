"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN. The scale-correct composition (no range
explosion, no per-group pandas) is the union-and-carry trick:

    tag left/right -> unionByName -> ONE shuffle on (key) with a sort on
    (key, ts, right-first) -> last_value(right cols, ignorenulls) carries
    the latest right row forward -> keep left rows.

Cost: one hash exchange + one sort — the same bill as a regular sort-merge
join, regardless of how many right rows precede each left row (a naive
range join would be quadratic in the worst case; `pd.merge_asof` via
applyInPandas would put every group through Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (``<`` when strict) and equal ``by`` keys.

    Returns all left columns + ``<right_col><suffix>`` columns (null when
    no prior right row exists). ``on`` must be orderable (timestamp/long).
    """
    lcols = left.columns
    l = left.select(*lcols).withColumn("_side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *by,
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))

    # right rows sort before left rows at equal ts => non-strict (<=);
    # strict mode sorts right rows after equal-ts left rows
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u
    for c in right_cols:
        carried = carried.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("_side") == 1).drop("_side")
