"""Incremental view maintenance (IVM) over the snapshot change feed.

The point of a change feed at 100 TB is to never rescan the table: a
downstream rollup (counts / sums per group) is kept current by folding
the feed's deltas into the previous materialization. The algebra is the
classic signed-multiset one — each feed row carries a sign
(+1 for ``insert``/``update_postimage``, −1 for ``delete``/
``update_preimage``), so an update contributes (−pre, +post) and the
whole delta is one map-side-combinable aggregation OVER THE FEED ONLY
(the touched fraction, already manifest-pruned by
``IceliteTable.changes``). Merging delta into the previous view is one
key join; groups whose row count reaches zero drop out.

Maintained views use one schema convention so ``grouped_agg`` (the
from-scratch build), ``agg_delta`` and ``apply_agg_delta`` compose:
``group_cols + n_rows + sum_<value_col>...``.

Exactness: ``n_rows`` is integer arithmetic — incremental equals
recompute bit-for-bit. Float sums accumulate in a different order than
a rescan, so compare them with a tolerance (or round), as the driver
oracle does.

No reference analogue (the reference streams rows, it has no
materialized state at all); this is the Spark-native replacement for
"re-run the aggregation flow" (SURVEY.md §2.12 change-feed family).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _view_cols(value_cols: list[str], count_col: str) -> list[str]:
    return [count_col] + [f"sum_{c}" for c in value_cols]


def grouped_agg(
    df: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The from-scratch materialization (used once at bootstrap; after
    that, maintain with deltas)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in value_cols],
    )


def agg_delta(
    changes: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Fold a change feed (``IceliteTable.changes`` output) into one
    signed delta per group — a single aggregation over the feed, partial
    map-side combine and all; the table itself is never touched."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return changes.groupBy(*group_cols).agg(
        F.sum(sign).alias(count_col),
        *[F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in value_cols],
    )


def apply_agg_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge a signed delta into the previous materialization: one
    null-safe full-outer key join (new groups enter via the delta side,
    untouched groups pass through), sums add, and groups whose row count
    hits zero vanish — the incremental result equals ``grouped_agg`` of
    the new state."""
    mcols = _view_cols(value_cols, count_col)
    d = delta.select(
        *[F.col(c).alias(f"_d_{c}") for c in group_cols],
        *[F.col(c).alias(f"_d_{c}") for c in mcols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(g).eqNullSafe(F.col(f"_d_{g}")) for g in group_cols],
    )
    merged = view.join(d, cond, "full_outer").select(
        *[F.coalesce(F.col(g), F.col(f"_d_{g}")).alias(g) for g in group_cols],
        *[
            (
                F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in mcols
        ],
    )
    return merged.filter(F.col(count_col) != 0)


class MaterializedView:
    """A continuously-maintained rollup over an ``IceliteTable``:
    ``group_cols + n_rows + sum_<value_col>...`` materialized as parquet
    plus a replace-safe pointer recording WHICH table snapshot the
    materialization reflects.

    ``refresh()`` folds only the change feed between the recorded and the
    current snapshot (``agg_delta`` + one key join — the 100 TB table is
    never rescanned); the bootstrap (and the fallback when snapshot
    expiry has reaped the recorded base — the retention trade, surfaced
    in the refresh record as ``mode: rebuild``) is one ``grouped_agg``
    over the pinned snapshot. Crash-safe: the data directory for the new
    generation is fully written before the pointer moves, so a reader
    never sees a half-refreshed view and a crashed refresh simply re-runs.

    Layout::

        path/VIEW            -> {"snapshot_id": n, "data": "gen{n}"}
        path/gen{n}/*.parquet
    """

    def __init__(self, spark, path: str, group_cols: list[str],
                 value_cols: list[str], keep_generations: int = 2):
        from . import fsio

        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.value_cols = list(value_cols)
        self.keep_generations = keep_generations
        self._fsio = fsio
        self._ptr = fsio.join(path, "VIEW")

    def pointer(self) -> dict | None:
        return self._fsio.load_json(self._ptr, default=None)

    def read(self) -> DataFrame:
        ptr = self.pointer()
        if ptr is None:
            raise RuntimeError(f"view at {self.path} not materialized yet")
        return self.spark.read.parquet(
            self._fsio.join(self.path, ptr["data"]))

    def refresh(self, table) -> dict:
        """Bring the view up to the table's current snapshot. Returns a
        record: {snapshot_id, from_snapshot, mode: bootstrap|delta|noop|
        rebuild}."""
        fsio = self._fsio
        cur = table.current_snapshot_id()
        ptr = self.pointer()
        if ptr is not None and ptr["snapshot_id"] == cur:
            return {"snapshot_id": cur, "mode": "noop"}
        mode = "bootstrap" if ptr is None else "delta"
        trigger = None
        if ptr is None:
            new = grouped_agg(table.read(snapshot_id=cur),
                              self.group_cols, self.value_cols)
        else:
            from .table import SnapshotExpiredError

            try:
                feed = table.changes(ptr["snapshot_id"], cur)
                delta = agg_delta(feed, self.group_cols, self.value_cols)
                new = apply_agg_delta(self.read(), delta,
                                      self.group_cols, self.value_cols)
            except SnapshotExpiredError as e:
                # recorded base snapshot expired (retention trade): one
                # full rebuild re-anchors the view; later refreshes are
                # incremental again. ONLY this typed error triggers the
                # rebuild — any other failure in the delta path is a real
                # bug or transient fault and must propagate, not silently
                # become a full table rescan on every refresh (ADVICE r5).
                mode = "rebuild"
                trigger = str(e)
                new = grouped_agg(table.read(snapshot_id=cur),
                                  self.group_cols, self.value_cols)
        gen = f"gen{cur}"
        out_dir = fsio.join(self.path, gen)
        new.write.mode("overwrite").parquet(out_dir)
        fsio.publish_json(self._ptr, {"snapshot_id": cur, "data": gen})
        self._expire_generations(keep=[gen])
        rec = {"snapshot_id": cur,
               "from_snapshot": None if ptr is None else ptr["snapshot_id"],
               "mode": mode}
        if trigger is not None:
            rec["trigger"] = trigger
        return rec

    def _expire_generations(self, keep: list[str]) -> None:
        fsio = self._fsio
        gens = sorted(
            (int(e[3:]) for e in fsio.listdir(self.path)
             if e.startswith("gen") and e[3:].isdigit()),
            reverse=True,
        )
        for g in gens[max(self.keep_generations, 1):]:
            name = f"gen{g}"
            if name not in keep:
                fsio.rmtree(fsio.join(self.path, name))
