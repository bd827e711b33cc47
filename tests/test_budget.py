"""Distributed running total / token-budget selection: the two-phase
range-partitioned prefix sum must equal the naive single-window prefix
sum at any partition count, and stay deterministic across evaluations
(the ranged pass is computed twice: totals job + final join)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from nifi_processors_spark.operators import budget


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(101)) + 1).alias("tokens"),
    )


def _naive(df):
    w = (
        Window.orderBy(F.col("tokens").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return {
        (r["doc_id"], r["cum"])
        for r in df.withColumn("cum", F.sum("tokens").over(w).cast("long")).collect()
    }


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_running_total_matches_naive(rows, parts):
    got = {
        (r["doc_id"], r["running_total"])
        for r in budget.with_running_total(
            rows, [F.col("tokens").desc(), F.col("doc_id")], "tokens",
            num_partitions=parts,
        ).collect()
    }
    assert got == _naive(rows)


def test_running_total_deterministic_across_evals(rows):
    a = budget.with_running_total(
        rows, [F.col("tokens").desc(), F.col("doc_id")], "tokens", num_partitions=16
    )
    r1 = sorted((r["doc_id"], r["running_total"]) for r in a.collect())
    r2 = sorted((r["doc_id"], r["running_total"]) for r in a.collect())
    assert r1 == r2


def test_token_budget_select_greedy_prefix(rows):
    total = rows.agg(F.sum("tokens")).first()[0]
    kept = budget.token_budget_select(
        rows, "tokens", total // 3, [F.col("tokens").desc(), F.col("doc_id")],
        num_partitions=8,
    ).collect()
    assert 0 < len(kept) < 500
    assert max(r["cum_tokens"] for r in kept) <= total // 3
    # greedy prefix: the kept set is exactly the naive prefix within budget
    naive_kept = {d for d, c in _naive(rows) if c <= total // 3}
    assert {r["doc_id"] for r in kept} == naive_kept


def test_running_total_no_global_single_partition_window(rows):
    """The plan must not contain a partition-less window (the scale-killer
    this operator exists to avoid): every Window node carries the _rt_pid
    partition key."""
    df = budget.with_running_total(
        rows, [F.col("tokens").desc(), F.col("doc_id")], "tokens", num_partitions=8
    )
    plan = df._jdf.queryExecution().toString()
    import re

    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 300]
        assert "_rt_pid" in seg, f"partition-less window in plan: {seg[:120]}"


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("doc_id"), F.lit(1).alias("tokens"))
    out = budget.with_running_total(df, [F.col("doc_id")], "tokens")
    assert out.count() == 0
