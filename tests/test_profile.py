"""Table profiling: one-pass per-column stats; HLL mode within tolerance
of exact; exact mode matched bit-for-bit vs DuckDB in the driver
contract (profile_events)."""

import pyspark.sql.functions as F

from nifi_processors_spark.operators import profile


def test_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (2, None, 2.5), (3, "a", None)],
        "k long, s string, v double",
    )
    got = {r["col_name"]: r for r in profile.profile_table(df, exact=True).collect()}
    assert set(got) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in got.values())
    k = got["k"]
    assert (k["n_nulls"], k["n_distinct"], k["min_value"], k["max_value"]) == (0, 3, "1", "3")
    s = got["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_value"], s["max_value"]) == (1, 2, "a", "b")
    v = got["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (2, 2)


def test_profile_hll_within_tolerance(spark):
    df = spark.range(20_000).select(
        F.col("id").alias("k"), F.pmod(F.col("id"), F.lit(1234)).alias("m")
    )
    got = {r["col_name"]: r for r in profile.profile_table(df, rsd=0.02).collect()}
    assert abs(got["k"]["n_distinct"] - 20_000) / 20_000 < 0.1
    assert abs(got["m"]["n_distinct"] - 1234) / 1234 < 0.1


def test_profile_single_job_plan(spark):
    """The HLL profile must stay ONE aggregation (no Expand, no per-column
    jobs) — that is the whole point at 100 TB."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"), F.lit("x").alias("c")
    )
    plan = profile.profile_table(df)._jdf.queryExecution().toString()
    assert "Expand" not in plan
