"""As-of join unit semantics (union+carry, one shuffle)."""

from nifi_processors_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 10)],
        "id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 8, 100.0), ("a", 15, 200.0), ("b", 99, 300.0)],
        "k string, ts long, v double",
    )
    out = asof_join(left, right, on="ts", by=["k"], right_cols=["v"])
    got = {r["id"]: r["v_right"] for r in out.collect()}
    # id1 ts10 -> right ts8 (100); id2 ts20 -> ts15 (200); id3 ts5 -> none;
    # id4 k=b ts10 -> right ts99 is later -> none
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}
    assert out.count() == left.count()


def test_asof_equal_ts_and_strict(spark):
    left = spark.createDataFrame([(1, "a", 10)], "id long, k string, ts long")
    right = spark.createDataFrame([("a", 10, 1.5)], "k string, ts long, v double")
    non_strict = asof_join(left, right, on="ts", by=["k"], right_cols=["v"]).first()
    assert non_strict["v_right"] == 1.5  # <= matches equal ts
    strict = asof_join(left, right, on="ts", by=["k"], right_cols=["v"], strict=True).first()
    assert strict["v_right"] is None  # < excludes equal ts


def test_asof_one_shuffle(spark):
    left = spark.createDataFrame([(1, "a", 10)], "id long, k string, ts long")
    right = spark.createDataFrame([("a", 8, 1.0)], "k string, ts long, v double")
    plan = asof_join(left, right, on="ts", by=["k"], right_cols=["v"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
