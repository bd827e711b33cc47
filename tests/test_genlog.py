"""Generator determinism + shape (SURVEY.md §5.2 item 1, FIXTURES.md §2)."""

import pyspark.sql.functions as F

from nifi_processors_spark.sources.genlog import GenLogConfig, generate_change_log

CFG = GenLogConfig(n_events=2000, n_epochs=4)


def test_shape_and_uniqueness(spark):
    df = generate_change_log(spark, CFG)
    assert df.columns == [
        "repo", "path", "op", "commit", "commit_seq", "event_seq", "epoch", "payload_json",
    ]
    n = df.count()
    assert n == CFG.n_events
    # (commit_seq, event_seq) is the unique LWW total order
    assert df.select("commit_seq", "event_seq").distinct().count() == n
    ops = {r["op"] for r in df.select("op").distinct().collect()}
    assert ops == {"I", "U", "D"}
    # deletes carry null payload, upserts carry JSON
    assert df.filter((F.col("op") == "D") & F.col("payload_json").isNotNull()).count() == 0
    assert df.filter((F.col("op") != "D") & F.col("payload_json").isNull()).count() == 0


def test_determinism_across_parallelism(spark):
    a = generate_change_log(spark, CFG).repartition(1).orderBy("commit_seq", "event_seq")
    b = (
        generate_change_log(spark, CFG)
        .repartition(7)
        .orderBy("commit_seq", "event_seq")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_skew_fixture_present(spark):
    df = generate_change_log(spark, CFG)
    hot = df.filter(F.col("repo").startswith("hot/")).count()
    # ~20% of keys are hot -> a visible but not dominant fraction of events
    assert 0.05 * CFG.n_events < hot < 0.5 * CFG.n_events


def test_late_events_cross_epochs(spark):
    """Some events land in a later epoch than commit order (LWW stressor)."""
    df = generate_change_log(spark, CFG)
    # max commit_seq of epoch e should exceed min commit_seq of epoch e+1
    rows = df.groupBy("epoch").agg(
        F.min("commit_seq").alias("lo"), F.max("commit_seq").alias("hi")
    ).orderBy("epoch").collect()
    overlaps = sum(1 for a, b in zip(rows, rows[1:]) if a["hi"] > b["lo"])
    assert overlaps >= 1


def test_schema_evolution_switch(spark):
    cfg = GenLogConfig(n_events=2000, n_epochs=4, evolve_at_epoch=2)
    df = generate_change_log(spark, cfg)
    v1 = df.filter((F.col("epoch") < 2) & (F.col("op") != "D")).select("payload_json").first()[0]
    v2 = df.filter((F.col("epoch") >= 2) & (F.col("op") != "D")).select("payload_json").first()[0]
    assert '"lang"' in v1 and '"size_bytes"' not in v1
    assert '"language"' in v2 and '"size_bytes"' in v2
