"""Continuously-maintained materialized views: MaterializedView folds
only the change feed between its recorded base and the current snapshot
(bootstrap/rebuild scan once), and ChangeApplier refreshes configured
views after every applied epoch — incremental equals recompute."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_processors_spark.plans.ivm import MaterializedView, grouped_agg
from nifi_processors_spark.plans.table import IceliteTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("grp", T.StringType()),
    T.StructField("v", T.LongType()),
])


def _chset(spark, rows, seq):
    df = spark.createDataFrame(rows, "k long, grp string, v long, op string")
    return df.select("k", "grp", "v", "op", F.lit(seq).alias("commit_seq"),
                     F.col("k").alias("event_seq"))


def _recompute(t):
    return {(r["grp"]): (r["n_rows"], r["sum_v"]) for r in
            grouped_agg(t.read(), ["grp"], ["v"]).collect()}


def _view_state(mv):
    return {(r["grp"]): (r["n_rows"], r["sum_v"]) for r in mv.read().collect()}


def test_view_bootstrap_delta_noop_and_group_drop(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"],
                            n_buckets=4)
    t.merge(_chset(spark, [(1, "a", 10, "U"), (2, "a", 5, "U"),
                           (3, "b", 7, "U")], 1))
    mv = MaterializedView(spark, str(tmp_path / "view"), ["grp"], ["v"])
    with pytest.raises(RuntimeError, match="not materialized"):
        mv.read()
    rec = mv.refresh(t)
    assert rec["mode"] == "bootstrap"
    assert _view_state(mv) == _recompute(t) == {"a": (2, 15), "b": (1, 7)}
    assert mv.refresh(t)["mode"] == "noop"
    # update + delete + new group, folded incrementally (never a rescan)
    t.merge(_chset(spark, [(2, "a", 9, "U"), (3, "b", 0, "D"),
                           (4, "c", 100, "U")], 2))
    rec = mv.refresh(t)
    assert rec["mode"] == "delta" and rec["from_snapshot"] == 1
    assert _view_state(mv) == _recompute(t) == {"a": (2, 19), "c": (1, 100)}
    # group b reached zero rows and dropped out entirely
    assert "b" not in _view_state(mv)


def test_view_rebuild_after_base_expiry(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t2"), SCHEMA, key=["k"],
                            n_buckets=2)
    t.merge(_chset(spark, [(1, "a", 1, "U")], 1))
    mv = MaterializedView(spark, str(tmp_path / "v2"), ["grp"], ["v"])
    mv.refresh(t)
    t.merge(_chset(spark, [(2, "b", 2, "U")], 2))
    t.merge(_chset(spark, [(3, "b", 3, "U")], 3))
    t.expire_snapshots(keep_last=1)  # reaps the view's base snapshot
    rec = mv.refresh(t)
    assert rec["mode"] == "rebuild"
    assert _view_state(mv) == _recompute(t)
    # incremental again afterwards
    t.merge(_chset(spark, [(4, "a", 4, "U")], 4))
    assert mv.refresh(t)["mode"] == "delta"
    assert _view_state(mv) == _recompute(t)


def test_applier_maintains_views_per_epoch(spark, tmp_path):
    from nifi_processors_spark.operators.apply import ChangeApplier
    from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log

    cl = str(tmp_path / "cl")
    write_change_log(spark, GenLogConfig(n_events=3000, n_epochs=3), cl)
    ap = ChangeApplier(
        spark, str(tmp_path / "tbl"), cl, str(tmp_path / "st"), n_buckets=4,
        views={"by_lang": (["lang"], [])},
    )
    recs = ap.run()
    assert len(recs) == 3
    mv = ap.view("by_lang")
    got = {r["lang"]: r["n_rows"] for r in mv.read().collect()}
    want = {r["lang"]: r["n"] for r in
            ap.state().groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == want and got
    # the view reflects the table's current snapshot and re-runs are noops
    t = IceliteTable(spark, str(tmp_path / "tbl"))
    assert mv.pointer()["snapshot_id"] == t.current_snapshot_id()
    assert ap.refresh_views()["by_lang"]["mode"] == "noop"
    # old generations are reaped
    import os
    gens = [e for e in os.listdir(str(tmp_path / "st" / "views" / "by_lang"))
            if e.startswith("gen")]
    assert len(gens) <= 2
