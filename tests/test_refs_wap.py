"""Snapshot rollback, named refs (tags), and write-audit-publish
staging: rollback is a new commit sharing immutable files; refs pin
snapshots for reproducible reads; merge(publish=False) stages an epoch
no reader can observe until publish_snapshot fast-forwards VERSION."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_processors_spark.plans.table import IceliteTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
])


def _chset(spark, rows, seq):
    df = spark.createDataFrame(rows, "k long, v long, op string")
    return df.select("k", "v", "op", F.lit(seq).alias("commit_seq"),
                     F.col("k").alias("event_seq"))


def _state(t, sid=None):
    return sorted((r["k"], r["v"]) for r in t.read(snapshot_id=sid).collect())


@pytest.fixture()
def tbl(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"],
                            n_buckets=4)
    t.merge(_chset(spark, [(1, 10, "U"), (2, 20, "U")], 1))   # s1
    t.merge(_chset(spark, [(2, 99, "U"), (3, 30, "U")], 2))   # s2
    return t


def test_rollback_restores_state_as_new_commit(tbl):
    assert _state(tbl) == [(1, 10), (2, 99), (3, 30)]
    s3 = tbl.rollback(1)
    assert s3 == 3 and tbl.current_snapshot_id() == 3
    assert _state(tbl) == [(1, 10), (2, 20)]          # s1 state restored
    assert _state(tbl, 2) == [(1, 10), (2, 99), (3, 30)]  # history intact
    snap = tbl.snapshot()
    assert snap["parent"] == 2 and snap["lineage"]["op"] == "rollback"
    # the change feed sees the rollback as ordinary changes
    ch = {(r["k"], r["_change_type"]) for r in tbl.changes(2, 3).collect()}
    assert (3, "delete") in ch
    # merging after a rollback continues normally
    tbl.merge(_chset(spark=tbl.spark, rows=[(4, 40, "U")], seq=3))
    assert _state(tbl) == [(1, 10), (2, 20), (4, 40)]
    # rollback to the current snapshot is a no-op
    assert tbl.rollback(tbl.current_snapshot_id()) == tbl.current_snapshot_id()


def test_refs_tag_resolve_drop(tbl):
    sid = tbl.set_ref("v1.0", 1)
    assert sid == 1
    tbl.set_ref("latest")  # defaults to current
    assert tbl.refs() == {"v1.0": 1, "latest": 2}
    assert _state(tbl, tbl.resolve_ref("v1.0")) == [(1, 10), (2, 20)]
    tbl.drop_ref("v1.0")
    assert "v1.0" not in tbl.refs()
    with pytest.raises(KeyError, match="unknown ref"):
        tbl.resolve_ref("v1.0")
    with pytest.raises(Exception):
        tbl.set_ref("bad", 999)  # nonexistent snapshot refused


def test_wap_stage_audit_publish(tbl, spark):
    staged, _ = tbl.merge(_chset(spark, [(9, 90, "U")], 3), publish=False)
    assert staged == 3
    # no reader observes the staged epoch
    assert tbl.current_snapshot_id() == 2
    assert _state(tbl) == [(1, 10), (2, 99), (3, 30)]
    # ...but the audit can read it by id
    assert (9, 90) in _state(tbl, staged)
    tbl.publish_snapshot(staged)
    assert tbl.current_snapshot_id() == 3
    assert (9, 90) in _state(tbl)


def test_wap_abort_discards_stage(tbl, spark):
    staged, _ = tbl.merge(_chset(spark, [(9, -1, "U")], 3), publish=False)
    tbl.abort_staged(staged)
    assert tbl.current_snapshot_id() == 2
    with pytest.raises(Exception):
        tbl.snapshot(staged)  # metadata gone
    # the next (published) merge reuses the slot cleanly
    sid, _ = tbl.merge(_chset(spark, [(9, 91, "U")], 4))
    assert sid == 3 and (9, 91) in _state(tbl)


def test_wap_guards(tbl, spark):
    with pytest.raises(ValueError, match="does not descend"):
        tbl.publish_snapshot(1)  # backwards publish refused
    with pytest.raises(ValueError, match="is published"):
        tbl.abort_staged(1)
    # staged MOR epoch: same contract
    staged, _ = tbl.merge_mor(_chset(spark, [(7, 70, "U")], 3), publish=False)
    assert tbl.current_snapshot_id() == 2
    tbl.publish_snapshot(staged)
    assert (7, 70) in _state(tbl)
