"""Round-6 correctness fixes (ADVICE r5):

  * outbox torn-publish repair — a stale same-frm segment left by a crash
    between segment write and pointer move is deleted on the next
    publish, so the feed never emits a range twice;
  * MaterializedView.refresh rebuilds ONLY on SnapshotExpiredError — a
    genuine delta-path bug propagates instead of silently becoming a
    full rescan per refresh;
  * scan pruning resolves filter columns by FIELD ID to each file's
    physical column name — a rename chain that reuses a name cannot make
    stats pruning consult the wrong field's range;
  * _key_buckets falls back (no pruning) when a filter literal does not
    fit the key schema, matching the unpruned path's cast semantics.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_processors_spark.plans import fsio
from nifi_processors_spark.plans.ivm import MaterializedView
from nifi_processors_spark.plans.outbox import ChangeOutbox
from nifi_processors_spark.plans.table import IceliteTable, SnapshotExpiredError

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
])


def _chset(spark, rows, seq):
    df = spark.createDataFrame(rows, "k long, v long, op string")
    return df.select("k", "v", "op", F.lit(seq).alias("commit_seq"),
                     F.col("k").alias("event_seq"))


@pytest.fixture()
def tbl(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"],
                            n_buckets=4)
    t.merge(_chset(spark, [(k, k * 10, "U") for k in range(20)], 1))
    return t


def test_snapshot_expired_is_typed(tbl):
    with pytest.raises(SnapshotExpiredError):
        tbl.snapshot(99)


def test_outbox_torn_segment_repaired(spark, tbl, tmp_path):
    ob = ChangeOutbox(spark, str(tmp_path / "ob"))
    ob.publish(tbl)  # seg_0_1 (from birth), pointer -> 1
    tbl.merge(_chset(spark, [(k, k * 10 + 1, "U") for k in range(5)], 2))
    ob.publish(tbl)  # seg_1_2, pointer -> 2
    # simulate the crash ordering: segment written but pointer NOT moved
    fsio.publish_json(ob._ptr, {"snapshot_id": 1})
    assert "seg_1_2" in ob.segments()
    # table advances before the next publish
    tbl.merge(_chset(spark, [(k, k * 10 + 2, "U") for k in range(3)], 3))
    rec = ob.publish(tbl)
    assert rec["mode"] == "publish" and rec["from_snapshot"] == 1
    segs = ob.segments()
    assert "seg_1_3" in segs and "seg_1_2" not in segs, (
        "stale overlapping segment must be deleted, not unioned")
    # replay contract still holds: base(1) - deleted/preimage keys
    # + insert/postimage rows == state(3)
    feed = ob.read(since_snapshot=1)
    spans = {(r["_from_snapshot"], r["_to_snapshot"])
             for r in feed.select("_from_snapshot", "_to_snapshot").distinct().collect()}
    assert spans == {(1, 3)}


def test_view_rebuilds_only_on_expiry(spark, tbl, tmp_path):
    view = MaterializedView(spark, str(tmp_path / "view"), ["k"], ["v"])
    view.refresh(tbl)  # bootstrap at the current snapshot
    tbl.merge(_chset(spark, [(0, 7, "U")], 2))

    class Broken:
        """Table whose delta path is broken — refresh must PROPAGATE."""

        def current_snapshot_id(self):
            return tbl.current_snapshot_id()

        def changes(self, a, b):
            raise RuntimeError("genuine bug in changes()")

        def read(self, snapshot_id=None):
            return tbl.read(snapshot_id)

    with pytest.raises(RuntimeError, match="genuine bug"):
        view.refresh(Broken())


def test_view_rebuild_on_expired_base(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t2"), SCHEMA, key=["k"],
                            n_buckets=2)
    t.merge(_chset(spark, [(k, k, "U") for k in range(8)], 1))
    view = MaterializedView(spark, str(tmp_path / "v2"), ["k"], ["v"])
    view.refresh(t)  # bootstrap at snapshot 1
    t.merge(_chset(spark, [(0, 100, "U")], 2))
    t.merge(_chset(spark, [(1, 200, "U")], 3))
    t.expire_snapshots(keep_last=1)  # reaps the view's base snapshot
    rec = view.refresh(t)
    assert rec["mode"] == "rebuild" and "trigger" in rec
    got = {r["k"]: r["sum_v"] for r in view.read().collect()}
    assert got[0] == 100.0 and got[1] == 200.0


def test_scan_prunes_by_field_id_after_rename_reuse(spark, tmp_path):
    """rename a->c then b->a: a filter on current 'a' (originally field b)
    must consult the OLD files' stats for physical 'b', not physical 'a'
    — otherwise files holding matching rows are silently skipped."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
    ])
    t = IceliteTable.create(spark, str(tmp_path / "t3"), schema, key=["k"],
                            n_buckets=2)
    rows = [(k, k % 100, 1000 + k, "U") for k in range(50)]
    df = spark.createDataFrame(rows, "k long, a long, b long, op string")
    t.merge(df.select("k", "a", "b", "op", F.lit(1).alias("commit_seq"),
                      F.col("k").alias("event_seq")))
    t.alter({"a": "c"}, [])
    t.alter({"b": "a"}, [])
    # current 'a' is original b: values 1000..1049, far outside the old
    # physical-'a' range [0, 99] the buggy probe consulted
    got = sorted(r["k"] for r in t.scan([("a", ">=", 1040)]).collect())
    assert got == list(range(40, 50))
    rep = t.scan_report([("a", ">=", 1040)])
    assert rep["files_kept"] >= 1


def test_key_bucket_literal_type_mismatch_falls_back(tbl):
    # long key probed with a string literal: planning must not raise;
    # results follow the unpruned path's cast semantics
    got = [r["k"] for r in tbl.scan([("k", "=", "7")]).collect()]
    assert got == [7]
