"""Change-feed outbox (plans/outbox.py): segment-by-segment replay over
the base reconstructs the final state exactly, publishes are idempotent,
maintenance-only ranges advance the pointer without segments, and the
applier/stream integration publishes per epoch."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.plans.outbox import ChangeOutbox
from nifi_processors_spark.plans.table import IceliteTable
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log

KEY = ["repo", "path"]


def _fingerprint(df):
    return {
        tuple(r[k] for k in KEY): r["sha"]
        for r in df.select(*KEY, F.sha2("content", 256).alias("sha")).collect()
    }


def _replay(spark, ob):
    """Fold segments in snapshot order over an empty base: the replay
    contract from the module docstring."""
    state: dict = {}
    for seg in ob.segments():
        feed = spark.read.parquet(f"{ob.path}/{seg}")
        rows = feed.select(*KEY, "content", "_change_type").collect()
        for r in rows:
            if r["_change_type"] in ("delete", "update_preimage"):
                state.pop((r["repo"], r["path"]), None)
        for r in rows:
            if r["_change_type"] in ("insert", "update_postimage"):
                state[(r["repo"], r["path"])] = r["content"]
    return state


def test_outbox_replay_reconstructs_state(spark, tmp_path):
    write_change_log(spark, GenLogConfig(n_events=1500, n_epochs=3), str(tmp_path / "cl"))
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=8, outbox=True)
    ap.run()
    ob = ap.outbox
    assert len(ob.segments()) == 3  # one per epoch (feed covers from birth)
    got = {k: __import__("hashlib").sha256(v.encode()).hexdigest()
           for k, v in _replay(spark, ob).items()}
    assert got == _fingerprint(ap.state()) and got
    # feed rows carry the snapshot range
    feed = ob.read()
    assert {"_change_type", "_from_snapshot", "_to_snapshot"} <= set(feed.columns)
    # re-publish is a noop
    assert ap.publish_outbox()["mode"] == "noop"


def test_outbox_since_filter_and_read(spark, tmp_path):
    write_change_log(spark, GenLogConfig(n_events=600, n_epochs=2), str(tmp_path / "cl"))
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=4, outbox=True)
    ap.run()
    ob = ap.outbox
    all_rows = ob.read().count()
    later = ob.read(since_snapshot=1).count()  # only the epoch-2 segment
    assert 0 < later < all_rows


def _mini_table(spark, tmp_path, rows, seq=1):
    schema = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("v", T.StringType()),
    ])
    t = IceliteTable.create(spark, str(tmp_path / "mt"), schema, key=["k"], n_buckets=4)
    df = spark.createDataFrame([(k, v, "U") for k, v in rows], "k long, v string, op string")
    t.merge(df.select("k", "v", "op", F.lit(seq).alias("commit_seq"),
                      F.col("k").alias("event_seq")))
    return t


def test_maintenance_only_range_advances_without_segment(spark, tmp_path):
    t = _mini_table(spark, tmp_path, [(i, f"v{i}") for i in range(40)])
    ob = ChangeOutbox(spark, str(tmp_path / "ob"))
    r = ob.publish(t)
    assert r["mode"] == "publish" and r["rows"] == 40  # from-birth coverage
    # cluster() rewrites files without changing any row: the manifest
    # diff is file-level, the row diff is empty
    t.cluster(["v"])
    r2 = ob.publish(t)
    assert r2["mode"] == "publish" and r2["rows"] == 0
    assert ob.pointer()["snapshot_id"] == t.current_snapshot_id()
    assert len(ob.segments()) == 1  # no empty segment on disk


def test_torn_publish_is_repaired_by_retry(spark, tmp_path):
    """A crash BETWEEN segment write and pointer move leaves a torn
    segment; the retry recomputes the same manifest diff and overwrites
    it byte-for-byte (readers behind the pointer never saw it)."""
    t = _mini_table(spark, tmp_path, [(i, f"v{i}") for i in range(20)])
    ob = ChangeOutbox(spark, str(tmp_path / "ob"))
    # simulate the torn write: segment exists (even corrupt), pointer absent
    import os
    seg = str(tmp_path / "ob" / "seg_0_1")
    os.makedirs(seg)
    (tmp_path / "ob" / "seg_0_1" / "garbage.parquet").write_bytes(b"not parquet")
    r = ob.publish(t)
    assert r["mode"] == "publish" and r["rows"] == 20
    assert ob.read().count() == 20  # torn content fully replaced


def test_bootstrap_on_expired_history(spark, tmp_path):
    t = _mini_table(spark, tmp_path, [(i, f"v{i}") for i in range(10)])
    t.expire_snapshots(keep_last=1)  # reap the create snapshot
    ob = ChangeOutbox(spark, str(tmp_path / "ob"))
    r = ob.publish(t)
    assert r["mode"] == "bootstrap"  # feed starts now; nothing emitted
    assert ob.segments() == []
    with pytest.raises(RuntimeError, match="no segments"):
        ob.read()
