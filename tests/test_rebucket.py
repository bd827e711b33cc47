"""Bucket-count evolution: rebucket() must preserve state byte-for-byte
(including tombstone semantics), keep time travel working against the
old layout, and be picked up transparently by the apply loop mid-stream."""

import json

import pyspark.sql.functions as F

from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.plans import fsio
from nifi_processors_spark.plans.table import IceliteTable

EVENT_DDL = (
    "repo string, path string, op string, commit string, commit_seq long, "
    "event_seq long, epoch long, payload_json string"
)


def payload(k):
    return json.dumps({"lang": "py", "content": f"c{k}"}, separators=(",", ":"))


def fp(df):
    return sorted(
        (r["repo"], r["path"], r["sha"])
        for r in df.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    )


def test_rebucket_midstream(spark, tmp_path):
    e0 = [
        ("a/r", f"f{i}.py", "I", "0" * 40, i, 0, 0, payload(i)) for i in range(8)
    ] + [("a/r", "f3.py", "D", "1" * 40, 20, 0, 0, None)]  # tombstone
    e1 = [
        ("a/r", "f3.py", "U", "2" * 40, 9, 0, 1, payload(99)),  # older than the delete
        ("b/r", "g1.py", "I", "2" * 40, 30, 0, 1, payload(42)),
        ("a/r", "f5.py", "U", "2" * 40, 31, 0, 1, payload(55)),
    ]
    cl = str(tmp_path / "cl")
    spark.createDataFrame(e0, EVENT_DDL).write.partitionBy("epoch").parquet(cl)

    ap = ChangeApplier(spark, str(tmp_path / "t"), cl, str(tmp_path / "s"), n_buckets=4)
    ap.run()
    t = IceliteTable(spark, str(tmp_path / "t"))
    pre_sid = t.current_snapshot_id()
    pre_fp = fp(ap.state())

    sid = t.rebucket(8)
    snap = t.snapshot()
    assert snap["snapshot_id"] == sid and snap["n_buckets"] == 8
    assert len(snap["buckets"]) == 8
    # state byte-identical after the rewrite; tombstone still present
    assert fp(t.read()) == pre_fp
    assert t.read(include_deleted=True).filter(F.col("_deleted")).count() == 1
    # time travel against the OLD layout still resolves
    old = t.read(snapshot_id=pre_sid)
    assert fp(old) == pre_fp

    # the apply loop picks the new count up mid-stream (fresh process too)
    spark.createDataFrame(e1, EVENT_DDL).write.partitionBy("epoch").mode(
        "append").parquet(cl)
    ap2 = ChangeApplier(spark, str(tmp_path / "t"), cl, str(tmp_path / "s"),
                        n_buckets=4)  # ctor value ignored: snapshot wins
    recs = ap2.run()
    assert len(recs) == 1
    assert len({p["bucket"] for p in recs[0]["partitions"]} | set()) <= 8

    # reference: the same changelog applied with 8 buckets from birth
    ref = ChangeApplier(spark, str(tmp_path / "t_ref"), cl, str(tmp_path / "s_ref"),
                        n_buckets=8)
    ref.run()
    assert fp(ap2.state()) == fp(ref.state())
    # the late f3 upsert (commit_seq 9 < delete's 20) stayed masked
    assert "f3.py" not in {r["path"] for r in ap2.state().collect()}


def test_rebucket_noop_and_validation(spark, tmp_path):
    rows = [("a/r", "f1.py", "I", "0" * 40, 0, 0, 0, payload(1))]
    cl = str(tmp_path / "cl")
    spark.createDataFrame(rows, EVENT_DDL).write.partitionBy("epoch").parquet(cl)
    ap = ChangeApplier(spark, str(tmp_path / "t"), cl, str(tmp_path / "s"), n_buckets=4)
    ap.run()
    t = IceliteTable(spark, str(tmp_path / "t"))
    sid = t.current_snapshot_id()
    assert t.rebucket(4) == sid  # same count: no new snapshot
    assert t.current_snapshot_id() == sid
    import pytest

    with pytest.raises(ValueError):
        t.rebucket(0)


def test_rebucket_mor_resolves_deltas(spark, tmp_path):
    """Rebucketing a MOR table folds unresolved deltas through the LWW
    resolve — the rewritten table has no delta files left."""
    rows0 = [("a/r", f"f{i}.py", "I", "0" * 40, i, 0, 0, payload(i)) for i in range(6)]
    rows1 = [("a/r", "f1.py", "U", "1" * 40, 10, 0, 1, payload(100)),
             ("a/r", "f2.py", "D", "1" * 40, 11, 0, 1, None)]
    cl = str(tmp_path / "cl")
    spark.createDataFrame(rows0 + rows1, EVENT_DDL).write.partitionBy("epoch").parquet(cl)
    ap = ChangeApplier(spark, str(tmp_path / "t"), cl, str(tmp_path / "s"),
                       n_buckets=4, merge_mode="mor")
    ap.run()
    t = IceliteTable(spark, str(tmp_path / "t"))
    assert t.delta_file_count() > 0
    before = fp(ap.state())
    t.rebucket(8)
    assert t.delta_file_count() == 0
    assert fp(t.read()) == before
    assert "f2.py" not in {r["path"] for r in t.read().collect()}
