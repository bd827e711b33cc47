"""Corrupt-payload quarantine (the reference's 'failure' relationship) and
tombstone expiry compaction."""

import json

import pyspark.sql.functions as F

from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.plans.table import IceliteTable


def make_changelog(spark, path, rows):
    df = spark.createDataFrame(
        rows,
        "repo string, path string, op string, commit string, commit_seq long, "
        "event_seq long, epoch long, payload_json string",
    )
    df.write.partitionBy("epoch").parquet(path)


def payload(k):
    return json.dumps({"lang": "py", "content": f"c{k}"}, separators=(",", ":"))


def test_corrupt_rows_quarantined_not_fatal(spark, tmp_path):
    rows = [
        ("a/r", "f1.py", "I", "0" * 40, 0, 0, 0, payload(1)),
        ("a/r", "f2.py", "I", "0" * 40, 0, 1, 0, "{not-json"),       # corrupt
        ("a/r", "f3.py", "I", "0" * 40, 0, 2, 0, payload(3)),
    ]
    make_changelog(spark, str(tmp_path / "cl"), rows)
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=4)
    recs = ap.run()
    assert recs[0]["rows_corrupt"] == 1
    state = {r["path"] for r in ap.state().collect()}
    assert state == {"f1.py", "f3.py"}
    q = spark.read.parquet(ap.quarantine_dir)
    qr = q.collect()
    assert len(qr) == 1 and qr[0]["path"] == "f2.py" and qr[0]["payload_json"] == "{not-json"


def test_expire_tombstones(spark, tmp_path):
    rows = [
        ("a/r", "f1.py", "I", "0" * 40, 0, 0, 0, payload(1)),
        ("a/r", "f2.py", "I", "0" * 40, 0, 1, 0, payload(2)),
        ("a/r", "f2.py", "D", "1" * 40, 1, 0, 1, None),
    ]
    make_changelog(spark, str(tmp_path / "cl"), rows)
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=4)
    ap.run()
    t = IceliteTable(spark, str(tmp_path / "t"))
    with_dead = t.read(include_deleted=True)
    assert with_dead.filter(F.col("_deleted")).count() == 1
    assert t.read().count() == 1

    # watermark above the delete's commit_seq -> tombstone compacted away
    t.expire_tombstones(min_commit_seq=2)
    assert t.read(include_deleted=True).filter(F.col("_deleted")).count() == 0
    assert {r["path"] for r in t.read().collect()} == {"f1.py"}

    # time travel still sees the pre-compaction snapshot
    prev = t.snapshot()["parent"]
    assert t.read(snapshot_id=prev, include_deleted=True).filter(F.col("_deleted")).count() == 1
