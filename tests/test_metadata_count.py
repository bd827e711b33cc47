"""Metadata-only COUNT(*): live-row counts answered from the manifest's
_deleted boolean footer stats, with a residual scan only over buckets
metadata cannot prove (deltas, mixed-tombstone files)."""

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


def test_count_pure_metadata_without_tombstones(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"],
                            n_buckets=4)
    t.merge(_chset(spark, [(k, k * 10, "U") for k in range(50)], 1))
    rep = t.count_report()
    assert rep["buckets_scanned"] == []          # zero data files touched
    assert rep["metadata_rows"] == 50
    assert t.count_rows() == 50 == t.read().count()


def test_count_with_tombstones_stays_metadata_only(spark, tmp_path):
    """Files mixing live and tombstone rows record an exact live_rows
    (one-boolean-column read at commit time), so COUNT(*) needs no data
    scan even on a tombstone-bearing CoW table."""
    t = IceliteTable.create(spark, str(tmp_path / "t2"), SCHEMA, key=["k"],
                            n_buckets=4)
    t.merge(_chset(spark, [(k, k, "U") for k in range(40)], 1))
    t.merge(_chset(spark, [(3, 0, "D"), (7, 0, "D")], 2))  # tombstone 2 keys
    assert t.read().count() == 38
    assert t.count_rows() == 38
    rep = t.count_report()
    assert rep["buckets_scanned"] == []
    assert rep["metadata_rows"] == 38
    # time travel: snapshot 1 still counts (pure metadata there)
    assert t.count_rows(snapshot_id=1) == 40


def test_count_with_mor_deltas_then_compact(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t3"), SCHEMA, key=["k"],
                            n_buckets=4)
    t.merge(_chset(spark, [(k, k, "U") for k in range(30)], 1))
    t.merge_mor(_chset(spark, [(1, 99, "U"), (100, 1, "U")], 2))
    # delta buckets hold multiple versions per key -> must scan
    assert t.count_rows() == 31 == t.read().count()
    assert t.count_report()["buckets_scanned"] != []
    t.compact()
    assert t.count_rows() == 31
    assert t.count_report()["buckets_scanned"] == []  # metadata-only again


def test_count_after_tombstone_expiry_is_metadata_only(spark, tmp_path):
    t = IceliteTable.create(spark, str(tmp_path / "t4"), SCHEMA, key=["k"],
                            n_buckets=2)
    t.merge(_chset(spark, [(k, k, "U") for k in range(10)], 1))
    t.merge(_chset(spark, [(0, 0, "D")], 2))
    assert t.count_rows() == 9
    t.expire_tombstones(min_commit_seq=100)
    assert t.count_rows() == 9
    assert t.count_report()["buckets_scanned"] == []


def test_count_stats_stripped_falls_back_to_scan(spark, tmp_path):
    import json
    t = IceliteTable.create(spark, str(tmp_path / "t5"), SCHEMA, key=["k"],
                            n_buckets=2)
    t.merge(_chset(spark, [(k, k, "U") for k in range(8)], 1))
    vpath = tmp_path / "t5" / "meta" / "v1.json"
    snap = json.loads(vpath.read_text())
    for fs in snap["buckets"].values():
        for fe in fs:
            fe.get("stats", {}).pop("live_rows", None)
    vpath.write_text(json.dumps(snap))
    rep = t.count_report()
    assert len(rep["buckets_scanned"]) == rep["buckets_total"]
    assert t.count_rows() == 8
