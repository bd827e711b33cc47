"""Snapshot expiry: old metadata + orphaned data files removed, shared
files and retained snapshots untouched, current state unchanged."""

import os

import pyspark.sql.functions as F

from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.plans.table import IceliteTable
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log


def test_expire_snapshots(spark, tmp_path):
    write_change_log(spark, GenLogConfig(n_events=2000, n_epochs=4), str(tmp_path / "cl"))
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=4)
    ap.run()
    t = IceliteTable(spark, str(tmp_path / "t"))
    before = sorted(
        (r["repo"], r["path"], r["sha"])
        for r in t.read().select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    )
    sid = t.current_snapshot_id()
    assert sid == 4

    expired = t.expire_snapshots(keep_last=2)
    assert expired == [0, 1, 2]
    # current + previous still readable, byte-identical state
    after = sorted(
        (r["repo"], r["path"], r["sha"])
        for r in t.read().select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    )
    assert after == before
    assert t.read(snapshot_id=sid - 1).count() > 0
    # expired metadata gone
    assert not os.path.exists(os.path.join(t.meta_dir, "v1.json"))
    # every file referenced by retained snapshots still exists
    for s in (sid - 1, sid):
        for files in t.snapshot(s)["buckets"].values():
            for fe in files:
                assert os.path.exists(fe["path"]), fe["path"]
