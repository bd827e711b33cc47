"""Merge-on-read mode: delta appends resolve to the same state as CoW;
compaction folds deltas without changing state; mixed-mode works."""

import pyspark.sql.functions as F
import pytest

from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.plans.table import IceliteTable
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log

from .oracle import replay, sha256

CFG = GenLogConfig(n_events=3000, n_epochs=4)


@pytest.fixture(scope="module")
def changelog(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mor_cl"))
    write_change_log(spark, CFG, d)
    return d


def fingerprint(df):
    return sorted(
        (r["repo"], r["path"], r["sha"])
        for r in df.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    )


def oracle_fp(spark, changelog):
    rows = [r.asDict() for r in spark.read.parquet(changelog).collect()]
    return sorted((k[0], k[1], sha256(v["content"])) for k, v in replay(rows).items())


def test_mor_matches_oracle_and_cow(spark, changelog, tmp_path):
    cow = ChangeApplier(spark, str(tmp_path / "ct"), changelog, str(tmp_path / "cs"),
                        n_buckets=8, merge_mode="cow")
    cow.run()
    mor = ChangeApplier(spark, str(tmp_path / "mt"), changelog, str(tmp_path / "ms"),
                        n_buckets=8, merge_mode="mor")
    mor.run()
    want = oracle_fp(spark, changelog)
    assert fingerprint(cow.state()) == want
    assert fingerprint(mor.state()) == want

    t = IceliteTable(spark, str(tmp_path / "mt"))
    assert t.delta_file_count() > 0  # deltas really accumulated (no rewrite)

    # compaction folds deltas, state unchanged
    t.compact()
    assert t.delta_file_count() == 0
    assert fingerprint(t.read()) == want


def test_mor_replay_idempotent(spark, changelog, tmp_path):
    mor = ChangeApplier(spark, str(tmp_path / "t"), changelog, str(tmp_path / "s"),
                        n_buckets=8, merge_mode="mor")
    mor.run()
    fp1 = fingerprint(mor.state())
    mor.apply_epoch(2)  # force re-apply: duplicate delta rows
    assert fingerprint(mor.state()) == fp1
    t = IceliteTable(spark, str(tmp_path / "t"))
    t.compact()
    assert fingerprint(t.read()) == fp1


def test_mor_auto_compact(spark, changelog, tmp_path):
    mor = ChangeApplier(spark, str(tmp_path / "t2"), changelog, str(tmp_path / "s2"),
                        n_buckets=8, merge_mode="mor", compact_every=2)
    mor.run()  # 4 epochs -> compactions after epochs 1 and 3
    t = IceliteTable(spark, str(tmp_path / "t2"))
    assert t.delta_file_count() == 0
    assert fingerprint(t.read()) == oracle_fp(spark, changelog)


def test_mixed_mode_cow_after_mor(spark, changelog, tmp_path):
    """CoW merge on a table holding unresolved deltas resolves them first."""
    ap = ChangeApplier(spark, str(tmp_path / "t3"), changelog, str(tmp_path / "s3"),
                       n_buckets=8, merge_mode="mor")
    for e in [0, 1]:
        ap.apply_epoch(e)
    ap.merge_mode = "cow"
    for e in [2, 3]:
        ap.apply_epoch(e)
    assert fingerprint(ap.state()) == oracle_fp(spark, changelog)


def test_mor_with_schema_evolution(spark, tmp_path):
    cfg = GenLogConfig(n_events=2000, n_epochs=4, evolve_at_epoch=2)
    write_change_log(spark, cfg, str(tmp_path / "cl"))
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=8, merge_mode="mor")
    ap.run()
    state = ap.state()
    assert "language" in state.columns and "size_bytes" in state.columns
    rows = [r.asDict() for r in spark.read.parquet(str(tmp_path / "cl")).collect()]
    want = {k: sha256(v["content"]) for k, v in replay(rows).items()}
    got = {(r["repo"], r["path"]): r["sha"]
           for r in state.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()}
    assert got == want
