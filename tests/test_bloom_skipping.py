"""Per-file bloom filters on secondary columns: equality/IN scans skip
files the value provably isn't in — on a high-cardinality column
UNCORRELATED with the key, where min/max ranges span everything and can
never prune (SURVEY.md §2.12 file-skipping family)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_processors_spark.plans.table import (
    IceliteTable,
    _bloom_build,
    _bloom_excludes,
    _bloom_hashes,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ref", T.StringType()),   # high-cardinality, random per row
    T.StructField("v", T.LongType()),
])


def _chset(spark, rows, seq):
    df = spark.createDataFrame(rows, "k long, ref string, v long, op string")
    return df.select("k", "ref", "v", "op", F.lit(seq).alias("commit_seq"),
                     F.col("k").alias("event_seq"))


@pytest.fixture()
def tbl(spark, tmp_path):
    """8-bucket table keyed by k; `ref` values scatter randomly across
    buckets (sha-derived), so min/max on ref never prunes anything —
    only the bloom can."""
    t = IceliteTable.create(spark, str(tmp_path / "t"), SCHEMA, key=["k"],
                            n_buckets=8, bloom_cols=["ref"])
    rows = [(k, f"ref-{k * 2654435761 % 997:04d}", k, "U") for k in range(400)]
    t.merge(_chset(spark, rows, 1))
    return t


def test_blooms_in_manifest(tbl, tmp_path):
    snap = json.loads((tmp_path / "t" / "meta" / "v1.json").read_text())
    files = [fe for fs in snap["buckets"].values() for fe in fs]
    assert files
    for fe in files:
        assert "ref" in fe["stats"]["blooms"]
        assert int(fe["stats"]["blooms"]["ref"], 16) > 0


def test_bloom_prunes_where_minmax_cannot(tbl):
    probe = "ref-0000"  # k=0's ref; exists in exactly one file
    rep = tbl.scan_report([("ref", "=", probe)])
    # min/max alone keeps everything (random strings span the range in
    # every file); the bloom must drop most files
    assert rep["files_kept"] < rep["files_total"] / 2
    got = sorted(r["k"] for r in tbl.scan([("ref", "=", probe)]).collect())
    want = sorted(r["k"] for r in tbl.read().filter(F.col("ref") == probe).collect())
    assert got == want and got


def test_bloom_absent_value_reads_nothing_sized(tbl):
    rep = tbl.scan_report([("ref", "=", "no-such-ref")])
    # an absent value survives only in bloom false-positive files (~2.5%)
    assert rep["files_kept"] <= max(1, rep["files_total"] // 4)
    assert tbl.scan([("ref", "=", "no-such-ref")]).count() == 0


def test_bloom_in_list(tbl):
    probes = ["ref-0000", "ref-%04d" % (7 * 2654435761 % 997), "absent"]
    got = sorted(r["k"] for r in tbl.scan([("ref", "in", probes)]).collect())
    want = sorted(r["k"] for r in tbl.read().filter(F.col("ref").isin(probes)).collect())
    assert got == want and got


def test_bloom_survives_compaction_and_updates(spark, tbl):
    # update one key's ref; the rewritten bucket's new file must carry a
    # fresh bloom containing the NEW value and (eventually) not the old
    t = tbl
    t.merge(_chset(spark, [(0, "ref-new", 999, "U")], 2))
    got = [r["k"] for r in t.scan([("ref", "=", "ref-new")]).collect()]
    assert got == [0]
    # the old value must no longer match any CURRENT row
    assert t.scan([("ref", "=", "ref-0000")]).count() == 0


def test_bloom_unit_properties():
    # type-tagged: int 5 and str '5' hash differently
    assert _bloom_hashes(5) != _bloom_hashes("5")
    assert _bloom_hashes(1.5) is None and _bloom_hashes(True) is None
    bx = _bloom_build(["a", "b", None])
    fe = {"stats": {"blooms": {"c": bx}}}
    assert not _bloom_excludes(fe, "c", "=", "a")       # present: kept
    assert _bloom_excludes(fe, "c", "=", "zzz-absent")  # absent: provably excluded
    assert not _bloom_excludes(fe, "c", "<", "a")        # ranges: bloom silent
    assert _bloom_excludes(fe, "c", "in", ["q1", "q2"])
    assert not _bloom_excludes(fe, "c", "in", ["q1", "b"])
    # un-bloomable column type -> no bloom recorded
    assert _bloom_build(["a", 1.5]) is None
    # all-null column: excludes every probe (null never satisfies =)
    assert _bloom_excludes({"stats": {"blooms": {"c": _bloom_build([None])}}}, "c", "=", "x")
