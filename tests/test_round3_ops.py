"""Round-3 hardening: corrupt-count partitioning, streaming namespace
isolation for quarantine/metrics, long-run maintenance cadence, the LSH
degenerate-bucket cap, and short-document shingle safety."""

import json

import pyspark.sql.functions as F

from nifi_processors_spark.operators import fuzzy
from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.plans import fsio
from nifi_processors_spark.plans.registry import fields_from_variant_schema
from nifi_processors_spark.plans.table import IceliteTable
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log

EVENT_DDL = (
    "repo string, path string, op string, commit string, commit_seq long, "
    "event_seq long, epoch long, payload_json string"
)


def payload(k):
    return json.dumps({"lang": "py", "content": f"c{k}"}, separators=(",", ":"))


def make_changelog(spark, path, rows):
    spark.createDataFrame(rows, EVENT_DDL).write.partitionBy("epoch").parquet(path)


def test_malformed_and_badkey_row_counted_once(spark, tmp_path):
    """A row that is BOTH null-keyed and malformed must count once in
    rows_corrupt (as badkey) — the round-2 observation double-counted it
    and double-subtracted rows_upserted (which could go negative)."""
    rows = [
        ("a/r", "f1.py", "I", "0" * 40, 0, 0, 0, payload(1)),
        ("a/r", "f2.py", "I", "0" * 40, 0, 1, 0, payload(2)),
        (None, "bad.py", "I", "0" * 40, 0, 2, 0, "{not-json"),  # both defects
        ("a/r", None, "I", "0" * 40, 0, 3, 0, payload(4)),       # badkey only
        ("a/r", "f5.py", "I", "0" * 40, 0, 4, 0, "{not-json"),   # malformed only
    ]
    make_changelog(spark, str(tmp_path / "cl"), rows)
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=4)
    rec = ap.run()[0]
    assert rec["rows_in"] == 5
    assert rec["rows_corrupt"] == 3  # NOT 4: both-defect row counts once
    assert rec["rows_upserted"] == 2
    assert rec["rows_deleted"] == 0
    assert {r["path"] for r in ap.state().collect()} == {"f1.py", "f2.py"}
    # all three defective rows are retained in quarantine
    assert spark.read.parquet(ap.quarantine_dir).count() == 3


def test_stream_marker_isolates_quarantine_and_metrics(spark, tmp_path):
    """A streaming micro-batch N sharing the state_dir must NOT clobber
    batch epoch N's quarantine dir or metrics record (round-2 advice: only
    checkpoint markers were namespaced)."""
    rows = [
        ("a/r", "f1.py", "I", "0" * 40, 0, 0, 0, payload(1)),
        ("a/r", "bad_batch.py", "I", "0" * 40, 0, 1, 0, "{not-json"),
    ]
    make_changelog(spark, str(tmp_path / "cl"), rows)
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=4)
    ap.run()

    stream_rows = [
        ("a/r", "f2.py", "I", "1" * 40, 1, 0, 0, payload(2)),
        ("a/r", "bad_stream.py", "I", "1" * 40, 1, 1, 0, "{not-json"),
    ]
    batch_df = spark.createDataFrame(stream_rows, EVENT_DDL)
    ap.apply_batch_df(batch_df, 0, marker="stream_0")  # same integer epoch!

    q = spark.read.parquet(ap.quarantine_dir)
    assert {r["path"] for r in q.collect()} == {"bad_batch.py", "bad_stream.py"}
    markers = {r["marker"] for r in ap.metrics.records()}
    assert markers == {"0", "stream_0"}
    # exactly-once namespaces stay separate too
    assert ap.checkpoints.is_committed(0) and ap.checkpoints.is_committed("stream_0")
    assert {r["path"] for r in ap.state().collect()} == {"f1.py", "f2.py"}


def _meta_snapshot_files(table_path):
    return [
        f for f in fsio.listdir(fsio.join(table_path, "meta"))
        if f.startswith("v") and f.endswith(".json")
    ]


def test_long_run_maintenance_keeps_meta_and_tombstones_bounded(spark, tmp_path):
    """100-epoch run with the maintenance cadences on: meta/ stays bounded
    (instead of one snapshot per epoch + compactions), expired tombstones
    are compacted away, and the final state matches a maintenance-free
    replay of the same changelog."""
    cl = str(tmp_path / "cl")
    cfg = GenLogConfig(n_events=3000, n_epochs=100, n_keys=120, content_blocks_max=2)
    write_change_log(spark, cfg, cl)

    ap = ChangeApplier(
        spark, str(tmp_path / "t"), cl, str(tmp_path / "s"), n_buckets=4,
        merge_mode="mor", compact_every=10,
        expire_snapshots_every=10, keep_snapshots=2,
        # lateness must exceed the stream's real commit disorder (genlog
        # pushes late events up to 3 epochs = ~23 commits here) or the
        # staleness guard refuses the stale events — by contract
        expire_tombstones_every=25, tombstone_lateness=40,
    )
    recs = ap.run()
    assert len(recs) == 100

    # snapshots: ~113 commits happened (100 merges + compactions +
    # tombstone rewrites); retained metadata must be a small constant
    n_meta = len(_meta_snapshot_files(str(tmp_path / "t")))
    assert n_meta <= ap.keep_snapshots + ap.expire_snapshots_every + 3, n_meta

    t = IceliteTable(spark, str(tmp_path / "t"))
    n_tombstones = t.read(include_deleted=True).filter(F.col("_deleted")).count()
    # only tombstones younger than the watermark survive
    wm = ap._max_commit_seq - ap.tombstone_lateness
    old_tombs = (
        t.read(include_deleted=True)
        .filter(F.col("_deleted") & (F.col("_commit_seq") < wm))
        .count()
    )
    assert old_tombs == 0, f"{old_tombs} expired tombstones survived"

    # correctness unchanged: maintenance-free replay converges to the
    # same live state
    ref = ChangeApplier(spark, str(tmp_path / "t_ref"), cl,
                        str(tmp_path / "s_ref"), n_buckets=4)
    ref.run()

    def fp(df):
        return sorted(
            (r["repo"], r["path"], r["sha"])
            for r in df.select("repo", "path",
                               F.sha2("content", 256).alias("sha")).collect()
        )

    assert fp(ap.state()) == fp(ref.state())
    ref_tombstones = (
        IceliteTable(spark, str(tmp_path / "t_ref"))
        .read(include_deleted=True).filter(F.col("_deleted")).count()
    )
    assert n_tombstones <= ref_tombstones


def test_tombstone_expiry_staleness_guard(spark, tmp_path):
    """Once tombstone expiry records a watermark, events older than it can
    no longer be merged safely (an expired tombstone can't mask them). A
    marker-loss replay of a wholly-stale epoch is skipped + its marker
    restored (state byte-identical); a partially-stale epoch raises."""
    import os as _os

    import pytest as _pytest

    rows = [
        ("a/r", "f1.py", "I", "0" * 40, 0, 0, 0, payload(1)),
        ("a/r", "f2.py", "I", "0" * 40, 1, 0, 0, payload(2)),
        ("a/r", "f2.py", "D", "1" * 40, 2, 0, 1, None),
        ("a/r", "f3.py", "I", "1" * 40, 3, 0, 1, payload(3)),
    ]
    make_changelog(spark, str(tmp_path / "cl"), rows)
    ap = ChangeApplier(spark, str(tmp_path / "t"), str(tmp_path / "cl"),
                       str(tmp_path / "s"), n_buckets=4)
    ap.run()
    t = IceliteTable(spark, str(tmp_path / "t"))
    t.expire_tombstones(min_commit_seq=10)  # watermark ABOVE every commit
    assert t.snapshot()["tombstone_watermark"] == 10

    def fp(df):
        return sorted(
            (r["repo"], r["path"], r["sha"])
            for r in df.select("repo", "path",
                               F.sha2("content", 256).alias("sha")).collect()
        )

    before = fp(ap.state())
    # marker loss on a wholly-stale epoch -> self-healing skip
    _os.remove(str(tmp_path / "s" / "checkpoints" / "epoch_0.json"))
    recs = ap.run()
    assert len(recs) == 1 and recs[0]["skipped_stale"] is True
    assert ap.checkpoints.is_committed(0)
    assert fp(ap.state()) == before

    # a NEW epoch straddling the watermark -> loud refusal
    late = [("a/r", "f2.py", "I", "2" * 40, 4, 0, 2, payload(9)),
            ("a/r", "f4.py", "I", "2" * 40, 12, 0, 2, payload(4))]
    spark.createDataFrame(late, EVENT_DDL).write.partitionBy("epoch").mode("append").parquet(str(tmp_path / "cl"))
    with _pytest.raises(RuntimeError, match="tombstone-expiry watermark"):
        ap.run()


def test_lsh_degenerate_bucket_cap(spark):
    """5000 byte-identical docs land in ONE bucket per band; without the
    cap that is ~12.5M local pairs per band. The cap bounds the expansion
    and lsh_bucket_stats reports exactly what was dropped."""
    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every file").alias("text"),
    )
    pairs = fuzzy.minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.5,
        num_hashes=32, bands=16, max_bucket_size=32,
    )
    assert pairs.count() == 32 * 31 // 2  # pairs among the 32 kept ids

    stats = fuzzy.lsh_bucket_stats(
        docs, "text", "doc_id", num_hashes=32, bands=16, max_bucket_size=32
    ).collect()
    assert len(stats) == 16
    per_bucket_dropped = 5000 * 4999 // 2 - 32 * 31 // 2
    assert all(r["bucket_size"] == 5000 for r in stats)
    assert all(r["dropped_pairs"] == per_bucket_dropped for r in stats)

    # uncapped stats on a sane corpus report zero drops
    sane = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id").cast("string"),
                 F.lit(" with distinct content words")).alias("text"),
    )
    sane_stats = fuzzy.lsh_bucket_stats(sane, "text", "doc_id", num_hashes=32, bands=16)
    assert sane_stats.filter(F.col("dropped_pairs") > 0).count() == 0


def test_short_doc_shingles_ansi_safe(spark):
    """Docs shorter than the shingle width must not throw under ANSI mode
    (element_at out-of-bounds) — they degrade to their partial gram."""
    docs = spark.createDataFrame(
        [(0, "hello"), (1, "two words"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["sh"]
        for r in fuzzy.with_word_shingles(docs, "text", "sh", 3).collect()
    }
    assert rows[0] == ["hello"]
    assert rows[1] == ["two words"]
    assert len(rows[2]) == 3
    # and the full LSH pipeline runs over them
    assert fuzzy.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.9).count() == 0


def test_variant_schema_parser_handles_quoted_names():
    """Round-2 advice: backtick-quoted field names containing ',', '<',
    '>' or '`' mis-split; DECIMAL(p,s) commas did too (any JSON decimal
    literal types as DECIMAL)."""
    s = "OBJECT<`a,b`: BIGINT, `c<d>`: STRING, `e``f`: DECIMAL(2,1), plain: BOOLEAN>"
    assert fields_from_variant_schema(s) == [
        ("a,b", "long"), ("c<d>", "string"), ("e`f", "double"), ("plain", "boolean")
    ]
    assert fields_from_variant_schema("OBJECT<score: DECIMAL(5,2), n: BIGINT>") == [
        ("score", "double"), ("n", "long")
    ]
