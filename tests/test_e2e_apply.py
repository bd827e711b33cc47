"""End-to-end replay equality vs the dict oracle (SURVEY.md §5.2 item 2):
generate a deterministic change log, run the engine, assert per-row
content sha256 equality + key-set equality (BASELINE.json.input_hint)."""

import pyspark.sql.functions as F
import pytest

from nifi_processors_spark.operators.apply import ChangeApplier
from nifi_processors_spark.sources.genlog import GenLogConfig, generate_change_log, write_change_log

from .oracle import replay, sha256

CFG = GenLogConfig(n_events=3000, n_epochs=4)


@pytest.fixture(scope="module")
def changelog(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("changelog"))
    write_change_log(spark, CFG, d)
    return d


def engine_state(spark, changelog, tmp_path, **kw):
    ap = ChangeApplier(
        spark,
        table_path=str(tmp_path / "table"),
        changelog_dir=changelog,
        state_dir=str(tmp_path / "state"),
        n_buckets=8,
        **kw,
    )
    ap.run()
    return ap, ap.state()


def oracle_state(spark, changelog):
    rows = [r.asDict() for r in spark.read.parquet(changelog).collect()]
    return replay(rows)


def test_replay_matches_oracle(spark, changelog, tmp_path):
    _, state = engine_state(spark, changelog, tmp_path)
    got = {
        (r["repo"], r["path"]): r.asDict()
        for r in state.withColumn("content_sha", F.sha2("content", 256)).collect()
    }
    want = oracle_state(spark, changelog)

    assert set(got) == set(want), (
        f"key sets differ: extra={list(set(got)-set(want))[:3]} "
        f"missing={list(set(want)-set(got))[:3]}"
    )
    for k, w in want.items():
        g = got[k]
        assert g["content_sha"] == sha256(w["content"]), f"content sha mismatch at {k}"
        assert g["commit"] == w["commit"], f"commit mismatch at {k}"
        assert g["lang"] == w["lang"], f"lang mismatch at {k}"


def test_idempotent_replay(spark, changelog, tmp_path):
    """Re-applying a committed epoch is a byte-identical no-op
    (SURVEY.md §5.2 item 5)."""
    ap, state = engine_state(spark, changelog, tmp_path)
    t = ap._table()
    sid_before = t.current_snapshot_id()
    before = {
        (r["repo"], r["path"]): r["sha"]
        for r in state.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    }
    # force re-apply of the last epoch
    last = ap.discover_epochs()[-1]
    ap.apply_epoch(last)
    after_df = ap.state()
    after = {
        (r["repo"], r["path"]): r["sha"]
        for r in after_df.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    }
    assert before == after
    assert t.current_snapshot_id() == sid_before + 1  # new snapshot, same state


def test_epoch_order_insensitive(spark, changelog, tmp_path):
    """Applying epochs in a different order converges to the same state
    (LWW-vs-state rule)."""
    ap = ChangeApplier(
        spark,
        table_path=str(tmp_path / "t2"),
        changelog_dir=changelog,
        state_dir=str(tmp_path / "s2"),
        n_buckets=8,
    )
    for e in reversed(ap.discover_epochs()):
        ap.apply_epoch(e)
    got = {
        (r["repo"], r["path"]): r["sha"]
        for r in ap.state().select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    }
    want = {k: sha256(v["content"]) for k, v in oracle_state(spark, changelog).items()}
    assert got == want
