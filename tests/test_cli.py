"""spark-submit CLI entry point (generate -> apply -> state)."""

import json

from nifi_processors_spark import cli


def test_cli_roundtrip(spark, tmp_path, capsys):
    cl = str(tmp_path / "cl")
    assert cli.main(["generate", "--out", cl, "--events", "2000", "--epochs", "2"]) == 0
    assert cli.main([
        "apply", "--table", str(tmp_path / "t"), "--changelog", cl,
        "--state", str(tmp_path / "s"), "--buckets", "4",
    ]) == 0
    assert cli.main([
        "state", "--table", str(tmp_path / "t"), "--changelog", cl,
        "--state", str(tmp_path / "s"),
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    gen = json.loads(out[0])
    assert gen["events"] == 2000
    epochs = [json.loads(x) for x in out[1:3]]
    assert [e["epoch"] for e in epochs] == [0, 1]
    state = json.loads(out[3])
    assert state["rows"] > 0 and "repo" in state["schema"]


def test_cli_maintain(spark, tmp_path, capsys):
    """Ad-hoc maintenance pass: tombstone expiry + snapshot expiry through
    the CLI; meta/ shrinks and the watermark is recorded."""
    import os

    from nifi_processors_spark.plans.table import IceliteTable

    cl = str(tmp_path / "cl")
    assert cli.main(["generate", "--out", cl, "--events", "2000", "--epochs", "4"]) == 0
    assert cli.main([
        "apply", "--table", str(tmp_path / "t"), "--changelog", cl,
        "--state", str(tmp_path / "s"), "--buckets", "4",
    ]) == 0
    n_meta_before = len(os.listdir(tmp_path / "t" / "meta"))
    capsys.readouterr()
    assert cli.main([
        "maintain", "--table", str(tmp_path / "t"), "--changelog", cl,
        "--state", str(tmp_path / "s"), "--keep-snapshots", "1",
        "--tombstone-watermark", "1",
    ]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["expired_snapshots"], "no snapshots expired"
    t = IceliteTable(spark, str(tmp_path / "t"))
    assert t.snapshot()["tombstone_watermark"] == 1
    assert len(os.listdir(tmp_path / "t" / "meta")) < n_meta_before + 1
    assert t.read().count() > 0
