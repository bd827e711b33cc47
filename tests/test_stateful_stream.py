"""Custom stateful streaming operator (applyInPandasWithState session
windows) — closed sessions from the stream must match the batch-window
oracle's closed sessions."""

import pyspark.sql.functions as F

from nifi_processors_spark.streaming.stateful import sessionize_stream, sessions_batch

SCHEMA = "user_id long, ts_us long"
GAP_MS = 1000  # 1s session gap -> gap_us = 1_000_000


def _events(spark):
    rows = [
        # user 1: two closed sessions + one open tail
        (1, 0), (1, 100_000), (1, 2_000_000), (1, 2_100_000), (1, 9_000_000),
        # user 2: one closed session + open tail
        (2, 500_000), (2, 5_000_000),
        # user 3: single (open) session only -> nothing emitted
        (3, 42),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_stateful_sessionize_stream(spark, tmp_path):
    src = str(tmp_path / "events")
    _events(spark).repartition(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        sessionize_stream(stream, gap_ms=GAP_MS)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # the processing-time timeout flushes open sessions before the
    # availableNow query drains, so the stream EVENTUALLY emits every
    # session — compare against the full batch-window oracle
    want = {
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in sessions_batch(_events(spark), gap_ms=GAP_MS).collect()
    }
    assert got == want
    assert (1, 0, 2, 0, 100_000) in got
    assert (1, 2_000_000, 2, 2_000_000, 2_100_000) in got
    assert (2, 500_000, 1, 500_000, 500_000) in got


def test_sessions_batch_oracle(spark):
    out = {
        (r["user_id"], r["session_id"], r["n_events"])
        for r in sessions_batch(_events(spark), gap_ms=GAP_MS).collect()
    }
    assert out == {
        (1, 0, 2), (1, 2_000_000, 2), (1, 9_000_000, 1),
        (2, 500_000, 1), (2, 5_000_000, 1),
        (3, 42, 1),
    }
