"""Watermarked windowed aggregation: the streaming run must emit exactly
the closed windows with late-beyond-watermark rows DROPPED, while the
batch run of the identical plan counts every row — the difference IS the
watermark's retention trade, asserted both ways."""

import os
import time

import pyspark.sql.functions as F

from nifi_processors_spark.streaming.windows import windowed_counts

SCHEMA = "event_type string, ts timestamp"

T0 = "2024-01-01 00:00:"


def _df(spark, rows):
    return spark.createDataFrame(
        [(t, f"2024-01-01 {hms}") for t, hms in rows], "event_type string, ts string"
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"))


def test_streaming_windows_drop_late_rows(spark, tmp_path):
    """Since Spark 3.4, late-event filtering uses the PREVIOUS batch's
    eviction watermark, so the late row must arrive two batches after the
    advancer to be provably late — the file mtimes pin the batch order."""
    src = str(tmp_path / "ev")
    os.makedirs(src)

    def write_batch(rows):
        before = {f for f in os.listdir(src) if f.endswith(".parquet")}
        _df(spark, rows).repartition(1).write.mode("append").parquet(src)
        return sorted(
            os.path.join(src, f)
            for f in set(os.listdir(src)) - before
            if f.endswith(".parquet")
        )

    # batch 0: on-time row + advancer (watermark after this: 00:04:00)
    b0 = write_batch([("click", "00:00:10"), ("click", "00:05:00")])
    # batch 1: lets the late-event watermark catch up; first window emits
    b1 = write_batch([("click", "00:05:30")])
    # batch 2: a LATE row for the already-emitted first window + a tail
    b2 = write_batch([("click", "00:00:30"), ("click", "00:06:00")])
    now = time.time()
    for off, files in ((150, b0), (100, b1), (50, b2)):
        for f in files:
            os.utime(f, (now - off, now - off))

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        windowed_counts(stream, "ts", keys=["event_type"],
                        window="1 minute", watermark="1 minute")
        .writeStream.format("memory").queryName("win_out").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    got = {
        (r["window_start_us"], r["window_end_us"], r["event_type"], r["n"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    base = 1704067200_000000  # 2024-01-01 00:00:00 UTC in micros
    minute = 60_000_000
    # the first window emitted with ONLY the on-time row; the 00:00:30 row
    # arrived after the watermark passed the window end and was dropped
    assert (base, base + minute, "click", 1) in got
    assert (base, base + minute, "click", 2) not in got
    assert dropped == 1

    # the identical plan in batch counts the late row: the delta is
    # exactly the watermark drop
    batch = windowed_counts(
        _df(spark, [("click", "00:00:10"), ("click", "00:05:00"),
                    ("click", "00:05:30"), ("click", "00:00:30"),
                    ("click", "00:06:00")]),
        "ts", keys=["event_type"], window="1 minute", watermark="1 minute",
    )
    b = {
        (r["window_start_us"], r["window_end_us"], r["event_type"], r["n"])
        for r in batch.collect()
    }
    assert (base, base + minute, "click", 2) in b
    assert len(b) == 3  # 00:00, 00:05, 00:06 windows all present in batch


def test_sliding_windows_batch(spark):
    df = _df(spark, [("a", "00:00:10"), ("a", "00:00:50"), ("a", "00:01:10")])
    out = windowed_counts(df, "ts", keys=["event_type"],
                          window="1 minute", slide="30 seconds")
    rows = {(r["window_start_us"], r["n"]) for r in out.collect()}
    base = 1704067200_000000
    # event 00:00:10 lands in windows starting 23:59:30 and 00:00:00, etc.
    assert (base, 2) in rows  # 00:00:00-00:01:00 holds 00:00:10 + 00:00:50
    assert (base + 30_000_000, 2) in rows  # 00:00:30-00:01:30 holds 00:00:50 + 00:01:10
