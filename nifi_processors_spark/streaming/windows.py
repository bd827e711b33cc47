"""Event-time windowed aggregation with watermark-based late-data
handling — the same declarative plan for batch and streaming.

The reference has no event-time semantics (NiFi processes rows in file
order, SURVEY.md §2.9); this covers the Structured Streaming windowed-agg
surface the engine offers beyond reference parity: tumbling/sliding
windows over an event-time column, with a watermark bounding how late a
row may arrive before it is dropped (streaming) — which is what lets the
store discard window state instead of keeping it forever.

One function serves both modes: on a batch DataFrame the watermark is a
no-op (Spark ignores withWatermark in batch), so tests and oracles can
run the identical plan and compare closed windows bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    keys: list[str] | None = None,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time windows keyed by
    ``keys``: (window_start_us, window_end_us, *keys, n, *aggs). In
    streaming append mode a window emits once its end passes the
    watermark — late rows beyond the watermark are dropped, the explicit
    retention trade that bounds window state at scale."""
    e = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    out = e.groupBy(w.alias("_w"), *(keys or [])).agg(
        F.count("*").alias("n"), *(aggs or [])
    )
    return out.select(
        F.unix_micros("_w.start").alias("window_start_us"),
        F.unix_micros("_w.end").alias("window_end_us"),
        *[c for c in out.columns if c != "_w"],
    )
