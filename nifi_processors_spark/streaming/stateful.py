"""Custom stateful streaming operator: session windows over the change
stream via ``applyInPandasWithState``.

The reference has no event-time semantics at all (NiFi processes rows in
file order — SURVEY.md §2.9); this module covers the Structured
Streaming *custom stateful operator* surface the engine offers beyond
reference parity: per-key mutable state across micro-batches, Arrow
batch transfer (pandas per group — vectorized, never per row), and
explicit state timeouts.

Semantics: events for a key belong to one session until a gap larger
than ``gap_ms`` separates them; a CLOSED session is emitted when a later
event (or a processing-time timeout) proves the gap. Output rows:
(key, session_id, n_events, start_us, end_us). session_id is the
session's first event-time in microseconds — deterministic, no counters.

The same function doubles as a batch oracle helper (`sessions_batch`)
so tests can assert the streaming path converges to the plain-DataFrame
sessionization.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_us long, end_us long"
)
# open-session carryover between micro-batches
STATE_SCHEMA = "start_us long, last_us long, n long"


def _sessionize_group(
    key: Tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "session_id": start_us, "n_events": n,
              "start_us": start_us, "end_us": last_us}]
        )
        return

    ts_all = []
    for pdf in pdf_iter:
        ts_all.append(pdf["ts_us"])
    ts = pd.concat(ts_all).sort_values().to_numpy()

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = 0, 0, 0

    closed = []
    for t in ts:
        t = int(t)
        if n == 0:
            start_us = last_us = t
            n = 1
        elif t - last_us > gap_us:
            closed.append((start_us, last_us, n))
            start_us = last_us = t
            n = 1
        else:  # same session (late intra-batch events keep last_us's max)
            last_us = max(last_us, t)
            n += 1
    state.update((start_us, last_us, n))
    state.setTimeoutDuration(gap_us // 1000)  # flush the open session later
    if closed:
        yield pd.DataFrame(
            [{"user_id": user_id, "session_id": s, "n_events": k,
              "start_us": s, "end_us": e} for s, e, k in closed]
        )


def sessionize_stream(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """events: a STREAMING DataFrame with (user_id long, ts_us long).
    Returns the stream of CLOSED sessions. State: one open session per
    key, flushed by processing-time timeout after quiescence."""
    gap_us = gap_ms * 1000

    def fn(key, pdf_iter, state):
        return _sessionize_group(key, pdf_iter, state, gap_us)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessions_native(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Built-in session windows (``F.session_window``): JVM-side state,
    no Python in the loop — the engine's second sessionization story next
    to the custom ``applyInPandasWithState`` kernel, and the one to
    prefer at scale when the custom state logic isn't needed (same plan
    shape batch and streaming, state handled by the native operator).

    Boundary alignment: Spark merges an event into the open session when
    its time is <= the session's end (last event + gap) — INCLUSIVE, so
    an event exactly ``gap`` after the previous one continues the
    session, and the split condition is ``delta > gap``: identical to
    ``sessions_batch``/the stateful kernel (asserted, including the
    exact-boundary case, in tests/test_round5_ops.py). Same output shape
    as ``sessions_batch``: (user_id, session_id, n_events, start_us,
    end_us)."""
    gap_us = gap_ms * 1000
    return (
        events.withColumn("_ts", F.timestamp_micros(F.col("ts_us")))
        .groupBy("user_id", F.session_window("_ts", f"{gap_us} microseconds"))
        .agg(
            F.min("ts_us").alias("session_id"),
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
        .select("user_id", "session_id", "n_events", "start_us", "end_us")
    )


def sessions_batch(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Batch oracle: the same session windows via plain window functions
    (one shuffle). Returns ALL sessions, including still-open ones."""
    from pyspark.sql import Window

    gap_us = gap_ms * 1000
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    run = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.withColumn("_new", new_sess)
        .withColumn("_run", run)
        .groupBy("user_id", "_run")
        .agg(
            F.min("ts_us").alias("session_id"),
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
        .drop("_run")
    )
