"""Property test (VERDICT r3 #5): the stateful session kernel must
converge to BOTH the Spark batch-window oracle and a DuckDB SQL oracle
for EVERY partition of a time-ordered event stream into micro-batches.

The randomized micro-batch boundaries drive ``_sessionize_group``
directly through a faithful GroupState fake — hypothesis explores ~dozens
of boundary layouts per run, which a real streaming query per example
could never afford (each costs ~10 s of checkpoint machinery); the real
``applyInPandasWithState`` wiring of the same kernel is separately
covered end-to-end in test_stateful_stream.py."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_processors_spark.streaming.stateful import _sessionize_group, sessions_batch

GAP_US = 1_000_000


class FakeGroupState:
    """Mimics pyspark's GroupState surface used by _sessionize_group."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("state does not exist")
        return self._v

    def update(self, v):
        self._v = tuple(int(x) for x in v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def run_stateful(events, cuts):
    """Feed time-ordered events through the kernel in micro-batches split
    at the given indices; then flush open sessions via the timeout path."""
    chunks, prev = [], 0
    for c in cuts:
        if prev < c:
            chunks.append(events[prev:c])
            prev = c
    if prev < len(events):
        chunks.append(events[prev:])

    states, out = {}, []
    for chunk in chunks:
        by_key = {}
        for uid, ts in chunk:
            by_key.setdefault(uid, []).append(ts)
        for uid, ts_list in by_key.items():
            state = states.setdefault(uid, FakeGroupState())
            for res in _sessionize_group(
                (uid,), [pd.DataFrame({"ts_us": ts_list})], state, GAP_US
            ):
                out.extend(res.to_dict("records"))
    for uid, state in states.items():  # quiescence: timeout flush
        if state.exists:
            state.hasTimedOut = True
            for res in _sessionize_group((uid,), [], state, GAP_US):
                out.extend(res.to_dict("records"))
    return {
        (int(r["user_id"]), int(r["session_id"]), int(r["n_events"]),
         int(r["start_us"]), int(r["end_us"]))
        for r in out
    }


_DUCK_SQL = f"""
WITH w AS (
  SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER uw IS NULL
              OR ts_us - lag(ts_us) OVER uw > {GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW uw AS (PARTITION BY user_id ORDER BY ts_us)
),
r AS (
  SELECT user_id, ts_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM w
)
SELECT user_id, min(ts_us) AS session_id, count(*) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us
FROM r GROUP BY user_id, run
"""


@st.composite
def events_and_cuts(draw):
    events = draw(
        st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 20_000_000)),
            min_size=1, max_size=40,
        )
    )
    # time-ordered arrival across micro-batches (the stream contract the
    # file source + per-batch sort provide); disorder WITHIN a batch is
    # separately allowed and handled by the kernel's sort
    events.sort(key=lambda e: e[1])
    cuts = sorted(
        draw(st.lists(st.integers(0, len(events)), max_size=4))
    )
    return events, cuts


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ec=events_and_cuts())
def test_stateful_equals_batch_equals_duckdb(spark, ec):
    events, cuts = ec
    got = run_stateful(events, cuts)

    batch = {
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in sessions_batch(
            spark.createDataFrame(events, "user_id long, ts_us long"), gap_ms=1000
        ).collect()
    }
    assert got == batch

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE events (user_id BIGINT, ts_us BIGINT)")
        con.executemany("INSERT INTO events VALUES (?, ?)", events)
        duck = {tuple(int(x) for x in row) for row in con.execute(_DUCK_SQL).fetchall()}
    finally:
        con.close()
    assert got == duck


def test_boundary_every_event_its_own_batch(spark):
    """Worst-case fragmentation: one event per micro-batch must still
    produce the batch oracle's sessions."""
    events = [(1, 0), (1, 500_000), (1, 2_000_000), (2, 100), (2, 3_000_000)]
    events.sort(key=lambda e: e[1])
    got = run_stateful(events, list(range(1, len(events))))
    want = {
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in sessions_batch(
            spark.createDataFrame(events, "user_id long, ts_us long"), gap_ms=1000
        ).collect()
    }
    assert got == want
