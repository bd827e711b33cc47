"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline metric: the CDC apply pipeline — change-events/sec applied
end-to-end (tail -> envelope -> LWW dedup -> bucketed MERGE -> checkpoint)
on a deterministic synthetic change log sized to the scale factor
(BASELINE.json.metric). Plus per-query wall times for the operator suite
over the driver's sf tables.

Query timing uses the noop sink (full computation, no write cost);
the CDC apply timing includes its real parquet writes + snapshot commits —
that IS the operator.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from nifi_processors_spark.operators.apply import ChangeApplier  # noqa: E402
from nifi_processors_spark.session import get_spark  # noqa: E402
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log  # noqa: E402

BENCH_QUERIES = [
    "lww_dedup_events",
    "cdc_state_events",
    "rule_counters",
    "rule_detail_explode",
    "metrics_rollup",
    "template_render",
    "exact_dedup",
    "token_counts",
    "lang_id",
    "fingerprint",
    "ann_topk",
    "minhash_neardup",
]

# CDC changelog size per scale factor (events; content ~300-800 B each)
EVENTS_BY_SF = {"0.001": 50_000, "0.01": 200_000, "0.1": 1_000_000}


def sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf = sf_of(sf_dir)
    n_events = int(
        os.environ.get("SPARK_GRAFT_BENCH_EVENTS", EVENTS_BY_SF.get(sf, 200_000))
    )
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="cdc_bench_", dir=shm)
    # tmpfs for shuffle/table I/O: the sandbox disk swings 10x run-to-run
    spark = get_spark("bench", cores=cpus, extra_conf={"spark.local.dir": f"{work}/sparktmp"})

    queries = entry_mod.queries()
    q_times: dict[str, float] = {}
    q_trials = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_TRIALS", "2"))
    for name in BENCH_QUERIES:
        queries[name](spark, sf_dir).count()  # warm: plan + scan metadata
    # best-of-N, trials INTERLEAVED across the suite (same treatment as the
    # apply headline): host throttling stalls multi-minute windows, so two
    # adjacent runs of one query can both land in a bad window — spreading
    # a query's trials apart makes the per-query minimum meaningful
    for _ in range(q_trials):
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            run_noop(queries[name](spark, sf_dir))
            sec = round(time.monotonic() - t0, 3)
            q_times[name] = min(q_times.get(name, sec), sec)

    # ---- CDC apply: the headline ----
    # The host throttles multi-threaded JVM work in multi-minute stretches
    # with 0% guest-visible steal (identical runs swing 2-4x). Interleave
    # best-of-N trials per merge mode — contention only ever slows a run
    # down, so the per-mode minimum approximates the clean-machine number.
    n_epochs = 4
    # 3 base draws per mode (plus adaptive extras below): on this host a
    # bad window shows 2-6x wall swings between identical runs, and the
    # per-mode minimum needs enough draws to land in a clean stretch
    n_trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    try:
        cfg = GenLogConfig(
            n_events=n_events, n_epochs=n_epochs, content_blocks_max=8,
            n_keys=max(n_events // 4, 64)
        )
        write_change_log(spark, cfg, f"{work}/changelog")
        # warmup: same plan shapes, tiny data (JIT + codegen out of the timing)
        wcfg = GenLogConfig(n_events=20000, n_epochs=2, content_blocks_max=8, n_keys=5000)
        write_change_log(spark, wcfg, f"{work}/warm_cl")
        ChangeApplier(spark, f"{work}/warm_t", f"{work}/warm_cl", f"{work}/warm_s",
                      n_buckets=max(cpus * 2, 16)).run()

        steady_rates: list[float] = []

        def one_trial(tag: str, mode: str) -> float:
            ap = ChangeApplier(
                spark,
                table_path=f"{work}/table_{tag}",
                changelog_dir=f"{work}/changelog",
                state_dir=f"{work}/state_{tag}",
                n_buckets=max(cpus * 2, 16),
                merge_mode=mode,
                compact_every=n_epochs if mode == "mor" else None,
            )
            t0 = time.monotonic()
            recs = ap.run()
            sec = time.monotonic() - t0
            # steady-state rate from the SAME run's per-epoch metrics:
            # epoch 0 pays the one-time bootstrap (schema detection + table
            # creation) a production table never re-pays; epochs 1..n are
            # the 100 TB-relevant number. Headline stays the full wall for
            # round-to-round comparability.
            if len(recs) > 1:
                tail_rows = sum(r["rows_in"] for r in recs[1:])
                tail_sec = sum(r["wall_ms"] for r in recs[1:]) / 1000.0
                if tail_sec > 0:
                    steady_rates.append(tail_rows / tail_sec)
            one_trial.rows = ap.state().count()
            shutil.rmtree(f"{work}/table_{tag}", ignore_errors=True)
            shutil.rmtree(f"{work}/state_{tag}", ignore_errors=True)
            return sec

        cow_secs, mor_secs = [], []
        final_rows = None
        for t in range(n_trials):
            cow_secs.append(one_trial(f"cow{t}", "cow"))
            rows_cow = one_trial.rows
            mor_secs.append(one_trial(f"mor{t}", "mor"))
            assert one_trial.rows == rows_cow
            final_rows = rows_cow
        # adaptive extras: a max/min spread ~1 means the window was clean
        # and the minimum is trustworthy; a 2x+ spread is the hypervisor
        # throttle signature (r03 recorded a 25% headline dip from exactly
        # this), so buy up to SPARK_GRAFT_BENCH_EXTRA more draws per mode —
        # clean windows pay nothing
        extra = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "3"))
        t = n_trials
        while extra > 0 and (
            max(cow_secs) / min(cow_secs) > 1.5 or max(mor_secs) / min(mor_secs) > 1.5
        ):
            cow_secs.append(one_trial(f"cow{t}", "cow"))
            mor_secs.append(one_trial(f"mor{t}", "mor"))
            assert one_trial.rows == final_rows
            t += 1
            extra -= 1
        apply_sec = min(cow_secs)
        mor_sec = min(mor_secs)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    best_sec = min(apply_sec, mor_sec)
    out = {
        "metric": "cdc_apply_events_per_sec",
        "value": round(n_events / best_sec, 1),
        "merge_mode_of_value": "cow" if apply_sec <= mor_sec else "mor",
        "unit": "sec",
        "queries": {**q_times, "cdc_apply": round(apply_sec, 3), "cdc_apply_mor": round(mor_sec, 3)},
        "sf": sf,
        "cpus": cpus,
        "cdc_events": n_events,
        "cdc_epochs": n_epochs,
        "cdc_final_rows": final_rows,
        "mor_events_per_sec": round(n_events / mor_sec, 1),
        "steady_state_events_per_sec": round(max(steady_rates), 1) if steady_rates else None,
        "apply_trials_sec": {"cow": [round(s, 2) for s in cow_secs],
                             "mor": [round(s, 2) for s in mor_secs]},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
