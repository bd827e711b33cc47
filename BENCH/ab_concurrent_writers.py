"""Interleaved A/B: spark.sql.maxConcurrentOutputFileWriters for the MOR
delta write (unsorted partitionBy write pays a per-task Sort by _bucket).

Usage: python BENCH/ab_concurrent_writers.py [mode] [n_events] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_processors_spark.operators.apply import ChangeApplier  # noqa: E402
from nifi_processors_spark.session import get_spark  # noqa: E402
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "mor"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    work = tempfile.mkdtemp(prefix="abw_", dir="/dev/shm")
    spark = get_spark("ab_writers", cores=cpus,
                      extra_conf={"spark.local.dir": f"{work}/sparktmp"})
    cfg = GenLogConfig(n_events=n_events, n_epochs=4, content_blocks_max=8,
                       n_keys=max(n_events // 4, 64))
    write_change_log(spark, cfg, f"{work}/changelog")
    wcfg = GenLogConfig(n_events=20000, n_epochs=2, content_blocks_max=8, n_keys=5000)
    write_change_log(spark, wcfg, f"{work}/warm_cl")
    ChangeApplier(spark, f"{work}/warm_t", f"{work}/warm_cl", f"{work}/warm_s",
                  n_buckets=max(cpus * 2, 16), merge_mode=mode,
                  compact_every=4 if mode == "mor" else None).run()

    walls: dict[str, list[float]] = {"off": [], "on": []}
    rows: dict[str, int] = {}
    t = 0
    for _ in range(trials):
        for variant in ("off", "on"):
            spark.conf.set("spark.sql.maxConcurrentOutputFileWriters",
                           "16" if variant == "on" else "0")
            ap = ChangeApplier(spark, f"{work}/t{t}", f"{work}/changelog",
                               f"{work}/s{t}", n_buckets=max(cpus * 2, 16),
                               merge_mode=mode,
                               compact_every=4 if mode == "mor" else None)
            t0 = time.monotonic()
            ap.run()
            walls[variant].append(round(time.monotonic() - t0, 2))
            rows[variant] = ap.state().count()
            shutil.rmtree(f"{work}/t{t}", ignore_errors=True)
            shutil.rmtree(f"{work}/s{t}", ignore_errors=True)
            t += 1
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
    print(json.dumps({
        "mode": mode, "events": n_events,
        "walls": walls,
        "min_off": min(walls["off"]), "min_on": min(walls["on"]),
        "rows": rows,
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
