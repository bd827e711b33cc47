"""Phase breakdown of ChangeApplier.apply_batch_df via monkeypatched
timers — measurement aid only (bench.py owns the headline methodology).

Usage: python BENCH/apply_phases.py [cow|mor] [n_events]
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
from nifi_processors_spark.plans.table import IceliteTable  # noqa: E402
from nifi_processors_spark.session import get_spark  # noqa: E402
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log  # noqa: E402

PHASES: list[dict] = []


def timed(cls, name):
    orig = getattr(cls, name)

    def wrap(*a, **kw):
        t0 = time.monotonic()
        out = orig(*a, **kw)
        PHASES.append({"phase": name, "sec": round(time.monotonic() - t0, 3)})
        return out

    setattr(cls, name, wrap)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "mor"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    work = tempfile.mkdtemp(prefix="phase_", dir="/dev/shm")
    spark = get_spark("apply_phases", cores=cpus,
                      extra_conf={"spark.local.dir": f"{work}/sparktmp"})
    cfg = GenLogConfig(n_events=n_events, n_epochs=4, content_blocks_max=8,
                       n_keys=max(n_events // 4, 64))
    write_change_log(spark, cfg, f"{work}/changelog")

    timed(IceliteTable, "merge")
    timed(IceliteTable, "merge_mor")
    timed(IceliteTable, "compact")
    timed(IceliteTable, "read")
    timed(IceliteTable, "_commit")
    timed(ChangeApplier, "_build_changes")
    timed(ChangeApplier, "read_epoch")

    # warmup (JIT/codegen), same as bench.py
    wcfg = GenLogConfig(n_events=20000, n_epochs=2, content_blocks_max=8, n_keys=5000)
    write_change_log(spark, wcfg, f"{work}/warm_cl")
    ChangeApplier(spark, f"{work}/warm_t", f"{work}/warm_cl", f"{work}/warm_s",
                  n_buckets=max(cpus * 2, 16)).run()
    PHASES.clear()

    ap = ChangeApplier(spark, f"{work}/table", f"{work}/changelog",
                       f"{work}/state", n_buckets=max(cpus * 2, 16),
                       merge_mode=mode,
                       compact_every=4 if mode == "mor" else None)
    t0 = time.monotonic()
    recs = ap.run()
    wall = time.monotonic() - t0
    print(json.dumps({
        "mode": mode, "events": n_events, "wall_sec": round(wall, 2),
        "epoch_wall_ms": [r["wall_ms"] for r in recs],
        "phases": PHASES,
    }, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
