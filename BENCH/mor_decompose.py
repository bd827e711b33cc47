"""Decompose the MOR epoch cost: parse/align plan vs +shuffle vs full
delta write (noop-sink isolation per guide §1.4). Measurement aid only.

Usage: python BENCH/mor_decompose.py [n_events]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nifi_processors_spark.operators.apply import ChangeApplier  # noqa: E402
from nifi_processors_spark.operators.envelope import VARIANT_COL, parse_envelope  # noqa: E402
from nifi_processors_spark.plans.registry import to_struct  # noqa: E402
from nifi_processors_spark.plans.table import bucket_expr  # noqa: E402
from nifi_processors_spark.session import get_spark  # noqa: E402
from nifi_processors_spark.sources.genlog import GenLogConfig, write_change_log  # noqa: E402


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    work = tempfile.mkdtemp(prefix="mordec_", dir="/dev/shm")
    spark = get_spark("mor_decompose", cores=cpus,
                      extra_conf={"spark.local.dir": f"{work}/sparktmp"})
    cfg = GenLogConfig(n_events=n_events, n_epochs=4, content_blocks_max=8,
                       n_keys=max(n_events // 4, 64))
    write_change_log(spark, cfg, f"{work}/changelog")

    # one applied epoch so the table + registry exist
    ap = ChangeApplier(spark, f"{work}/t", f"{work}/changelog", f"{work}/s",
                       n_buckets=max(cpus * 2, 16), merge_mode="mor")
    ap.apply_epoch(0)
    table = ap._table()
    nb = table.snapshot()["n_buckets"]
    width = table._merge_partitions(nb)

    def changes_df():
        raw = ap.read_epoch(1)
        reg_fields, parse_fields, resolve = ap._parse_plan()
        raw_v = raw.withColumn(VARIANT_COL, F.try_parse_json(F.col("payload_json")))
        return ap._build_changes(raw_v, parse_fields, resolve, table)

    def delta_df():
        ch = changes_df().withColumn("_bucket", bucket_expr(["repo", "path"], nb))
        data_cols = table.field_names()
        return ch.select(
            *[F.col(c) for c in data_cols],
            F.col("commit_seq").alias("_commit_seq"),
            F.col("event_seq").alias("_event_seq"),
            F.lit(99).cast("long").alias("_delta_seq"),
            (F.col("op") == "D").alias("_deleted"),
            F.col("_bucket"),
        )

    def t_noop(df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    def t_write(df, tag):
        out = f"{work}/w_{tag}"
        t0 = time.monotonic()
        df.repartition(width, F.col("_bucket")).write.mode("overwrite") \
            .partitionBy("_bucket").parquet(out)
        sec = round(time.monotonic() - t0, 3)
        shutil.rmtree(out, ignore_errors=True)
        return sec

    # raw scan floor: payload read without parse
    def raw_df():
        return ap.read_epoch(1)

    res: dict[str, list[float]] = {}
    for trial in range(3):
        for name, fn in (
            ("raw_scan_noop", lambda: t_noop(raw_df())),
            ("parse_align_noop", lambda: t_noop(changes_df())),
            ("delta_cols_noop", lambda: t_noop(delta_df())),
            ("delta_shuffle_noop", lambda: t_noop(
                delta_df().repartition(width, F.col("_bucket")))),
            ("delta_full_write", lambda: t_write(delta_df(), f"{trial}")),
        ):
            spark.sparkContext.setJobDescription(f"{name} t{trial}")
            res.setdefault(name, []).append(fn())
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "events_per_epoch": n_events // 4,
        "mins": {k: min(v) for k, v in res.items()},
        "all": res,
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
