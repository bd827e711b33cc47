"""Build a scaled replica of an sf directory for MEASUREMENT ONLY.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r05.json recorded sf=1.0) whose tables we do not have.
This script approximates that scale locally: each table listed in REPLICATE
is unioned FACTOR times with its integer id columns offset per copy (so key
cardinality grows with the data instead of multiplying duplicates); other
tables are copied as-is. Output is written with multiple row groups so scans
parallelize the way a real large table would.

Usage: python BENCH/make_sf_replica.py [src_sf_dir] [dst_dir] [factor]
Default: /root/testdata/sf0.1 -> /dev/shm/sfr1.0, factor 10.

NOT part of any query path — timing harness input only.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nifi_processors_spark.session import get_spark  # noqa: E402

# table -> integer id columns to offset per copy (keeps ids unique)
REPLICATE = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
}
COPY = ["nation", "region", "supplier", "part"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/sfr1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_sf_replica")
    os.makedirs(dst, exist_ok=True)
    for name, id_cols in REPLICATE.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        offsets = {c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols}
        parts = []
        for i in range(factor):
            p = df
            for c, off in offsets.items():
                p = p.withColumn(c, (F.col(c) + F.lit(i * off)).cast(df.schema[c].dataType))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # ONE file per table, mimicking the driver's sf layout (single
        # parquet file, typically one row group — the scan-parallelism
        # worst case that fan_out exists for)
        out.coalesce(1).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: x{factor}")
    for name in COPY:
        t = f"{dst}/{name}.parquet"
        shutil.rmtree(t, ignore_errors=True)
        if os.path.exists(f"{src}/{name}.parquet"):
            shutil.copyfile(f"{src}/{name}.parquet", t)
            print(f"{name}: copied")
    spark.stop()


if __name__ == "__main__":
    main()
