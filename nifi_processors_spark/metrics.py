"""Per-epoch / per-partition lineage + metrics (the provenance analogue).

The reference reports provenance events per flow file
(reference: SplitToAttribute.java:207, GenerateData.java:225) and writes
rule counters to attributes (ExecuteRuleEngine.java:1002-1028). The target
emits an explicit metrics record per applied epoch — rows in/deduped/
corrupt, affected buckets, per-bucket row counts (the "per-partition"
lineage), input files, snapshot id, wall time — appended as JSON lines
and readable back as a DataFrame for rollup queries.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_upserted", T.LongType()),
        T.StructField("rows_deleted", T.LongType()),
        T.StructField("rows_corrupt", T.LongType()),
        T.StructField("affected_buckets", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("schema_version", T.LongType()),
        T.StructField("input_files", T.ArrayType(T.StringType())),
        T.StructField(
            "partitions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("bucket", T.IntegerType()),
                        T.StructField("rows", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


class MetricsLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def append(self, rec: dict[str, Any]) -> None:
        tmp = os.path.join(self.path, f".tmp.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, os.path.join(self.path, f"epoch_{rec['epoch']}.json"))

    def records(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.path)):
            if fn.startswith("epoch_") and fn.endswith(".json"):
                with open(os.path.join(self.path, fn)) as f:
                    out.append(json.load(f))
        return out

    def as_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.records(), METRICS_SCHEMA)
