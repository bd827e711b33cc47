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

from typing import Any

from .plans import fsio

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType()),
        # namespaced apply key: str(epoch) for batch, 'stream_<id>_<n>' for
        # streaming micro-batches — keeps a shared state_dir collision-free
        T.StructField("marker", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_upserted", T.LongType()),
        T.StructField("rows_deleted", T.LongType()),
        T.StructField("rows_corrupt", T.LongType()),
        T.StructField("affected_buckets", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("schema_version", T.LongType()),
        T.StructField("input_files", T.ArrayType(T.StringType())),
        # set on epochs the staleness guard skipped (marker-loss replay of
        # an epoch wholly below the tombstone-expiry watermark)
        T.StructField("skipped_stale", T.BooleanType()),
        T.StructField("tombstone_watermark", T.LongType()),
        # commit_seq high-water mark across all epochs applied so far —
        # lets a fresh process derive the tombstone-expiry watermark
        T.StructField("max_commit_seq", T.LongType()),
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
        fsio.makedirs(path)

    def append(self, rec: dict[str, Any]) -> None:
        key = rec.get("marker") or rec["epoch"]
        fsio.write_json_atomic(fsio.join(self.path, f"epoch_{key}.json"), rec)

    def has(self, key) -> bool:
        """Was a record ever written for this apply key? Records land
        BEFORE the exactly-once marker, so they survive marker loss —
        which makes this the corroborating evidence the staleness guard
        uses to distinguish a replay from genuinely new data."""
        return fsio.exists(fsio.join(self.path, f"epoch_{key}.json"))

    def max_commit_seq(self) -> int | None:
        """Highest recorded commit_seq high-water mark, or None if no
        record carries one (pre-round-4 logs / no epochs applied)."""
        vals = [
            r["max_commit_seq"]
            for r in self.records()
            if r.get("max_commit_seq") is not None
        ]
        return max(vals) if vals else None

    def records(self) -> list[dict]:
        out = []
        for fn in sorted(fsio.listdir(self.path)):
            if fn.startswith("epoch_") and fn.endswith(".json"):
                out.append(fsio.read_json(fsio.join(self.path, fn)))
        return out

    def as_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.records(), METRICS_SCHEMA)
