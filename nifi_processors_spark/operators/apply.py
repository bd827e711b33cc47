"""The CDC apply loop: change-tail -> typed envelopes -> LWW dedup ->
schema-evolving MERGE -> checkpoint + metrics.

This is the Spark-native replacement for the reference's flagship flow
(GetFile -> SplitText -> ExecuteRuleEngine -> RouteOnAttribute -> PutFile,
reference: ExecuteRuleEngine_Example.xml:18-23): instead of a per-record
interpreted loop (ExecuteRuleEngine.java:438-565), each *epoch* of the
change log is applied as one declarative DataFrame plan —

    read epoch parquet (predicate/column pruning free via Catalyst)
      -> ONE stats job: per-bucket counts + full-epoch payload schema
         (schema_of_variant_agg — drift detection sees EVERY row, so a
         v2 payload appearing mid-epoch is never silently dropped)
      -> icelite ALTER, then registry version persist (in that order:
         a crash between them leaves the registry behind the table,
         which the tolerant diff repairs on replay — never ahead)
      -> from_json envelope parse (corrupt / null-key rows quarantined,
         not fatal)
      -> window LWW dedup on (repo, path) by (commit_seq, event_seq)
      -> copy-on-write bucketed MERGE (only touched buckets rewritten)
      -> epoch commit marker (exactly-once) + lineage/metrics record

Scale notes: an epoch costs exactly TWO Spark jobs on the happy path —
the skinny per-bucket stats/drift aggregation (column-pruned scan, and
the drift agg rides in the same job) and the merge itself (window over
state ∪ events, one key shuffle, bucket-clustered write); a third job
runs only when corrupt rows need quarantining. Within-epoch dedup is
folded into the merge window. Only affected buckets of the target are
read/rewritten. Everything stays JVM-side (no Python row loop anywhere).
Hot-repo skew cannot stall the window because the partition key is the
full (repo, path); the merge spreads buckets evenly by hash.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..metrics import MetricsLog
from ..plans import fsio
from ..plans.checkpoint import CheckpointLog
from ..plans.registry import (
    SchemaRegistry,
    fields_from_variant_schema,
    merge_field_sets,
    payload_schema_agg,
    to_struct,
    _SPARK_TYPE,
)
from ..plans.table import IceliteTable, bucket_expr
from .envelope import corrupt_flag, parse_envelope

ENVELOPE_KEY = ["repo", "path"]
ENVELOPE_COLS = ["repo", "path", "op", "commit", "commit_seq", "event_seq"]


class ChangeApplier:
    """Owns one target table + its changelog + checkpoint/metrics state."""

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        changelog_dir: str,
        state_dir: str,
        n_buckets: int = 32,
        rename_hints: dict[str, str] | None = None,
        collect_metrics: bool = True,
        merge_mode: str = "cow",
        compact_every: int | None = None,
    ):
        """``merge_mode``: 'cow' rewrites touched buckets per epoch (read
        cost stays flat); 'mor' appends delta files (write cost scales with
        the change-set, reads resolve LWW until ``compact_every`` epochs
        trigger a compaction — the right trade when epochs are small
        relative to the table, the common 100 TB shape)."""
        self.spark = spark
        self.table_path = table_path
        self.changelog_dir = changelog_dir
        self.checkpoints = CheckpointLog(fsio.join(state_dir, "checkpoints"))
        self.metrics = MetricsLog(fsio.join(state_dir, "metrics"))
        self.registry = SchemaRegistry(
            fsio.join(state_dir, "schema_registry.json"), rename_hints
        )
        self.quarantine_dir = fsio.join(state_dir, "quarantine")
        self.n_buckets = n_buckets
        self.collect_metrics = collect_metrics
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"merge_mode must be 'cow' or 'mor', got {merge_mode!r}")
        self.merge_mode = merge_mode
        self.compact_every = compact_every
        self._epochs_since_compact = 0

    # ------------- discovery -------------

    def discover_epochs(self) -> list[int]:
        out = []
        for entry in fsio.listdir(self.changelog_dir):
            if entry.startswith("epoch="):
                out.append(int(entry.split("=", 1)[1]))
        return sorted(out)

    def pending_epochs(self) -> list[int]:
        return self.checkpoints.pending(self.discover_epochs())

    def _epoch_dir(self, epoch: int) -> str:
        return fsio.join(self.changelog_dir, f"epoch={epoch}")

    def read_epoch(self, epoch: int) -> DataFrame:
        return self.spark.read.parquet(self._epoch_dir(epoch)).withColumn(
            "epoch", F.lit(epoch).cast("long")
        )

    # ------------- table bootstrap / evolution -------------

    def _table(self) -> IceliteTable | None:
        if IceliteTable.exists(self.table_path):
            return IceliteTable(self.spark, self.table_path)
        return None

    def _ensure_table(self, payload_fields: list[tuple[str, str]]) -> IceliteTable:
        t = self._table()
        if t is not None:
            return t
        schema = T.StructType(
            [
                T.StructField("repo", T.StringType(), False),
                T.StructField("path", T.StringType(), False),
                T.StructField("commit", T.StringType(), True),
            ]
            + [T.StructField(n, _SPARK_TYPE[ty], True) for n, ty in payload_fields]
        )
        return IceliteTable.create(
            self.spark, self.table_path, schema, key=ENVELOPE_KEY, n_buckets=self.n_buckets
        )

    def _rename_resolver(self) -> dict[str, str]:
        """Cumulative old-name -> current-name map across registry versions."""
        resolve: dict[str, str] = {}
        cur = self.registry._load()["versions"]
        for ver in cur:
            for old, new in ver.get("renames", {}).items():
                # re-point any chain ending at `old`
                for k, v in list(resolve.items()):
                    if v == old:
                        resolve[k] = new
                resolve[old] = new
        return resolve


    # ------------- the apply -------------

    def apply_epoch(self, epoch: int, crash: Callable[[str, int], None] | None = None) -> dict:
        """Apply one changelog epoch. ``crash(point, epoch)`` is a test hook
        invoked at 'after_merge' (before the marker) for crash-resume tests."""
        input_files = sorted(
            fsio.join(self._epoch_dir(epoch), f)
            for f in fsio.listdir(self._epoch_dir(epoch))
            if f.endswith(".parquet")
        )
        return self.apply_batch_df(self.read_epoch(epoch), epoch, input_files, crash)

    def apply_batch_df(
        self,
        raw: DataFrame,
        epoch: int,
        input_files: list[str] | None = None,
        crash: Callable[[str, int], None] | None = None,
        marker: int | str | None = None,
    ) -> dict:
        """Apply one micro-batch of change events (envelope columns +
        payload_json). Used by both the batch epoch loop and the Structured
        Streaming foreachBatch front-end (streaming/stream.py — which passes
        a namespaced ``marker`` so streaming micro-batch ids can never
        collide with batch changelog epochs)."""
        t0 = time.monotonic()
        input_files = input_files or []

        existing = self._table()
        nb = existing.snapshot()["n_buckets"] if existing is not None else self.n_buckets

        # 1. ONE stats+drift job: per-bucket row/delete/bad counts AND the
        #    full-epoch payload schema (variant agg) in a single skinny
        #    aggregation — the scan prunes to key/op/payload_json columns.
        #    Deliberately NOT cached: caching would force materializing
        #    `content` (measured 2.5x slower at 8 cores than re-scanning in
        #    the merge). "bad" = malformed JSON payload (schema-free
        #    detection) or a null key/op column (a malformed envelope must
        #    quarantine, not silently vanish in the merge window).
        is_corrupt = corrupt_flag(F.col("payload_json"), T.StructType([]))
        is_badkey = (
            F.col("repo").isNull() | F.col("path").isNull() | F.col("op").isNull()
        )
        is_bad = is_corrupt | is_badkey
        per_bucket = (
            raw.withColumn("_b", bucket_expr(ENVELOPE_KEY, nb))
            .groupBy("_b")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.when((F.col("op") == "D") & ~is_bad, 1).otherwise(0)).alias("dels"),
                F.sum(is_bad.cast("int")).alias("bad"),
                payload_schema_agg(F.when(~is_bad, F.col("payload_json"))).alias("vschema"),
            )
            .collect()
        )
        epoch_fields = merge_field_sets(
            [fields_from_variant_schema(r["vschema"]) for r in per_bucket]
        )

        # 2. drift: diff (pure) -> icelite ALTER -> registry persist, in that
        #    order. A crash after the ALTER leaves the registry behind; on
        #    replay the diff recomputes and the tolerant filter below skips
        #    the already-applied parts. (The registry can never be AHEAD of
        #    the table under this ordering — that was the old silent-null
        #    crash window.)
        table = self._ensure_table(epoch_fields)
        # late-arriving rows can still carry ALREADY-RENAMED field names
        # (e.g. v1 'lang' events landing epochs after lang->language):
        # resolve through the cumulative rename chain before diffing, else
        # the old name would be re-added as a fresh column
        resolve_pre = self._rename_resolver()
        diff_fields = (
            merge_field_sets([[(resolve_pre.get(n, n), t) for n, t in epoch_fields]])
            if resolve_pre
            else epoch_fields
        )
        cur, renames, adds = self.registry.diff(diff_fields)
        if cur is None:
            ver = self.registry.register(epoch_fields, epoch)
        else:
            tcols = set(table.field_names())
            eff_renames = {o: n for o, n in renames.items() if o in tcols and n not in tcols}
            eff_adds = [(n, ty) for n, ty in adds if n not in tcols]
            if eff_renames or eff_adds:
                table.alter(
                    eff_renames,
                    [(n, _SPARK_TYPE[ty]) for n, ty in eff_adds],
                    lineage={"op": "alter", "epoch": epoch, "renames": eff_renames,
                             "adds": [n for n, _ in eff_adds]},
                )
                if crash is not None:
                    crash("after_alter", epoch)
            ver = self.registry.commit_version(renames, adds, epoch) if (renames or adds) else cur

        # 3. typed envelope parse + rename-chain resolution. A mid-epoch
        #    rename (hinted) means one epoch carries BOTH names: v1 rows
        #    populate the old column, v2 rows the new one — coalesce them
        #    into the current name so no row loses its value.
        parsed = parse_envelope(raw, to_struct(epoch_fields))
        resolve = self._rename_resolver()
        for old, new in resolve.items():
            if old in parsed.columns and new not in parsed.columns:
                parsed = parsed.withColumnRenamed(old, new)
            elif old in parsed.columns and new in parsed.columns:
                parsed = parsed.withColumn(new, F.coalesce(F.col(new), F.col(old))).drop(old)

        # 4. align to current table columns (null for cols this epoch lacks);
        #    within-epoch LWW dedup is subsumed by the merge window — one
        #    key-shuffle per epoch instead of two
        snap = table.snapshot()
        data_cols = table.field_names(snap)
        sel = []
        for c in data_cols:
            if c in parsed.columns:
                sel.append(F.col(c))
            else:
                ftype = next(
                    f["type"] for f in snap["schemas"][str(snap["schema_version"])]
                    if f["name"] == c
                )
                from ..plans.table import _type_from_json
                sel.append(F.lit(None).cast(_type_from_json(ftype)).alias(c))
        events = parsed.select(*sel, "op", "commit_seq", "event_seq", "_corrupt")
        events = events.withColumn(
            "_corrupt",
            F.col("_corrupt") | F.col("repo").isNull() | F.col("path").isNull()
            | F.col("op").isNull(),
        )

        n_corrupt = int(sum(r["bad"] for r in per_bucket))
        if n_corrupt > 0:
            # the reference's per-row 'failure' relationship
            # (ExecuteRuleEngine.java:477-481,610-662): corrupt rows land in a
            # quarantine table with their raw payload, the epoch proceeds
            quarantine = raw.filter(
                corrupt_flag(F.col("payload_json"), to_struct(epoch_fields)) | is_badkey
            )
            # per-epoch dir + overwrite => crash-replays stay idempotent
            quarantine.drop("epoch").write.mode("overwrite").parquet(
                fsio.join(self.quarantine_dir, f"epoch={epoch}")
            )
        affected = sorted(int(r["_b"]) for r in per_bucket if r["rows"] > r["bad"])
        stats_extra = {
            "rows_upserted": int(sum(r["rows"] - r["dels"] - r["bad"] for r in per_bucket)),
            "rows_deleted": int(sum(r["dels"] for r in per_bucket)),
            "partitions": [
                {"bucket": int(r["_b"]), "rows": int(r["rows"])} for r in per_bucket
            ],
        }
        changes = events.filter(~F.col("_corrupt")).drop("_corrupt")

        # 5. MERGE — copy-on-write, or merge-on-read delta append
        merge_fn = table.merge if self.merge_mode == "cow" else table.merge_mor
        new_sid, mstats = merge_fn(
            changes,
            lineage={"op": "merge", "mode": self.merge_mode, "epoch": epoch,
                     "input_files": input_files},
            affected=affected,
        )
        if self.merge_mode == "mor" and self.compact_every:
            self._epochs_since_compact += 1
            if self._epochs_since_compact >= self.compact_every:
                # bucket-scoped: only buckets that accumulated deltas are
                # rewritten; cold buckets keep their files byte-for-byte
                new_sid = table.compact(
                    lineage={"op": "compact", "epoch": epoch}, min_deltas=1
                )
                self._epochs_since_compact = 0

        if crash is not None:
            crash("after_merge", epoch)

        # 6. metrics + exactly-once marker
        rec = {
            "epoch": epoch,
            "snapshot_id": new_sid,
            "rows_in": int(sum(r["rows"] for r in per_bucket)),
            "rows_corrupt": n_corrupt,
            "affected_buckets": mstats.get("affected_buckets"),
            "wall_ms": int((time.monotonic() - t0) * 1000),
            "schema_version": ver["version"],
            "input_files": input_files,
            **stats_extra,
        }
        if self.collect_metrics:
            self.metrics.append(rec)
        self.checkpoints.commit(epoch if marker is None else marker, {"snapshot_id": new_sid})
        return rec

    def run(self, crash: Callable[[str, int], None] | None = None) -> list[dict]:
        """Apply all pending epochs in order (exactly-once via markers)."""
        out = []
        for e in self.pending_epochs():
            out.append(self.apply_epoch(e, crash=crash))
        return out

    def state(self) -> DataFrame:
        t = self._table()
        if t is None:
            raise RuntimeError("table not created yet")
        return t.read()
