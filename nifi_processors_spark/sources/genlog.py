"""Deterministic synthetic change-log generator (the GenerateData analogue).

The reference's ``GenerateData`` processor emits synthetic CSV rows from
word lists / regex / random generators configured by an XML row layout
(reference: src/main/java/com/datamelt/nifi/processors/GenerateData.java:66-246,
docs/com.datamelt.nifi.processors.GenerateData/additionalDetails.html).

This module re-expresses that as a *pure-expression* Spark generator:
``spark.range(n)`` plus sha256-derived columns. Every value is a pure
function of ``(seed, id)`` — no RNG state, no wall clock — so any two
runs at any parallelism produce byte-identical rows (FIXTURES.md §1-3).

  * word-list field type  -> ``element_at(array(lits...), 1 + h % k)``
  * regex field type      -> ``format_string`` over hash parts
  * random field type     -> sha256 hex chains (deterministic)

It generates the binlog/WAL-style ``change_events`` envelope of
FIXTURES.md §2 over the ``repo_files`` key space of FIXTURES.md §1:

  repo, path, op ('I'|'U'|'D'), commit (40-hex), commit_seq, event_seq,
  epoch, payload_json

Semantics baked in (and exercised by tests):
  * LWW total order == (commit_seq, event_seq) == generator ``id``.
  * ~5% of events land in a *later* epoch than their commit order
    (out-of-commit-order across epochs — LWW must still win).
  * key space is much smaller than the event count -> same key updated
    repeatedly, incl. twice within one epoch; deletes interleave.
  * 20% of keys live in 3 hot repos (Zipf-ish skew fixture for salting).
  * payload schema v1 ``{lang, content}`` switches to v2
    ``{language, content, size_bytes}`` at ``evolve_at_epoch``
    (mid-stream rename + add, FIXTURES.md §3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "scala", "js", "go", "rs", "md"]
EXT = {"py": "py", "java": "java", "scala": "scala", "js": "js", "go": "go", "rs": "rs", "md": "md"}


@dataclass(frozen=True)
class GenLogConfig:
    n_events: int
    n_epochs: int
    seed: int = 42
    n_keys: int | None = None  # default n_events // 4
    evolve_at_epoch: int | None = None  # payload v2 from this epoch on (None = never)
    # payload v2 from this EVENT id on — lands mid-epoch, so one epoch
    # carries both payload versions (drift detection must see every row,
    # not a prefix sample; exercised by test_mid_epoch_drift)
    evolve_at_event: int | None = None
    content_blocks_max: int = 60  # content length 3..(3+max) 64-char sha blocks

    @property
    def keys(self) -> int:
        return self.n_keys if self.n_keys is not None else max(self.n_events // 4, 8)

    @property
    def events_per_epoch(self) -> int:
        return max(self.n_events // self.n_epochs, 1)


def _h(seed: int, tag: str, *cols: Column) -> Column:
    """48-bit deterministic hash as a long: int(sha256(seed:tag:...)[:12], 16)."""
    parts = [F.lit(str(seed)), F.lit(tag), *[c.cast("string") for c in cols]]
    return F.conv(F.substring(F.sha2(F.concat_ws(":", *parts), 256), 1, 12), 16, 10).cast("long")


def _hex(seed: int, tag: str, *cols: Column) -> Column:
    parts = [F.lit(str(seed)), F.lit(tag), *[c.cast("string") for c in cols]]
    return F.sha2(F.concat_ws(":", *parts), 256)


def generate_change_log(spark: SparkSession, cfg: GenLogConfig) -> DataFrame:
    """Build the change-event DataFrame. One narrow stage, no shuffle:
    every column is an expression over ``id`` (whole-stage codegen fuses it).
    """
    s = cfg.seed
    df = spark.range(cfg.n_events)  # id = global LWW order
    eid = F.col("id")

    # --- LWW order: (commit_seq, event_seq) unique, monotone in id ---
    commit_seq = (eid / 4).cast("long")
    event_seq = eid % 4

    # --- epoch: base epoch by position, ~5% late arrivals pushed 1-3 epochs ---
    base_epoch = F.least(
        (eid / cfg.events_per_epoch).cast("long"), F.lit(cfg.n_epochs - 1)
    )
    late_h = _h(s, "late", eid)
    is_late = late_h % 20 == 0
    epoch = F.when(
        is_late, F.least(base_epoch + 1 + late_h % 3, F.lit(cfg.n_epochs - 1))
    ).otherwise(base_epoch)

    # --- key: k in [0, keys); 20% of keys (k%5==0) land in 3 hot repos ---
    k = _h(s, "key", eid) % cfg.keys
    kh = _h(s, "keyhash", k)
    repo = F.when(
        k % 5 == 0, F.format_string("hot/repo%d", (kh % 3).cast("int"))
    ).otherwise(F.format_string("org%d/repo%d", (kh % 37).cast("int"), (kh % 97).cast("int")))
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (kh % len(LANGS) + 1).cast("int"))
    ext = lang  # ext == lang code for all entries in LANGS
    path = F.format_string(
        "src/%d/%d/file_%d.%s",
        (kh % 13).cast("int"),
        (kh % 7).cast("int"),
        k.cast("int"),
        ext,
    )

    # --- op mix: 60% I, 30% U, 10% D (I and U are both upserts) ---
    op_h = _h(s, "op", eid) % 10
    op = F.when(op_h < 6, F.lit("I")).otherwise(F.when(op_h < 9, F.lit("U")).otherwise(F.lit("D")))

    # --- commit: 40-hex, pure function of commit_seq ---
    commit = F.substring(_hex(s, "commit", commit_seq), 1, 40)

    # --- content: header line + sha-chain filler, 192..4032 chars ---
    filler = _hex(s, "content", eid)  # 64 hex chars
    reps = (_h(s, "len", eid) % cfg.content_blocks_max + 3).cast("int")  # 3..max+2 blocks
    content = F.concat(
        F.format_string("// %s/%s@%s\n", repo, path, commit), F.repeat(filler, reps)
    )

    # --- payload: v1 {lang, content}; v2 {language, content, size_bytes} ---
    v1 = F.to_json(F.struct(lang.alias("lang"), content.alias("content")))
    v2 = F.to_json(
        F.struct(
            lang.alias("language"),
            content.alias("content"),
            F.length(content).cast("long").alias("size_bytes"),
        )
    )
    if cfg.evolve_at_event is not None:
        payload = F.when(eid >= cfg.evolve_at_event, v2).otherwise(v1)
    elif cfg.evolve_at_epoch is None:
        payload = v1
    else:
        payload = F.when(epoch >= cfg.evolve_at_epoch, v2).otherwise(v1)
    payload = F.when(op == "D", F.lit(None).cast("string")).otherwise(payload)

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        op.alias("op"),
        commit.alias("commit"),
        commit_seq.alias("commit_seq"),
        event_seq.alias("event_seq"),
        epoch.alias("epoch"),
        payload.alias("payload_json"),
    )


def write_change_log(spark: SparkSession, cfg: GenLogConfig, out_dir: str) -> None:
    """Materialize the change log as epoch-partitioned parquet:
    ``out_dir/epoch=<n>/part-*.parquet`` — the 'binlog tail' the engine reads.
    """
    df = generate_change_log(spark, cfg)
    df.write.mode("overwrite").partitionBy("epoch").parquet(out_dir)
