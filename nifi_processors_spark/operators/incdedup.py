"""Incremental near-duplicate detection over a persisted LSH band index.

The batch operators in ``fuzzy.py`` answer "find all near-dup pairs in
this corpus" — one shot, whole corpus. A CDC pipeline needs the other
shape: documents arrive epoch by epoch, and each NEW batch must be
checked against everything already ingested WITHOUT re-banding (or even
re-reading) the historical corpus. At 100 TB a nightly full re-dedup is
the single most expensive job in the pipeline; this module replaces it
with per-epoch work proportional to the batch.

``LshBandIndex`` persists the MinHash LSH band table — skinny rows
``(band, h, id)`` — as parquet partitioned by ``hb = hash(h) % B``.
Each ``ingest(new_docs)``:

1. bands the batch (narrow projection, same ``fuzzy`` primitives and
   parameters as the one-shot plan — the two paths are provably
   candidate-equivalent),
2. probes the stored index with a PARTITION-PRUNED scan: the batch's
   band keys hash into at most B ``hb=`` directories, collected
   driver-side (bounded by B, never by data size) and pushed as an
   IN-list so untouched partitions are never opened,
3. verifies true shingle Jaccard for candidates only, re-deriving
   shingles from the CORPUS table via a broadcast join on the (small)
   candidate id set — a column-pruned scan, no corpus shuffle, and the
   exact same verification the one-shot operator performs,
4. appends the batch's band rows to the index.

Equivalence contract (tested): for any split of a corpus into ordered
batches, the union of per-ingest results equals the one-shot
``fuzzy.minhash_lsh_pairs`` over the whole corpus, provided no band
bucket exceeds ``max_bucket_size`` (the cap bounds in-batch expansion
exactly like the one-shot plan; cross-index probes are joins and need no
cap — a capped one-shot run can therefore only MISS pairs the
incremental path still finds).

Updates: re-ingesting a changed document appends its new band rows but
keeps the stale ones. Stale rows only ever ADD candidates, and every
candidate is verified against the CURRENT corpus text, so results stay
correct — the index just accumulates dead weight until a ``rebuild()``
(one one-shot banding pass) re-compacts it. Parquet appends are not
atomic; the index is a pure derivation of the corpus, so a torn append
is repaired by ``rebuild()`` rather than write-ahead machinery.

No reference analogue (the reference has no dedup at all); this is the
incremental companion of ``fuzzy.minhash_lsh_pairs`` (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import fsio
from .fuzzy import (
    jaccard,
    lsh_bands,
    minhash_base_hashes,
    minhash_signature_from_hashes,
    portable_hash60,
    with_word_shingles,
)

_META = "index.json"
_BANDS = "bands"


class LshBandIndex:
    """A persisted, incrementally-maintained MinHash LSH band index.

    Banding parameters are pinned in ``index.json`` at creation; reopening
    with different parameters raises (mixed-parameter band keys would
    silently never collide)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        n_hash_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self._meta_path = fsio.join(path, _META)
        self.bands_dir = fsio.join(path, _BANDS)
        meta = fsio.load_json(self._meta_path, default=None)
        if meta is not None:
            mine = dict(num_hashes=num_hashes, bands=bands,
                        shingle_n=shingle_n, n_hash_buckets=n_hash_buckets)
            if mine != {k: meta[k] for k in mine}:
                raise ValueError(
                    f"index at {path} was built with {meta}, reopened with {mine}"
                )
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.n_hash_buckets = n_hash_buckets
        if num_hashes % bands:
            raise ValueError("num_hashes must divide evenly into bands")

    # ------------- plumbing -------------

    def exists(self) -> bool:
        return fsio.load_json(self._meta_path, default=None) is not None

    def _write_meta(self) -> None:
        fsio.publish_json(
            self._meta_path,
            dict(num_hashes=self.num_hashes, bands=self.bands,
                 shingle_n=self.shingle_n, n_hash_buckets=self.n_hash_buckets),
        )

    def _band_table(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """(id, band, h, hb) for a batch — identical banding to
        fuzzy.minhash_lsh_pairs (same staged base hashes / signature /
        band keys), plus the partition column."""
        rows = self.num_hashes // self.bands
        sh = with_word_shingles(docs, text_col, "_sh", self.shingle_n)
        return (
            sh.withColumn("_bh", minhash_base_hashes(F.col("_sh")))
            .withColumn("_sig", minhash_signature_from_hashes(F.col("_bh"), self.num_hashes))
            .select(
                F.col(id_col).alias("id"),
                F.explode(lsh_bands(F.col("_sig"), self.bands, rows)).alias("_b"),
            )
            .select(
                "id",
                F.col("_b.band").alias("band"),
                F.col("_b.h").alias("h"),
                (portable_hash60(F.col("_b.h")) % self.n_hash_buckets).alias("hb"),
            )
        )

    # ------------- the per-epoch operation -------------

    def ingest(
        self,
        new_docs: DataFrame,
        text_col: str,
        id_col: str,
        corpus: DataFrame,
        threshold: float = 0.7,
        max_bucket_size: int | None = 256,
    ) -> DataFrame:
        """Dedup ``new_docs`` against the index AND against itself, then
        add the batch to the index.

        ``corpus`` must contain (id, text) for every document that could
        appear in a pair — i.e. everything ingested so far plus this
        batch (in a CDC pipeline: the state table after this epoch's
        apply). Verification re-derives shingles from it for candidate
        ids only, behind an explicit broadcast of the candidate set.

        Returns verified pairs ``(id_a, id_b, jaccard)`` with
        ``id_a < id_b``, where at least one endpoint is from this batch.
        The result is MATERIALIZED (localCheckpoint) before the index is
        appended, so the returned DataFrame can never observe its own
        batch's band rows through the probe scan."""
        nb = self._band_table(new_docs, text_col, id_col)

        # The distinct hb set is what makes the probe scan partition-
        # pruned; its size is bounded by n_hash_buckets, so the collect
        # is O(B) regardless of batch or corpus size.
        hbs = sorted(r["hb"] for r in nb.select("hb").distinct().collect())
        if not hbs:  # empty batch: nothing to probe, nothing to append
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, jaccard double"
            )

        # in-batch candidates: the one-shot plan's grouped expansion,
        # capped identically (sorted id list sliced to the cap)
        grouped = (
            nb.groupBy("band", "h")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        if max_bucket_size is not None:
            grouped = grouped.withColumn("ids", F.slice(F.col("ids"), 1, max_bucket_size))
        pair_structs = F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.size("ids") - 2),
                lambda i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size("ids")),
                    lambda j: F.struct(
                        F.element_at(F.col("ids"), i + 1).alias("id_a"), j.alias("id_b")
                    ),
                ),
            )
        )
        in_batch = (
            grouped.select(F.explode(pair_structs).alias("_p"))
            .select("_p.id_a", "_p.id_b")
        )

        # cross candidates: batch band keys joined against the stored
        # index, scanning only the hb partitions the batch hashes into
        cands = in_batch
        if fsio.exists(self.bands_dir):
            old = self.spark.read.parquet(self.bands_dir).filter(F.col("hb").isin(hbs))
            cross = (
                nb.join(old.select("band", "h", F.col("id").alias("_old")), ["band", "h"])
                .filter(F.col("_old") != F.col("id"))
                .select(
                    F.least("id", "_old").alias("id_a"),
                    F.greatest("id", "_old").alias("id_b"),
                )
            )
            cands = in_batch.unionByName(cross)
        cands = cands.distinct()

        # verification: true shingle jaccard, shingles re-derived from
        # the corpus for candidate ids only (broadcast the candidate set,
        # column-pruned corpus scan — the corpus is never shuffled)
        sh = with_word_shingles(
            corpus.select(F.col(id_col).alias("_vid"), text_col),
            text_col, "_sh", self.shingle_n,
        ).select("_vid", "_sh")
        verified = (
            F.broadcast(cands)
            .join(sh.select(F.col("_vid").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
            .join(sh.select(F.col("_vid").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
            .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        out = verified.localCheckpoint(eager=True)

        # only now does the batch join the index
        nb.write.mode("append").partitionBy("hb").parquet(self.bands_dir)
        if not fsio.load_json(self._meta_path, default=None):
            self._write_meta()
        return out

    def rebuild(self, corpus: DataFrame, text_col: str, id_col: str) -> None:
        """Re-derive the whole index from the corpus in one banding pass —
        the repair path for torn appends and the compaction path after
        many re-ingested updates."""
        nb = self._band_table(corpus, text_col, id_col)
        nb.write.mode("overwrite").partitionBy("hb").parquet(self.bands_dir)
        self._write_meta()
