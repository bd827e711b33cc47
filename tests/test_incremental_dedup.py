"""Incremental LSH band index: the union of per-batch ingests must equal
the one-shot minhash recompute, probes must stay partition-pruned, and
updates/rebuilds must stay correct (SURVEY.md §2.12 dedup family)."""

import pytest
from pyspark.sql import functions as F

from nifi_processors_spark.operators import fuzzy
from nifi_processors_spark.operators.incdedup import LshBandIndex

PARAMS = dict(num_hashes=32, bands=16, shingle_n=2)


@pytest.fixture(scope="module")
def corpus(spark):
    """A corpus with planted near-dup structure spread across batches
    (doc_id % 3) so cross-batch pairs genuinely exercise the index."""
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    other = "streaming engines shuffle partitions across executors while catalyst optimizes plans"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0 (same batch as 4? 1%3=1)
        (2, base.replace("lazy", "sleepy")),         # near dup of 0
        (3, "completely different text about spark query engines and shuffles at scale"),
        (4, base.upper()),                           # case-normalized dup of 0
        (5, "yet another unrelated document mentioning gradient descent optimizers"),
        (6, other),
        (7, other.replace("catalyst", "tungsten")),  # near dup of 6, 7%3=1 vs 6%3=0
        (8, base + " extra trailing words"),         # near dup of 0, batch 2
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def _ingest_all(spark, tmp_path, corpus, batches=3, threshold=0.5, **kw):
    idx = LshBandIndex(spark, str(tmp_path / "idx"), **PARAMS, **kw)
    outs = []
    for b in range(batches):
        batch = corpus.filter(F.pmod("doc_id", F.lit(batches)) == b)
        outs.append(idx.ingest(batch, "text", "doc_id", corpus, threshold=threshold))
    got = outs[0]
    for o in outs[1:]:
        got = got.unionByName(o)
    return idx, got


def test_union_of_ingests_equals_one_shot(spark, tmp_path, corpus):
    one_shot = fuzzy.minhash_lsh_pairs(
        corpus, "text", "doc_id", threshold=0.5, **PARAMS
    )
    _, got = _ingest_all(spark, tmp_path, corpus)
    want = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in one_shot.collect()}
    have = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in got.collect()}
    assert have == want and want  # non-vacuous: pairs exist
    # and the set contains genuinely cross-batch pairs (0%3 != 1%3)
    assert (0, 1) in {(a, b) for a, b, _ in want}


def test_result_materialized_before_append(spark, tmp_path, corpus):
    """The returned DataFrame must not re-observe the index after its own
    batch was appended — re-collecting after a later ingest must give the
    same rows."""
    idx = LshBandIndex(spark, str(tmp_path / "idx"), **PARAMS)
    b0 = corpus.filter(F.col("doc_id") % 3 == 0)
    b1 = corpus.filter(F.col("doc_id") % 3 == 1)
    out0 = idx.ingest(b0, "text", "doc_id", corpus, threshold=0.5)
    before = _pairs(out0)
    idx.ingest(b1, "text", "doc_id", corpus, threshold=0.5)
    assert _pairs(out0) == before


def test_empty_batch_is_noop(spark, tmp_path, corpus):
    idx = LshBandIndex(spark, str(tmp_path / "idx"), **PARAMS)
    out = idx.ingest(corpus.limit(0), "text", "doc_id", corpus)
    assert out.count() == 0
    assert not idx.exists()  # nothing was appended, index not created


def test_param_mismatch_raises(spark, tmp_path, corpus):
    idx = LshBandIndex(spark, str(tmp_path / "idx"), **PARAMS)
    idx.ingest(corpus, "text", "doc_id", corpus, threshold=0.5)
    with pytest.raises(ValueError, match="built with"):
        LshBandIndex(spark, str(tmp_path / "idx"), num_hashes=64, bands=16, shingle_n=2)


def test_update_reingest_verifies_against_current_text(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    v1 = spark.createDataFrame([(0, base), (1, "totally unrelated words here")],
                               "doc_id long, text string")
    idx = LshBandIndex(spark, str(tmp_path / "idx"), **PARAMS)
    idx.ingest(v1, "text", "doc_id", v1, threshold=0.5)
    # doc 2 arrives as a near-dup of doc 0's CURRENT text
    v2_docs = spark.createDataFrame([(2, base.replace("theta", "sigma"))],
                                    "doc_id long, text string")
    corpus_now = v1.unionByName(v2_docs)
    out = idx.ingest(v2_docs, "text", "doc_id", corpus_now, threshold=0.5)
    got = _pairs(out)
    assert (0, 2) in got and all(a != b for a, b in got)  # no self-pairs


def test_rebuild_equals_incremental(spark, tmp_path, corpus):
    idx, got = _ingest_all(spark, tmp_path, corpus)
    # rebuild compacts the index; probing a fresh batch still finds pairs
    idx.rebuild(corpus, "text", "doc_id")
    nb = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight")],
        "doc_id long, text string")
    out = idx.ingest(nb, "text", "doc_id", corpus.unionByName(nb), threshold=0.5)
    assert (0, 100) in _pairs(out)


def test_probe_scan_is_partition_pruned(spark, tmp_path, corpus):
    """The stored-bands scan must touch only the hb= directories the
    batch's band keys hash into."""
    idx = LshBandIndex(spark, str(tmp_path / "idx"), **PARAMS, n_hash_buckets=8)
    idx.ingest(corpus, "text", "doc_id", corpus, threshold=0.5)
    nb = idx._band_table(
        spark.createDataFrame([(100, "one tiny probe document")], "doc_id long, text string"),
        "text", "doc_id")
    hbs = sorted(r["hb"] for r in nb.select("hb").distinct().collect())
    pruned = spark.read.parquet(idx.bands_dir).filter(F.col("hb").isin(hbs))
    # inputFiles() reports the pre-pruning file index; ask for the files
    # the scan actually READS instead
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files  # the probe reads something...
    assert all(any(f"hb={hb}/" in f for hb in hbs) for f in files)  # ...only matching dirs
    on_disk = {e for e in __import__("os").listdir(idx.bands_dir) if e.startswith("hb=")}
    assert len(on_disk) > len(hbs)  # and pruning was non-vacuous
