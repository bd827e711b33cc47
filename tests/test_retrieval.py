"""BM25 semantics: length normalization, additivity over query terms,
query-term dedup, k/rank contract; and the persisted incrementally-
maintained index's equivalence to the inline computation
(SURVEY.md §2.12 text family)."""

import pytest
from pyspark.sql import functions as F

from nifi_processors_spark.operators.retrieval import Bm25Index, bm25_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "apple"),
        (2, "banana cherry"),
        (3, "durian durian durian"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(spark, *qs):
    return spark.createDataFrame(list(enumerate(qs)), "query_id long, query string")


def _scores(out):
    return {(r["query_id"], r["doc_id"]): r["score"] for r in out.collect()}


def test_only_matching_docs_and_dense_ranks(spark, docs):
    out = bm25_topk(docs, _q(spark, "apple"), "text", "doc_id", k=10).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {0, 1}  # docs 2, 3 contain no query term
    assert sorted(r["rank"] for r in out) == [1, 2]


def test_length_normalization(spark, docs):
    """Same idf; doc 1 has tf=1/dl=1, doc 0 has tf=2/dl=3 — BM25's length
    norm must rank the short exact doc above the longer repetitive one."""
    s = _scores(bm25_topk(docs, _q(spark, "apple"), "text", "doc_id", k=10))
    assert s[(0, 1)] > s[(0, 0)] > 0


def test_additivity_and_query_dedup(spark, docs):
    one = _scores(bm25_topk(docs, _q(spark, "apple", "banana"), "text", "doc_id", k=10))
    both = _scores(bm25_topk(docs, _q(spark, "apple banana"), "text", "doc_id", k=10))
    dup = _scores(bm25_topk(docs, _q(spark, "apple apple banana"), "text", "doc_id", k=10))
    # score(multi-term) == sum of per-term scores, and repeated query
    # terms collapse (qtf capped at 1)
    want0 = round(one[(0, 0)] + one[(1, 0)], 5)
    assert round(both[(0, 0)], 5) == want0 == round(dup[(0, 0)], 5)


def test_k_truncates(spark, docs):
    out = bm25_topk(docs, _q(spark, "apple banana cherry durian"), "text", "doc_id", k=1)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["rank"] == 1


def test_unknown_term_is_empty(spark, docs):
    assert bm25_topk(docs, _q(spark, "zzz qqq"), "text", "doc_id", k=5).count() == 0


# ---------------- persisted incremental index ----------------


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_index_incremental_equals_inline(spark, tmp_path, docs):
    """Ingesting the corpus in two batches and querying the index must
    give exactly the inline result over the full corpus."""
    idx = Bm25Index(spark, str(tmp_path / "bm25"), n_hash_buckets=8)
    idx.ingest(docs.filter(F.col("doc_id") < 2), "text", "doc_id")
    m = idx.ingest(docs.filter(F.col("doc_id") >= 2), "text", "doc_id")
    assert m["n_docs"] == 4 and m["sum_dl"] == 3 + 1 + 2 + 3
    q = _q(spark, "apple banana", "durian")
    want = _rows(bm25_topk(docs, q, "text", "doc_id", k=10))
    got = _rows(idx.topk(q, k=10))
    assert got == want and want


def test_index_probe_is_partition_pruned(spark, tmp_path, docs):
    idx = Bm25Index(spark, str(tmp_path / "bm25"), n_hash_buckets=8)
    idx.ingest(docs, "text", "doc_id")
    q = _q(spark, "apple")
    out = idx.topk(q, k=10)
    assert out.count() == 2
    # only the tb= dir 'apple' hashes into may be opened
    tb = spark.createDataFrame([("apple",)], "term string").select(
        F.pmod(F.xxhash64("term"), F.lit(8)).alias("tb")).first()["tb"]
    probe = spark.read.parquet(idx.postings_dir).filter(
        F.col("tb").isin([tb]) & F.col("term").isin(["apple"]))
    files = [r[0] for r in probe.select(F.input_file_name()).distinct().collect()]
    assert files and all(f"tb={tb}/" in f for f in files)


def test_index_empty_and_meta_guards(spark, tmp_path, docs):
    idx = Bm25Index(spark, str(tmp_path / "bm25"), n_hash_buckets=8)
    with pytest.raises(RuntimeError, match="empty"):
        idx.topk(_q(spark, "apple"))
    idx.ingest(docs.limit(0), "text", "doc_id")  # empty batch: noop
    assert idx.meta()["n_docs"] == 0
    idx.ingest(docs, "text", "doc_id")
    with pytest.raises(ValueError, match="n_hash_buckets"):
        Bm25Index(spark, str(tmp_path / "bm25"), n_hash_buckets=16)


def test_index_rebuild_equals_incremental(spark, tmp_path, docs):
    a = Bm25Index(spark, str(tmp_path / "a"), n_hash_buckets=8)
    for b in range(2):
        a.ingest(docs.filter(F.col("doc_id") % 2 == b), "text", "doc_id")
    r = Bm25Index(spark, str(tmp_path / "r"), n_hash_buckets=8)
    r.rebuild(docs, "text", "doc_id")
    q = _q(spark, "apple banana cherry")
    assert _rows(a.topk(q)) == _rows(r.topk(q))
    assert a.meta() == r.meta()
