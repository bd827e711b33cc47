"""BM25 semantics: length normalization, additivity over query terms,
query-term dedup, k/rank contract (SURVEY.md §2.12 text family)."""

import pytest
from pyspark.sql import functions as F

from nifi_processors_spark.operators.retrieval import bm25_topk


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
