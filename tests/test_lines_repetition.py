"""Round-5 additions: CCNet-style corpus boilerplate-line removal
(operators/lines.py) and Gopher-style per-document repetition signals
(text.with_repetition_features) — pinned hand-computed examples."""

import pytest
from pyspark.sql import functions as F

from nifi_processors_spark.operators import lines as L
from nifi_processors_spark.operators import text as X


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "Welcome to ACME\nunique alpha content\n(c) acme corp"),
        (2, "Welcome   to acme\nbeta body text\n(c) acme corp"),
        (3, "gamma only here\n\n(c) acme corp"),
        (4, "delta delta delta\nWelcome to ACME"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_distinct_doc_counts(corpus):
    got = {r["_norm"]: r["n_docs"]
           for r in L.boilerplate_lines(corpus, "doc_id", "text").collect()}
    # footer in docs 1-3; welcome line in 1, 2 (normalized) and 4
    assert got == {"(c) acme corp": 3, "welcome to acme": 3}
    # min_docs=4 -> nothing qualifies
    assert L.boilerplate_lines(corpus, "doc_id", "text", min_docs=4).count() == 0


def test_strip_keeps_order_empties_and_cardinality(corpus):
    out = {r["doc_id"]: r["clean_text"]
           for r in L.strip_boilerplate_lines(corpus, "doc_id", "text").collect()}
    assert out == {
        1: "unique alpha content",
        2: "beta body text",
        3: "gamma only here\n",  # empty line kept: never boilerplate
        4: "delta delta delta",
    }
    # a doc that is pure boilerplate survives as an empty row
    only_boiler = corpus.sparkSession.createDataFrame(
        [(1, "same\nsame"), (2, "same")], "doc_id long, text string")
    out2 = {r["doc_id"]: r["clean_text"]
            for r in L.strip_boilerplate_lines(only_boiler, "doc_id", "text").collect()}
    assert out2 == {1: "", 2: ""}
    # within-doc repetition alone (doc 1 has 'same' twice) is NOT boilerplate
    solo = corpus.sparkSession.createDataFrame(
        [(1, "same\nsame"), (2, "other")], "doc_id long, text string")
    out3 = {r["doc_id"]: r["clean_text"]
            for r in L.strip_boilerplate_lines(solo, "doc_id", "text").collect()}
    assert out3 == {1: "same\nsame", 2: "other"}


def test_repetition_features_pinned(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, ""), (4, "w")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           X.with_repetition_features(df, "text").collect()}
    r1 = got[1]  # words: a a a b; bigrams: 'a a','a a','a b'
    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == 0.5       # 4 words, 2 distinct
    assert r1["top_word_frac"] == 0.75      # 'a' 3/4
    assert abs(r1["top_bigram_frac"] - round(2 / 3, 6)) < 1e-12
    r2 = got[2]
    assert (r2["dup_word_frac"], r2["top_word_frac"]) == (0.0, round(1 / 3, 6))
    assert r2["top_bigram_frac"] == 0.5
    r3 = got[3]  # empty text: all-zero, no NaN/nulls
    assert (r3["n_words"], r3["dup_word_frac"], r3["top_word_frac"],
            r3["top_bigram_frac"]) == (0, 0.0, 0.0, 0.0)
    assert got[4]["top_bigram_frac"] == 0.0  # single word -> no bigrams
