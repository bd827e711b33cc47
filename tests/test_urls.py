"""URL canonicalization + URL dedup (SURVEY.md §2.12 dedup family)."""

from pyspark.sql import functions as F

from nifi_processors_spark.operators.urls import canonicalize_url, url_dedup_keep

CASES = [
    # tracking params stripped, rest sorted; host+scheme lowercased; :80 dropped
    ("HTTP://WWW.Example.com:80/d/5?utm_source=feed&b=2&a=1#frag",
     "http://www.example.com/d/5?a=1&b=2"),
    # gclid stripped, trailing-slash path preserved
    ("https://example.COM/d/5/?gclid=xyz&z=1", "https://example.com/d/5/?z=1"),
    # empty path -> '/', query preserved
    ("http://EXAMPLE.com?id=5", "http://example.com/?id=5"),
    # :443 dropped for https; params sorted binary (Z < a); path case kept
    ("https://Example.com:443/P/5?a=1&utm_campaign=x&ref=h&Z=9#s",
     "https://example.com/P/5?Z=9&a=1"),
    # non-default port preserved
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # all params tracking -> query dropped entirely
    ("http://a.com/p?utm_a=1&utm_b=2", "http://a.com/p"),
    ("http://a.com/", "http://a.com/"),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i], want)


def test_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


def test_url_dedup_keep(spark):
    rows = [
        (0, "http://A.com/p?utm_x=1&k=1"),
        (1, "HTTP://a.com:80/p?k=1"),          # same page as 0
        (2, "http://a.com/p?k=2"),             # different query -> kept
        (3, "http://a.com/p#section"),         # fragment-only variant of /p
        (4, "http://a.com/p"),                 # same as 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in url_dedup_keep(df, "url", "doc_id").collect())
    assert kept == [0, 2, 3]
