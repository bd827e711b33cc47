"""Generic row-layout generator (GenerateData parity: category/regex/
random/date kinds, reference GenerateData.java:66-246 + additionalDetails)."""

import re

import pyspark.sql.functions as F

from nifi_processors_spark.sources.datagen import generate_table, rows_to_csv

LAYOUT = [
    {"name": "id", "kind": "sequence"},
    {"name": "lang", "kind": "category", "values": ["py", "go", "rs"]},
    {"name": "sku", "kind": "regex", "pattern": "[A-Z]{3}-[0-9]{4}"},
    {"name": "token", "kind": "random", "min_len": 8, "max_len": 20},
    {"name": "born", "kind": "date", "min_year": 2000, "max_year": 2099},
    {"name": "qty", "kind": "int", "min": 1, "max": 100},
    {"name": "score", "kind": "double", "min": 0.0, "max": 1.0},
]


def test_shapes_and_domains(spark):
    df = generate_table(spark, 200, LAYOUT)
    rows = df.collect()
    assert len(rows) == 200
    for r in rows:
        assert r["lang"] in ("py", "go", "rs")
        assert re.fullmatch(r"[A-Z]{3}-[0-9]{4}", r["sku"]), r["sku"]
        assert 8 <= len(r["token"]) <= 20
        assert 2000 <= r["born"].year <= 2099 and 1 <= r["born"].day <= 28
        assert 1 <= r["qty"] <= 100
        assert 0.0 <= r["score"] <= 1.0


def test_deterministic_across_parallelism(spark):
    a = generate_table(spark, 300, LAYOUT).orderBy("id")
    b = generate_table(spark, 300, LAYOUT).repartition(7).orderBy("id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # different seed -> different values
    c = generate_table(spark, 300, LAYOUT, seed=7).orderBy("id")
    assert c.exceptAll(a).count() > 0


def test_csv_serialization(spark):
    df = generate_table(spark, 5, LAYOUT)
    csv = rows_to_csv(df, [f["name"] for f in LAYOUT], ";")
    line = csv.first()["content"]
    assert line.count(";") == len(LAYOUT) - 1


def test_category_distribution(spark):
    df = generate_table(spark, 3000, LAYOUT)
    counts = {r["lang"]: r["count"] for r in df.groupBy("lang").count().collect()}
    assert set(counts) == {"py", "go", "rs"}
    assert all(700 < v < 1400 for v in counts.values()), counts
