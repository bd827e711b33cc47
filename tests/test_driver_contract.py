"""Mimic the driver's CORRECTNESS gate: every queries() entry vs its
oracle_sql() DuckDB result at sf0.01 — row count, column names, and
order-insensitive values must match exactly."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm_cell(v):
    """Type-tagged normalization mimicking the driver's pandas value hash:
    an int 1 and a float 1.0 must NOT compare equal (DuckDB HUGEINT sums
    become pandas float64 — that burned us in round 1)."""
    if v is None:
        return "∅"
    if isinstance(v, float):  # covers np.float32/64 too
        if math.isnan(v):
            return "∅"
        return f"f:{round(v, 9)}"
    if isinstance(v, (int,)) or type(v).__name__.startswith(("int", "uint")):
        return f"i:{int(v)}"
    return f"{type(v).__name__}:{v}"


def _norm_pdf(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in pdf.iterrows()]
    return sorted(rows)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_pdf = sdf.toPandas()

    res = ddb.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_pdf = res.fetchdf()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_pdf) == len(d_pdf), f"{name}: row count {len(s_pdf)} vs {len(d_pdf)}"
    sn = _norm_pdf(s_pdf)
    dn = _norm_pdf(d_pdf)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[0]}"


def test_contract_counts():
    """The module docstring's contract: every query is oracled except
    ivf_topk (approximate by construction — nprobe < n_cells)."""
    assert set(ORACLES) <= set(QUERIES)
    assert set(QUERIES) - set(ORACLES) == {"ivf_topk"}


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"user_id", "event_id", "event_type", "value", "route"}
