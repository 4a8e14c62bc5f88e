"""Replicates the driver's verify: every queries() entry must match its
oracle_sql() on DuckDB at sf0.01 — row count, column names, and
order-insensitive values."""

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(name, spark, duck):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = qfn(spark, SF_DIR)
    cols = sorted(sdf.columns)
    got = _norm([r.asDict() for r in sdf.collect()], cols)
    odf = duck.execute(sql).fetchdf()
    assert sorted(odf.columns.tolist()) == cols, f"{name}: column names differ"
    want = _norm(odf.to_dict("records"), cols)
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float) and isinstance(wv, float):
                assert math.isclose(gv, wv, abs_tol=1e-6), f"{name}: {g} vs {w}"
            else:
                assert gv == wv, f"{name}: {g} vs {w}"
