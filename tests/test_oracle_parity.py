"""Self-check harness mimicking the driver's DuckDB-oracle gate:
row count + column names + order-insensitive value comparison for
every oracle-checked query at sf0.001 (fast) — run before the driver
does it at sf0.01."""

import math

import duckdb
import pytest

from kblock_spark.queries import REGISTRY

import os

SF_DIR = os.environ.get("KBLOCK_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Type-SENSITIVE canonicalization — matches the driver's
    dtype-aware value hash: Decimal vs float vs int must not collapse
    to the same token (round-1 lesson: DuckDB hands widened
    DECIMAL(38,x)/HUGEINT aggregates to the client as float64 while
    Spark hands Decimal/int64, and the driver's hash sees that)."""
    import decimal

    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(row[i]) for i in order) for row in rows
    )


ORACLE_QUERIES = [
    (name, fn, sql) for name, (fn, sql) in REGISTRY.items() if sql is not None
]


@pytest.mark.parametrize("name,fn,sql", ORACLE_QUERIES, ids=[q[0] for q in ORACLE_QUERIES])
def test_query_matches_oracle(spark, ddb, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(sql)
    d_cols = [d[0] for d in res.description]
    # Materialize via pandas (.df()) exactly like the driver: DuckDB
    # HUGEINT/DECIMAL widen to float64 on this path but stay Python int
    # via fetchall() -- the round-4 s04 red row was invisible to this
    # harness precisely because it used fetchall().
    d_pdf = res.df()
    d_rows = [
        tuple(v.item() if hasattr(v, "item") else v for v in row)
        for row in d_pdf.itertuples(index=False, name=None)
    ]
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sset = _rows_to_set(s_cols, s_rows)
    dset = _rows_to_set(d_cols, d_rows)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
    assert sset == dset, f"{name}: value mismatch at {mism}: " + str(
        [(sset[i], dset[i]) for i in mism]
    )
