"""Frozen value-hash goldens for every rows-only (no-DuckDB-oracle)
query in the registry (VERDICT r1 #9: rows-only checks let a silent
geometry regression through as long as the row COUNT held — these pin
the values).

The hash is the md5 of sorted stringified rows over sorted columns at
sf0.001 / the queries' fixed synthetic inputs. Outputs are either
integer/string or explicitly rounded in the query, so the hash is
partitioning-independent. If a semantics change is intentional,
regenerate with the snippet in this file's git history."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kblock_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

GOLDEN = {
    "e04_lsh_ann_topk": ("c8667a229b4690c5", 100),
    "geo_blocks": ("4f5d0bfa82259dcc", 28),
    "geo_pip_join": ("0e9e725f5f465342", 28),
    # re-frozen in round 3: the packing layer now lexsorts building
    # points before the kernel (canonical association order for the
    # kernel's float sums — bit-stable under ANY join/dedupe plan);
    # only nearest_external_street float tails moved (~1e-10)
    "geo_k_complexity": ("9ced17f0b1fac6e5", 28),
    "geo_population": ("c1fe51fbfe1c43ce", 28),
    # geo_knn / geo_linearity graduated to hard DuckDB oracles in
    # round 4 (SQL-reproducible inputs) and left the golden set
    "geo_dissolve": ("09159e0763dc6f43", 4),
    # round 4: full 23-col crosswalk -> 87-col combine surface
    # (12-column stable projection); re-frozen in round 5 for the
    # reference-fidelity fixes (ADVICE r4): urban_id/conurbation_id
    # fill to nonurban_<cc> so peri-urban layer codes gained the
    # _nonurban_<cc> suffix (batch_1c:226-227,347-348), agglos
    # columns fill to no_agglosid/Non-urban/No, k_complexity
    # zero-fill became fill-to-1
    "geo_combine_full": ("f67762402e0cbb1b", 28),
    # media_features graduated to a hard DuckDB oracle in round 6
    # (closed-form md5-block payload) and left the golden set
    "s01_stream_tile_rollup": ("a3824bff0cd6587c", 867),
    "e05_ivf_ann_topk": ("73afa9e353501e2d", 100),
    # persisted-index round trip: same hash as e05 BY CONSTRUCTION —
    # save → load → probed query must reproduce the fresh build exactly
    "e07_ivf_index_ann": ("73afa9e353501e2d", 100),
    # round 5: PQ ADC shortlist + exact rerank (m=16, ksub=32,
    # rerank_mult=4; measured recall 0.82 vs brute force)
    "e09_pq_ann_topk": ("c44409b845792d48", 100),
    # round 5: persisted IVF-PQ (coarse partition pruning + PQ codes
    # + per-query probe candidacy + exact rerank)
    "e10_ivfpq_index_ann": ("6b29ef0bd188b3f8", 100),
}


def _vhash(df):
    cols = sorted(df.columns)
    rows = sorted("|".join(repr(r[c]) for c in cols) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()[:16], len(rows)


ROWS_ONLY = [name for name, (fn, sql) in REGISTRY.items() if sql is None]


def test_every_rows_only_query_has_a_golden():
    assert set(ROWS_ONLY) == set(GOLDEN), (
        "new rows-only query without a value golden: "
        f"{set(ROWS_ONLY) ^ set(GOLDEN)}"
    )


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_values(spark, name):
    fn, _sql = REGISTRY[name]
    h, n = _vhash(fn(spark, SF))
    want_h, want_n = GOLDEN[name]
    assert n == want_n, f"{name}: row count {n} != {want_n}"
    assert h == want_h, f"{name}: value hash {h} != {want_h}"


def test_k_histogram_golden(spark):
    """Human-readable tripwire alongside the opaque hashes: the full
    k-complexity distribution of the 2×2 synthetic city at 2000
    pages, and the total PIP assignment count."""
    from kblock_spark.pipeline import run_pipeline

    dfs = run_pipeline(spark, n_pages=2000, nx=2, ny=2, grid=2)
    hist = {
        r["k_complexity"]: r["n"]
        for r in dfs["complexity"]
        .groupBy("k_complexity")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert hist == {1: 3, 2: 12, 3: 7, 4: 4, 9: 1, 11: 1}
    assert dfs["buildings"].count() == 1142
