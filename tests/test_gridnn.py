"""Exactness fuzz for the batched grid nearest-site index — including
queries OUTSIDE the site bbox (scalar cell codes of out-of-range cells
could alias into other rows; regression guard for the masking fix)
and the GEMM-form brute block it hands small batches to."""

import numpy as np

from kblock_spark.kernels.complexity import _GridNN, _nearest_site


def _brute(Q, sites):
    d2 = ((Q[:, None, :] - sites[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1), d2


def test_gridnn_matches_brute_fuzz():
    rng = np.random.default_rng(17)
    for trial in range(25):
        ns = int(rng.integers(65, 4000))
        nq = int(rng.integers(1, 3000))
        scale = 10 ** rng.integers(0, 7)  # includes Mercator magnitudes
        center = rng.uniform(-1e6, 1e6, 2)
        sites = center + rng.normal(0, 1, (ns, 2)) * scale
        # queries spill well past the site bbox
        Q = center + rng.normal(0, 2.5, (nq, 2)) * scale
        got = _GridNN(sites).query(Q)
        want, d2 = _brute(Q, sites)
        bad = np.flatnonzero(got != want)
        for i in bad:  # only exact ties may differ
            assert d2[i, got[i]] == d2[i, want[i]], (
                f"trial {trial}: non-tie mismatch at {i}"
            )


def test_nearest_site_paths_agree():
    rng = np.random.default_rng(3)
    sites = rng.uniform(0, 1000, (500, 2))
    Q = rng.uniform(-100, 1100, (300, 2))
    brute = _nearest_site(Q, sites)  # 150k pairs → GEMM brute path
    grid = _GridNN(sites).query(Q)
    d2 = ((Q[:, None, :] - sites[None, :, :]) ** 2).sum(axis=2)
    for i in range(len(Q)):
        assert d2[i, brute[i]] == d2[i].min()
        assert d2[i, grid[i]] == d2[i].min()
