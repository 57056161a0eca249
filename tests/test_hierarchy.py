"""Hierarchical quadtree tiling (ops/hierarchy.py): quantization
exactness, multi-resolution rollup conservation, h3-style compaction
vs a brute-force reference, and polyfill vs closed-form membership.
"""

import numpy as np
from pyspark.sql import functions as F

from kblock_spark.geo.geom import pack_rings
from kblock_spark.ops.hierarchy import (
    compact_cells,
    multires_rollup,
    polyfill,
    with_quad_cell,
)


def _points(spark, n=5000, mod=80000):
    return (
        spark.range(n)
        .select(
            ((F.col("id") * 2654435761 + 17) % mod).alias("kx"),
            ((F.col("id") * 1610612741 + 59) % mod).alias("ky"),
            ((F.col("id") * 31 + 7) % 1000).alias("w"),
        )
        .select(
            (F.col("kx").cast("double") / F.lit(1048576.0)).alias("lon"),
            (F.col("ky").cast("double") / F.lit(1048576.0)).alias("lat"),
            "w",
        )
    )


def _np_points(n=5000, mod=80000):
    ids = np.arange(n, dtype=np.int64)
    kx = (ids * 2654435761 + 17) % mod
    ky = (ids * 1610612741 + 59) % mod
    w = (ids * 31 + 7) % 1000
    return kx, ky, w


def test_quad_cell_matches_integer_shift(spark):
    rows = with_quad_cell(_points(spark), 10).select("ix", "iy").collect()
    kx, ky, _ = _np_points()
    assert sorted((r["ix"], r["iy"]) for r in rows) == sorted(
        zip((kx >> 10).tolist(), (ky >> 10).tolist())
    )


def test_multires_rollup_conserves_counts_and_weights(spark):
    out = multires_rollup(_points(spark), [6, 8, 10], weight_col="w").toPandas()
    kx, ky, w = _np_points()
    for lv in (6, 8, 10):
        sub = out[out.level == lv]
        assert sub.n_points.sum() == 5000, lv
        assert sub.sum_w.sum() == w.sum(), lv
    # parent cells aggregate exactly their children
    l10 = out[out.level == 10].set_index(["ix", "iy"])
    l8 = out[out.level == 8]
    roll = (
        out[out.level == 10]
        .assign(px=lambda d: d.ix // 4, py=lambda d: d.iy // 4)
        .groupby(["px", "py"])[["n_points", "sum_w"]]
        .sum()
    )
    merged = l8.set_index(["ix", "iy"]).sort_index()
    assert (merged["n_points"] == roll.sort_index()["n_points"]).all()
    assert (merged["sum_w"] == roll.sort_index()["sum_w"]).all()
    assert len(l10) > len(l8)


def _np_compact(cells: set, level: int, min_level: int):
    """Brute-force reference compaction."""
    out = []
    cur = cells
    for lv in range(level, min_level, -1):
        from collections import Counter

        cnt = Counter((ix >> 1, iy >> 1) for ix, iy in cur)
        done = {p for p, c in cnt.items() if c == 4}
        out.extend(
            (lv, ix, iy) for ix, iy in cur if (ix >> 1, iy >> 1) not in done
        )
        cur = done
    out.extend((min_level, ix, iy) for ix, iy in cur)
    return sorted(out)


def test_compact_matches_bruteforce_and_conserves_area(spark):
    cells_df = (
        with_quad_cell(_points(spark, n=20000), 10)
        .select("ix", "iy")
        .distinct()
    )
    got = sorted(
        (r["level"], r["ix"], r["iy"])
        for r in compact_cells(cells_df, 10, 6).collect()
    )
    kx, ky, _ = _np_points(n=20000)
    cells = set(zip((kx >> 10).tolist(), (ky >> 10).tolist()))
    assert got == _np_compact(cells, 10, 6)
    # expanding every compacted cell back to level 10 reproduces the
    # original set exactly (disjoint cover, no gain, no loss)
    expanded = set()
    for lv, ix, iy in got:
        f = 1 << (10 - lv)
        for dx in range(f):
            for dy in range(f):
                cell = (ix * f + dx, iy * f + dy)
                assert cell not in expanded  # disjoint
                expanded.add(cell)
    assert expanded == cells
    assert len(got) < len(cells)  # it actually compacted


def _fixture_polys(spark):
    S = 1048576.0
    rows = []
    # one rectangle, one diamond, one rectangle-with-hole
    rect = np.array(
        [[10001, 20001], [18001, 20001], [18001, 26001], [10001, 26001]],
        dtype=np.float64,
    )
    rows.append(dict(zip(("ring_sizes", "coords"), pack_rings(rect / S))))
    rows[-1]["poly_id"] = 0
    dia = np.array(
        [[30001, 27000], [33002, 30001], [30001, 33002], [27000, 30001]],
        dtype=np.float64,
    )
    rows.append(dict(zip(("ring_sizes", "coords"), pack_rings(dia / S))))
    rows[-1]["poly_id"] = 1
    hole = np.array(
        [[12001, 21001], [15001, 21001], [15001, 24001], [12001, 24001]],
        dtype=np.float64,
    )
    rows.append(
        dict(zip(("ring_sizes", "coords"), pack_rings(rect / S, [hole / S])))
    )
    rows[-1]["poly_id"] = 2
    return spark.createDataFrame(rows)


def _closed_form_cells(level=10):
    cell = 1 << (20 - level)
    half = cell // 2
    out = []
    for ix in range(0, (1 << level)):
        cx = ix * cell + half
        if cx > 40000:
            break
        for iy in range(0, (1 << level)):
            cy = iy * cell + half
            if cy > 40000:
                break
            in_rect = 10001 < cx < 18001 and 20001 < cy < 26001
            if in_rect:
                out.append((0, ix, iy))
            if abs(cx - 30001) + abs(cy - 30001) < 3001:
                out.append((1, ix, iy))
            in_hole = 12001 < cx < 15001 and 21001 < cy < 24001
            if in_rect and not in_hole:
                out.append((2, ix, iy))
    return sorted(out)


def test_polyfill_matches_closed_form_including_holes(spark):
    got = sorted(
        (r["poly_id"], r["ix"], r["iy"])
        for r in polyfill(_fixture_polys(spark), level=10).collect()
    )
    assert got == _closed_form_cells()
    assert len(got) > 0


def test_polyfill_striping_invariant(spark):
    # a 2-cell stripe bound forces many stripes per polygon; the
    # result must be identical to the unbounded enumeration
    full = sorted(
        map(tuple, polyfill(_fixture_polys(spark), level=10).collect())
    )
    striped = sorted(
        map(
            tuple,
            polyfill(_fixture_polys(spark), level=10, stripe_cells=2).collect(),
        )
    )
    assert full == striped


def test_uncompact_inverts_compact(spark):
    from kblock_spark.ops.hierarchy import uncompact_cells

    cells_df = (
        with_quad_cell(_points(spark, n=20000), 10)
        .select("ix", "iy")
        .distinct()
    )
    compacted = compact_cells(cells_df, 10, 6)
    back = sorted(
        (r["ix"], r["iy"])
        for r in uncompact_cells(compacted, 10).collect()
    )
    kx, ky, _ = _np_points(n=20000)
    assert back == sorted(set(zip((kx >> 10).tolist(), (ky >> 10).tolist())))


def test_salt_plan_and_salted_buckets(spark):
    from kblock_spark.ops.hierarchy import salt_plan, salted_by_plan

    pts = with_quad_cell(_points(spark, n=20000), 4)  # coarse → hot cells
    rollup = multires_rollup(_points(spark, n=20000), [4]).where("level = 4")
    plan = salt_plan(rollup.select("ix", "iy", "n_points"), 100, max_salt=8)
    pp = plan.toPandas()
    rr = rollup.toPandas()
    merged = rr.merge(pp, on=["ix", "iy"])
    assert (
        merged.salt == np.minimum(8, (merged.n_points + 99) // 100)
    ).all()
    salted = salted_by_plan(pts, plan, F.hash("lon", "lat")).toPandas()
    assert ((salted.salt_bucket >= 0) & (salted.salt_bucket < salted.salt)).all()
    # a hot cell's rows actually spread: the largest (cell, bucket)
    # group is far below the cell's row count
    hot = salted.groupby(["ix", "iy"]).size().idxmax()
    sub = salted.set_index(["ix", "iy"]).loc[[hot]]
    k = int(sub["salt"].iloc[0])
    assert k > 1
    per_bucket = sub.groupby("salt_bucket").size()
    assert len(per_bucket) == k
    assert per_bucket.max() < 0.75 * len(sub)
