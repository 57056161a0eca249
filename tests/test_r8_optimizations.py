"""Focused tests for the round-8 optimization internals.

- append_snapshots_split must be commit-for-commit equivalent to N
  separate append_snapshot calls (chain shape, manifests, visible
  rows, per-snapshot deltas).
- The Catalyst cell expressions introduced in ops/population.py must
  be bit-identical to the numpy tiling they replaced (cell_of /
  cells_covering_bbox), including on negative coordinates and
  cell-boundary-adjacent values.
"""

import numpy as np
from pyspark.sql import functions as F

from kblock_spark.geo.tiling import cell_of, cells_covering_bbox
from kblock_spark.io.tableformat import (
    append_snapshot,
    append_snapshots_split,
    current_snapshot_id,
    incremental_read,
    read_manifest,
    read_snapshot,
)


def snapshot_chain(path):
    """Oldest-first snapshot ids via parent links."""
    out = []
    sid = current_snapshot_id(path)
    while sid is not None:
        out.append(sid)
        sid = read_manifest(path, sid).get("parent_id")
    return list(reversed(out))
from kblock_spark.ops.population import _box_cells_expr, _cell_expr


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("lang"),
    )


def test_append_snapshots_split_equals_n_appends(spark, tmp_path):
    d = _docs(spark).withColumn("__b", F.pmod(F.col("doc_id"), F.lit(3)))
    t_split = str(tmp_path / "t_split")
    t_loop = str(tmp_path / "t_loop")
    sids = append_snapshots_split(d.repartition(1), t_split, "__b", [0, 1, 2])
    for i in range(3):
        append_snapshot(
            d.where(F.col("__b") == i).drop("__b").coalesce(1), t_loop
        )
    assert len(sids) == 3
    # same chain length and operations
    ch_s = snapshot_chain(t_split)
    ch_l = snapshot_chain(t_loop)
    assert len(ch_s) == len(ch_l) == 3
    for sid_s, sid_l in zip(ch_s, ch_l):
        m_s, m_l = read_manifest(t_split, sid_s), read_manifest(t_loop, sid_l)
        assert m_s["operation"] == m_l["operation"] == "append"
        assert m_s["schema"] == m_l["schema"]
        assert len(m_s["added"]) == len(m_l["added"]) == 1
    # same visible rows, and the same per-snapshot incremental delta
    rows_s = {
        (r["doc_id"], r["lang"])
        for r in read_snapshot(spark, t_split).collect()
    }
    rows_l = {
        (r["doc_id"], r["lang"])
        for r in read_snapshot(spark, t_loop).collect()
    }
    assert rows_s == rows_l
    for k, (sid_s, sid_l) in enumerate(zip(ch_s, ch_l)):
        inc_s = {
            (r["doc_id"], r["lang"])
            for r in incremental_read(spark, t_split, sid_s - 1, sid_s).collect()
        }
        want = {
            (r["doc_id"], r["lang"])
            for r in d.where(F.col("__b") == k).drop("__b").collect()
        }
        assert inc_s == want


def test_append_snapshots_split_rejects_spec_tables(spark, tmp_path):
    from kblock_spark.io.tableformat import set_partition_spec

    t = str(tmp_path / "t_spec")
    append_snapshot(_docs(spark), t)
    set_partition_spec(t, [{"col": "lang", "transform": "identity"}])
    try:
        append_snapshots_split(
            _docs(spark).withColumn("__b", F.lit(0)), t, "__b", [0]
        )
        raise AssertionError("expected ValueError on spec table")
    except ValueError:
        pass


def test_cell_expr_matches_numpy(spark):
    rng = np.random.default_rng(7)
    cell_deg = 0.003
    lons = np.concatenate(
        [
            rng.uniform(-180, 180, 300),
            # boundary-adjacent values (the floor edge cases)
            np.array([0.0, -0.003, 0.003, 0.0015, -179.9985, 179.9985]),
        ]
    )
    lats = np.concatenate(
        [rng.uniform(-90, 90, 300), np.array([0.0, -0.003, 0.003, 0.0015, -89.9985, 89.9985])]
    )
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon": lons, "lat": lats}))
    got = (
        df.select(_cell_expr(F.col("lon"), F.col("lat"), cell_deg).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    want = cell_of(lons, lats, cell_deg)
    assert (got == want).all()


def test_box_cells_expr_matches_numpy(spark):
    rng = np.random.default_rng(13)
    cell_deg = 0.003
    rows = []
    for _ in range(120):
        x0 = float(rng.uniform(-10, 10))
        y0 = float(rng.uniform(-5, 5))
        rows.append((x0, y0, x0 + float(rng.uniform(0, 0.02)),
                     y0 + float(rng.uniform(0, 0.02))))
    # degenerate and boundary-aligned boxes
    rows += [(0.0, 0.0, 0.0, 0.0), (-0.003, -0.003, 0.003, 0.003),
             (0.0015, 0.0015, 0.0015, 0.0015)]
    df = spark.createDataFrame(rows, "xmin double, ymin double, xmax double, ymax double")
    got = df.select(
        _box_cells_expr(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            cell_deg,
        ).alias("cells")
    ).collect()
    for (x0, y0, x1, y1), r in zip(rows, got):
        want = set(cells_covering_bbox(x0, y0, x1, y1, cell_deg).tolist())
        assert set(r["cells"]) == want, (x0, y0, x1, y1)
