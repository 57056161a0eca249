"""Mergeable HLL sketch (ops/sketch.py): the algebraic merge law,
estimator accuracy, and integer-exactness of the register state."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.ops.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _vals(spark, lo, hi, tag="g"):
    return spark.range(lo, hi).select(
        F.lit(tag).alias("g"), F.concat(F.lit("tok_"), F.col("id")).alias("v")
    )


def _reg_set(df):
    return {
        (r["g"], r["bucket"], r["rho"]) for r in df.collect()
    }


def test_merge_law_sketch_of_union_equals_merge_of_sketches(spark):
    a = _vals(spark, 0, 4000)
    b = _vals(spark, 2000, 7000)          # overlapping halves
    whole = hll_registers(a.unionByName(b), ["g"], "v")
    merged = hll_merge(
        hll_registers(a, ["g"], "v"), hll_registers(b, ["g"], "v"), ["g"]
    )
    assert _reg_set(whole) == _reg_set(merged)


def test_merge_idempotent(spark):
    r = hll_registers(_vals(spark, 0, 1000), ["g"], "v")
    assert _reg_set(hll_merge(r, r, ["g"])) == _reg_set(r)


def test_estimate_accuracy_and_bounds(spark):
    # m=64 → relative standard error ~1.04/8 = 13%; the corpus is
    # deterministic so this is a frozen-behavior check, not a flaky
    # statistical one
    df = _vals(spark, 0, 5000)
    est = hll_estimate(hll_registers(df, ["g"], "v"), ["g"]).first()
    assert est["n_buckets"] == 64          # all registers hit at 5k
    assert est["z_scaled"] > 0
    rel = est["est_e6"] / 1e6 / 5000.0
    assert 0.65 < rel < 1.35
    # duplicates must not move a single register
    dup = df.unionByName(df).unionByName(df)
    est2 = hll_estimate(hll_registers(dup, ["g"], "v"), ["g"]).first()
    assert est2["est_e6"] == est["est_e6"]


def test_registers_bounded_and_grouped(spark):
    df = _vals(spark, 0, 3000, "a").unionByName(_vals(spark, 0, 50, "b"))
    regs = hll_registers(df, ["g"], "v", p=4)
    counts = {r["g"]: r["n"] for r in regs.groupBy("g").agg(
        F.count("*").alias("n")).collect()}
    assert counts["a"] <= 16 and counts["b"] <= 16
    rhos = [r["rho"] for r in regs.collect()]
    assert all(1 <= x <= 45 for x in rhos)   # wbits+1 = 44+1 at p=4


def test_partial_aggregation_in_plan(spark):
    """The registers groupBy must partial-aggregate map-side (the
    scale contract: the exchange carries ≤ groups × m rows, not token
    occurrences)."""
    regs = hll_registers(_vals(spark, 0, 1000), ["g"], "v")
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan


def test_persisted_register_merge_replay_idempotent(spark, tmp_path):
    """The s08 architecture: registers MAX-merged into a snapshot
    table absorb an at-least-once batch re-delivery by algebra — a
    replayed merge commits a new snapshot whose CONTENT is identical,
    and the final estimate equals the single-pass batch sketch
    (merge theorem, integer-exact)."""
    from kblock_spark.io.tableformat import (
        current_snapshot_id,
        overwrite_snapshot,
        read_snapshot,
    )

    t = str(tmp_path / "regs")
    a = _vals(spark, 0, 1200)
    b = _vals(spark, 800, 2000)

    def merge_batch(bdf):
        regs = hll_registers(bdf, ["g"], "v")
        if current_snapshot_id(t) is not None:
            regs = hll_merge(regs, read_snapshot(spark, t), ["g"])
        overwrite_snapshot(regs, t)

    merge_batch(a)
    merge_batch(b)
    streamed = _reg_set(read_snapshot(spark, t))
    merge_batch(b)  # at-least-once re-delivery
    assert _reg_set(read_snapshot(spark, t)) == streamed
    single_pass = _reg_set(hll_registers(a.unionByName(b), ["g"], "v"))
    assert streamed == single_pass
