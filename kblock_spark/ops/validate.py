"""Runtime data-contract guards — the reference's inline assertion
layer (SURVEY §5: CRS/type guards `1b:88,179`, uniqueness
`1c:229-230`, null guards `1a:251-252`, conservation logging
`1b:217-230`, `3:240-341`) as reusable distributed checks.

Each check is ONE aggregate job (no collect of data rows); failures
raise with a small sample of offending keys. Meant to be sprinkled at
stage boundaries of production runs exactly like the reference does."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class DataContractError(AssertionError):
    pass


def assert_unique(df: DataFrame, cols: list[str], what: str = "") -> None:
    """No duplicate keys (reference: duplicate block_id guard,
    batch_1c:229-230,351-352)."""
    dups = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") > 1)
    )
    sample = dups.limit(5).collect()
    if sample:
        raise DataContractError(
            f"duplicate keys in {what or cols}: "
            + str([tuple(r[c] for c in cols) for r in sample])
        )


def assert_non_null(df: DataFrame, cols: list[str], what: str = "") -> None:
    """Null guard (reference: gadm_code non-null, batch_1a:251-252)."""
    cond = None
    for c in cols:
        x = F.col(c).isNull()
        cond = x if cond is None else (cond | x)
    n = df.where(cond).count()
    if n:
        raise DataContractError(f"{n} null rows in {what or cols}")


def assert_conserved(
    left: DataFrame,
    right: DataFrame,
    expr_left,
    expr_right,
    rel_tol: float = 1e-6,
    what: str = "",
) -> None:
    """Scalar conservation between two tables (reference: block area ≈
    GADM area batch_1b:217-230; population share batch_3:240-341).
    expr_*: aggregate Columns, e.g. F.sum("block_area")."""
    a = left.agg(expr_left.alias("v")).collect()[0]["v"] or 0.0
    b = right.agg(expr_right.alias("v")).collect()[0]["v"] or 0.0
    denom = max(abs(float(b)), 1e-12)
    if abs(float(a) - float(b)) / denom > rel_tol:
        raise DataContractError(
            f"conservation violated ({what}): {a} vs {b} "
            f"(rel err {abs(float(a)-float(b))/denom:.2e} > {rel_tol})"
        )


def validate_pipeline_outputs(dfs: dict) -> None:
    """The reference's per-job invariant set over a pipeline run:
    unique block ids, non-null admin codes, one k row per block,
    building-count conservation."""
    assert_unique(dfs["blocks"], ["block_id"], "blocks.block_id")
    assert_non_null(dfs["blocks"], ["gadm_code", "country_code"], "blocks admin")
    assert_unique(dfs["complexity"], ["block_id"], "complexity.block_id")
    n_blocks = dfs["blocks"].count()
    n_k = dfs["complexity"].count()
    if n_blocks != n_k:
        raise DataContractError(f"k rows {n_k} != blocks {n_blocks}")
    assert_conserved(
        dfs["complexity"],
        dfs["buildings"],
        F.sum("building_count").cast("double"),
        F.count("*").cast("double"),
        rel_tol=0.0,
        what="building_count vs PIP rows",
    )
