"""Runtime data-contract guards (the reference's inline assertion
layer) — both the passing and the failing direction."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.ops.validate import (
    DataContractError,
    assert_conserved,
    assert_non_null,
    assert_unique,
    validate_pipeline_outputs,
)


def test_unique_and_non_null(spark):
    ok = spark.createDataFrame([(1, "a"), (2, "b")], "id long, g string")
    assert_unique(ok, ["id"])
    assert_non_null(ok, ["g"])
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "id long, g string")
    with pytest.raises(DataContractError, match="duplicate"):
        assert_unique(dup, ["id"])
    nul = spark.createDataFrame([(1, None)], "id long, g string")
    with pytest.raises(DataContractError, match="null"):
        assert_non_null(nul, ["g"])


def test_conservation(spark):
    a = spark.createDataFrame([(10.0,), (20.0,)], "v double")
    b = spark.createDataFrame([(30.0,)], "v double")
    assert_conserved(a, b, F.sum("v"), F.sum("v"))
    c = spark.createDataFrame([(31.0,)], "v double")
    with pytest.raises(DataContractError, match="conservation"):
        assert_conserved(a, c, F.sum("v"), F.sum("v"))


def test_pipeline_contract(spark):
    from kblock_spark.pipeline import run_pipeline

    dfs = run_pipeline(spark, n_pages=800, nx=2, ny=2, grid=2)
    dfs["blocks"] = dfs["blocks"].cache()
    dfs["buildings"] = dfs["buildings"].cache()
    dfs["complexity"] = dfs["complexity"].cache()
    validate_pipeline_outputs(dfs)  # must not raise
