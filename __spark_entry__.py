"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in :mod:`kblock_spark.queries` (one Spark
plan + one oracle SQL per operator, side by side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from kblock_spark.queries import REGISTRY  # noqa: E402

_SHIPPED_SESSIONS: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``kblock_spark`` importable on Spark python WORKERS even
    when the driver runs from another cwd: zip the package once and
    addPyFile it (the spark-submit --py-files equivalent, applied
    lazily)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    import hashlib
    import tempfile
    import zipfile

    pkg = os.path.join(_REPO, "kblock_spark")
    sources = []
    for root, _dirs, files in os.walk(pkg):
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    h = hashlib.md5()
    for full in sorted(sources):
        with open(full, "rb") as fh:
            h.update(fh.read())
    # content-addressed zip name: a stale cached zip must never ship
    # old code to the workers
    zpath = os.path.join(
        tempfile.gettempdir(), f"kblock_spark_pkg_{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for full in sources:
                z.write(full, os.path.relpath(full, _REPO))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added in this context
    _SHIPPED_SESSIONS.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full kblock-style pipeline — synthetic pages →
    geocoded points → block delineation → tile PIP join →
    k-complexity — at smoke scale."""
    _ship_package(spark)
    from kblock_spark.pipeline import run_pipeline

    dfs = run_pipeline(spark, n_pages=1500, nx=2, ny=2, grid=2)
    return dfs["complexity"]


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
