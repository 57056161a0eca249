"""The snapshot table as a STREAMING SOURCE — Spark 4's public Python
DataSource API (pyspark.sql.datasource) over io/tableformat.py
manifests, the analogue of Iceberg's Structured Streaming read.

Offsets are snapshot ids: each micro-batch covers the snapshots in
(start, end] and emits exactly the files those snapshots ADDED, so a
growing crawl table is consumed incrementally — no re-scan of
accumulated history, restart-safe via the engine's offset log.
Append and merge-on-read-upsert snapshots are valid deltas (their
added files hold only new/updated rows); delete-mor and set-spec add
nothing and are skipped; overwrite/replace/CoW-rewrite snapshots are
NOT expressible as an append delta and fail the stream (the same
contract as :func:`incremental_read`).

Reads are Arrow-native: each partition is one data file, yielded as
pyarrow record batches (no per-row python loop).

The classes are built inside :func:`make_table_source` so cloudpickle
serializes them BY VALUE: the data-source planning worker is a bare
python process that cannot import this package (it does not inherit
``addPyFile`` shipping), so a module-level class — pickled by
reference — fails there with ModuleNotFoundError. Every method body
uses only stdlib + pyarrow for the same reason.

Usage::

    from kblock_spark.io.table_source import register_table_source
    register_table_source(spark)
    df = (spark.readStream.format("kblock_table")
          .option("path", table_dir)
          .load())
"""

from __future__ import annotations


def make_table_source():
    """Build the DataSource class (self-contained, pickled by value)."""
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    def _current_sid(path):
        try:
            with open(os.path.join(path, "metadata", "current")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest(path, sid):
        with open(
            os.path.join(path, "metadata", f"snap-{sid:05d}.json")
        ) as f:
            return json.load(f)

    delta_ops = {"append", "merge-mor"}
    empty_ops = {"delete-mor", "set-spec"}

    class _FilePartition(InputPartition):
        def __init__(self, path):
            self.path = path

    class SnapshotTableStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError(
                    "kblock_table source requires option 'path'"
                )
            self._from = int(options.get("from_snapshot", 0))

        def initialOffset(self):
            return {"snapshot_id": self._from}

        def latestOffset(self):
            cur = _current_sid(self._path)
            return {"snapshot_id": max(self._from, cur or 0)}

        def partitions(self, start, end):
            lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
            files = []
            sid = hi
            while sid > lo:
                m = _manifest(self._path, sid)
                op = m.get("operation")
                if op in delta_ops:
                    files.extend(
                        os.path.join(self._path, p)
                        for p in m.get("added", [])
                    )
                elif op not in empty_ops:
                    raise ValueError(
                        f"snapshot {sid} is {op!r}: table content was "
                        "rewritten, which a streaming append scan "
                        "cannot express — restart the stream from a "
                        "newer offset"
                    )
                parent = m.get("parent_id")
                sid = parent if parent is not None else lo
            if not files:
                return [_FilePartition("")]  # empty batch placeholder
            return [_FilePartition(f) for f in sorted(files)]

        def read(self, partition):
            if not partition.path:
                return iter(())
            import pyarrow.parquet as pq

            return pq.ParquetFile(partition.path).iter_batches(
                batch_size=16384
            )

        def commit(self, end):
            pass  # offsets live in the engine's checkpoint

        def stop(self):
            pass

    class SnapshotTableDataSource(DataSource):
        @classmethod
        def name(cls):
            return "kblock_table"

        def schema(self):
            path = self.options.get("path")
            if not path:
                raise ValueError(
                    "kblock_table source requires option 'path'"
                )
            return _manifest(path, _current_sid(path))["schema"]

        def streamReader(self, schema):
            return SnapshotTableStreamReader(self.options)

    return SnapshotTableDataSource


def register_table_source(spark) -> None:
    """Register the ``kblock_table`` streaming format on a session."""
    spark.dataSource.register(make_table_source())
