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

ADMISSION CONTROL (``maxFilesPerTrigger`` / ``maxBytesPerTrigger``):
with a cap set, ``latestOffset`` stops at the newest snapshot whose
cumulative added-file count/bytes since the reader's cursor fits the
cap — a backlog of commits drains as a sequence of bounded
micro-batches instead of one giant batch, Spark's file-source pacing
re-expressed over snapshot ids (pacing is per whole snapshot, the
natural commit quantum; the first pending snapshot is always admitted
so progress is guaranteed even when one commit alone exceeds the
cap).

Cursor seeding — why ``paceCheckpoint`` exists: the engine decides a
micro-batch's END from the FIRST ``latestOffset()`` call, which
happens before ``initialOffset()`` on a fresh start and before
anything at all on a checkpoint restart (``AcceptsLatestSeenOffset``
stops at the JVM wrapper — the recovered offset is never forwarded
to Python readers). A reader that guesses a low first offset risks
writing a REGRESSED end into the offset log, which would replay
already-delivered files — silent duplicates. So the rule is: the
first batch is capped only when the true position is KNOWN, else it
is honestly unpaced. Passing ``paceCheckpoint`` = the query's
checkpoint directory makes it known: the reader consults Spark's own
offset WAL (``<ck>/offsets/``) — an absent/empty WAL proves a fresh
start (cursor = ``from_snapshot``), the newest entry's offset IS the
recovered position. If the WAL is unreadable, or holds more than one
source offset (a multi-source query — line-to-source mapping would
be a guess, and guessing low is the regression hazard above), the
reader falls back to the unpaced first batch. After the first batch,
every ``partitions`` call re-synchronizes the cursor, so pacing is
always in force from the second batch onward regardless.

``skipRewrites=true`` lets the stream SURVIVE table maintenance:
replace/overwrite snapshots are treated as empty deltas instead of
failing the query — correct when the rewrites are pure re-layout
(compaction, z-order: same rows, new files), which is why it is an
explicit opt-in exactly like Iceberg's
``streaming-skip-overwrite-snapshots`` (a true overwrite's new rows
would be silently skipped).

``ref=<name>`` streams a BRANCH (or tag) head instead of main — the
read side of write-audit-publish (audit jobs stream the branch as
crawls land on it, main's consumers never see unpublished data); a
tag ref is a frozen endpoint: the stream drains up to the tagged
snapshot and then idles.

``withSnapshotId=true`` appends a ``_snapshot_id`` BIGINT column
stamping every row with the snapshot that added it — the change-feed
ordering key a downstream upsert fold needs (latest snapshot wins per
key) to reconstruct the table's merge-on-read state from the
append-only stream.

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
          .option("maxFilesPerTrigger", 2)
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

    def _current_sid(path, ref="main"):
        # ref resolution mirrors tableformat._resolve_ref without
        # importing it (this closure ships by value): main = the
        # ``current`` pointer, else a branch pointer, else a tag
        names = (
            ["current"]
            if ref == "main"
            else [f"ref-{ref}", f"tag-{ref}"]
        )
        for n in names:
            try:
                with open(os.path.join(path, "metadata", n)) as f:
                    return int(f.read().strip())
            except FileNotFoundError:
                continue
        return None

    def _manifest(path, sid):
        with open(
            os.path.join(path, "metadata", f"snap-{sid:05d}.json")
        ) as f:
            return json.load(f)

    def _truthy(v):
        return str(v).strip().lower() in ("1", "true", "yes")

    delta_ops = {"append", "merge-mor"}
    empty_ops = {"delete-mor", "set-spec"}

    class _FilePartition(InputPartition):
        def __init__(self, path, sid=0):
            self.path = path
            self.sid = sid

    class SnapshotTableStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError(
                    "kblock_table source requires option 'path'"
                )
            self._from = int(options.get("from_snapshot", 0))
            self._ref = options.get("ref", "main")
            self._skip_rewrites = _truthy(options.get("skipRewrites", ""))
            self._max_files = int(options.get("maxFilesPerTrigger", 0))
            self._max_bytes = int(options.get("maxBytesPerTrigger", 0))
            self._with_sid = _truthy(options.get("withSnapshotId", ""))
            self._ck = options.get("paceCheckpoint")
            # pacing cursor: the newest snapshot id this reader has
            # already handed to the engine (None until the checkpoint
            # WAL, initialOffset, or the first partitions call
            # reveals the position)
            self._cursor = None

        def _ckpt_cursor(self):
            """Recover the pacing cursor from the engine's own offset
            WAL (see module docstring). Returns the last logged
            snapshot id, ``from_snapshot`` for a provably fresh
            checkpoint, or None when the position cannot be known
            safely (no paceCheckpoint option, unreadable WAL, or a
            multi-source query)."""
            if not self._ck:
                return None
            d = os.path.join(self._ck, "offsets")
            try:
                names = [n for n in os.listdir(d) if n.isdigit()]
            except FileNotFoundError:
                return self._from  # fresh start, proven
            if not names:
                return self._from
            try:
                with open(os.path.join(d, max(names, key=int))) as f:
                    lines = f.read().splitlines()
            except OSError:
                return None
            found = []
            for ln in lines[2:]:  # line 1: version, line 2: metadata
                try:
                    o = json.loads(ln)
                except (ValueError, TypeError):
                    continue
                if isinstance(o, dict) and "snapshot_id" in o:
                    found.append(int(o["snapshot_id"]))
            # exactly one source offset or the mapping is a guess
            return found[0] if len(found) == 1 else None

        def initialOffset(self):
            # called AFTER the first latestOffset (engine order): only
            # seed the cursor if pacing hasn't already advanced it
            if self._cursor is None:
                self._cursor = self._from
            return {"snapshot_id": self._from}

        def _chain_desc(self, lo, hi):
            """(sid, manifest) pairs for snapshots in (lo, hi],
            newest first, following parent links (ids are global
            across refs, so the walk is by parenthood, not by id
            arithmetic)."""
            out = []
            sid = hi
            while sid is not None and sid > lo:
                m = _manifest(self._path, sid)
                out.append((sid, m))
                sid = m.get("parent_id")
                if sid is None:
                    break
            return out

        def _added_cost(self, m):
            """(files, bytes) a snapshot added. Byte sizes come from
            the manifest entries when recorded, else one os.stat per
            added file — metadata-only either way."""
            added = set(m.get("added") or [])
            if not added:
                return 0, 0
            by_path = {
                e["path"]: e for e in m.get("files") or []
                if e["path"] in added
            }
            n_bytes = 0
            for p in added:
                e = by_path.get(p) or {}
                if "bytes" in e:
                    n_bytes += int(e["bytes"])
                else:
                    try:
                        n_bytes += os.path.getsize(
                            os.path.join(self._path, p)
                        )
                    except OSError:
                        pass
            return len(added), n_bytes

        def latestOffset(self):
            head = _current_sid(self._path, self._ref)
            target = max(self._from, head or 0)
            capped = self._max_files > 0 or self._max_bytes > 0
            if capped and self._cursor is None:
                self._cursor = self._ckpt_cursor()
            if not capped or self._cursor is None or target <= self._cursor:
                # uncapped, blind restart (see module docstring), or
                # nothing new — hand over the head as-is
                if self._cursor is None or target > (self._cursor or 0):
                    self._cursor = target
                return {"snapshot_id": max(self._from, self._cursor or 0)}
            pending = self._chain_desc(self._cursor, target)
            pending.reverse()  # oldest first: admit in commit order
            end = self._cursor
            tot_f = tot_b = 0
            admitted_any = False
            for sid, m in pending:
                nf, nb = self._added_cost(m)
                over = (
                    (self._max_files and tot_f + nf > self._max_files)
                    or (self._max_bytes and tot_b + nb > self._max_bytes)
                )
                # always admit the FIRST file-adding snapshot: a
                # single commit larger than the cap must still drain
                if nf and over and admitted_any:
                    break
                tot_f += nf
                tot_b += nb
                if nf:
                    admitted_any = True
                end = sid
            self._cursor = end
            return {"snapshot_id": end}

        def partitions(self, start, end):
            lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
            # re-sync the pacing cursor with the engine's truth (the
            # offset log) — after a checkpoint restart this is the
            # first place the true position is visible
            if self._cursor is None or hi > self._cursor:
                self._cursor = hi
            files = []
            sid = hi
            while sid > lo:
                m = _manifest(self._path, sid)
                op = m.get("operation")
                if op in delta_ops:
                    files.extend(
                        (os.path.join(self._path, p), sid)
                        for p in m.get("added", [])
                    )
                elif op not in empty_ops and not self._skip_rewrites:
                    raise ValueError(
                        f"snapshot {sid} is {op!r}: table content was "
                        "rewritten, which a streaming append scan "
                        "cannot express — restart the stream from a "
                        "newer offset, or pass skipRewrites=true if "
                        "the rewrites are pure maintenance "
                        "(compaction / z-order re-layout)"
                    )
                parent = m.get("parent_id")
                sid = parent if parent is not None else lo
            if not files:
                return [_FilePartition("")]  # empty batch placeholder
            return [_FilePartition(f, s) for f, s in sorted(files)]

        def read(self, partition):
            if not partition.path:
                return iter(())
            import pyarrow as pa
            import pyarrow.parquet as pq

            batches = pq.ParquetFile(partition.path).iter_batches(
                batch_size=16384
            )
            if not self._with_sid:
                return batches
            sid = int(partition.sid)

            def _stamped():
                for b in batches:
                    col = pa.nulls(b.num_rows, pa.int64()).fill_null(sid)
                    yield pa.RecordBatch.from_arrays(
                        list(b.columns) + [col],
                        names=list(b.schema.names) + ["_snapshot_id"],
                    )

            return _stamped()

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
            ref = self.options.get("ref", "main")
            cur = _current_sid(path, ref)
            if cur is None:
                what = (
                    "no snapshot yet — commit one (append_snapshot) "
                    "before streaming from it"
                    if ref == "main"
                    else f"no branch or tag {ref!r}"
                )
                raise ValueError(f"table at {path!r} has {what}")
            ddl = _manifest(path, cur)["schema"]
            if _truthy(self.options.get("withSnapshotId", "")):
                # schema is a simpleString: struct<a:bigint,...>
                ddl = ddl[:-1] + ",_snapshot_id:bigint>"
            return ddl

        def streamReader(self, schema):
            return SnapshotTableStreamReader(self.options)

    return SnapshotTableDataSource


def register_table_source(spark) -> None:
    """Register the ``kblock_table`` streaming format on a session."""
    spark.dataSource.register(make_table_source())
