"""Round-7 tableformat hardening: snapshot_diff across equality
deletes, atomic stale-claim breaking, hive-escaped partition values,
streaming-source admission control, and the empty-table error."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from kblock_spark.io.table_source import register_table_source
from kblock_spark.io.tableformat import (
    CommitConflict,
    _all_refs,
    append_snapshot,
    create_branch,
    current_snapshot_id,
    delete_keys_mor,
    plan_files,
    read_snapshot,
    set_partition_spec,
    snapshot_diff,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 100).alias("v")
    )


def test_snapshot_diff_across_equality_delete(spark, tmp_path):
    """A diff range spanning a delete_keys_mor snapshot used to crash
    (eq-delete files hold only the key column, no file_path) — and a
    kind filter alone would silently MISS the eq-deleted rows."""
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 20).coalesce(1), t)  # sid 1
    keys = spark.createDataFrame([(3,), (7,)], "doc_id long")
    delete_keys_mor(spark, t, keys, "doc_id")  # sid 2 (eq delete)
    d = snapshot_diff(spark, t, 1, 2, ["doc_id"]).collect()
    assert {(r["op"], r["doc_id"]) for r in d} == {
        ("delete", 3),
        ("delete", 7),
    }
    # a row re-appended AFTER the eq delete survives (seq scoping);
    # the diff across the whole range nets out to one delete
    append_snapshot(_df(spark, 3, 4).coalesce(1), t)  # sid 3
    d2 = snapshot_diff(spark, t, 2, 3, ["doc_id"]).collect()
    assert {(r["op"], r["doc_id"]) for r in d2} == {("insert", 3)}
    d3 = snapshot_diff(spark, t, 1, 3, ["doc_id"]).collect()
    assert {(r["op"], r["doc_id"]) for r in d3} == {("delete", 7)}


def test_break_marker_serializes_stale_claim_breakers(spark, tmp_path):
    """While another breaker holds the break marker, a commit must
    conflict instead of interleaving remove/link with it."""
    from kblock_spark.io import tableformat as tf

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)
    debris = {"operation": "append", "schema": "", "stat_cols": [],
              "files": [], "added": [], "snapshot_id": 2,
              "parent_id": 1, "ts": 0}
    snap = tf._snap_path(t, 2)
    with open(snap, "w") as f:
        json.dump(debris, f)
    old = time.time() - tf._STALE_CLAIM_S - 60
    os.utime(snap, (old, old))
    # a competing breaker holds the marker (fresh)
    with open(snap + ".break", "w") as f:
        f.write("x")
    with pytest.raises(CommitConflict, match="broken by a concurrent"):
        append_snapshot(_df(spark, 10, 20), t, commit_retries=0)
    # the competing breaker crashed: its marker goes stale too and
    # the next writer clears it, then breaks the claim and commits
    os.utime(snap + ".break", (old, old))
    sid = append_snapshot(_df(spark, 10, 25), t, commit_retries=1)
    assert sid == 2
    assert read_snapshot(spark, t).count() == 25
    assert not os.path.exists(snap + ".break")


def test_identity_partition_prune_unescapes_hive_values(spark, tmp_path):
    """Spark %-escapes '=', ':', '%' in hive partition dir names; the
    manifest must record the REAL value or identity pruning skips
    files that contain matching rows (silent missing rows)."""
    t = str(tmp_path / "tbl")
    df0 = spark.createDataFrame([("zz", 0)], "k string, v long")
    append_snapshot(df0.coalesce(1), t, stat_cols=["k"])
    set_partition_spec(t, [{"col": "k", "transform": "identity"}])
    df = spark.createDataFrame(
        [("a=1", 1), ("b:2", 2), ("c%3", 3)], "k string, v long"
    )
    append_snapshot(df.repartition("k"), t)
    for key, v in (("a=1", 1), ("b:2", 2), ("c%3", 3)):
        got = read_snapshot(spark, t, prune=("k", key, key)).collect()
        assert [(r["k"], r["v"]) for r in got] == [(key, v)], key
    # and the prune actually prunes: a non-matching range plans fewer
    # files than the full table
    assert len(plan_files(t, prune=("k", "a=1", "a=1"))) < len(
        plan_files(t)
    )


def test_crashed_branch_temp_is_not_a_phantom_ref(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 5), t)
    create_branch(t, "audit")
    # debris a crashed create_branch leaves with the dot-prefixed
    # temp naming — must not surface as a ref / GC root
    with open(os.path.join(t, "metadata", ".ref-audit.deadbeef"), "w") as f:
        f.write("1")
    assert _all_refs(t) == ["main", "audit"]


def test_stream_source_empty_table_raises_clear_error(spark, tmp_path):
    register_table_source(spark)
    empty = str(tmp_path / "empty")
    os.makedirs(os.path.join(empty, "metadata"))
    with pytest.raises(Exception, match="no snapshot"):
        (
            spark.readStream.format("kblock_table")
            .option("path", empty)
            .load()
        )


def test_rate_limited_backlog_drains_in_bounded_batches(spark, tmp_path):
    """VERDICT r6 #1: a 5-commit backlog with maxFilesPerTrigger=2
    must drain in >=3 bounded micro-batches that together equal the
    table content — not one giant batch."""
    register_table_source(spark)
    t, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")
    for i in range(5):
        append_snapshot(_df(spark, i * 10, (i + 1) * 10).coalesce(1), t)
    seen: list[tuple[int, int]] = []  # (batch_id, rows)
    got_ids: set[int] = set()

    def sink(bdf, bid):
        rows = bdf.collect()
        if rows:
            seen.append((bid, len(rows)))
            got_ids.update(r["doc_id"] for r in rows)

    q = (
        spark.readStream.format("kblock_table")
        .option("path", t)
        .option("maxFilesPerTrigger", "2")
        .option("paceCheckpoint", ck)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()  # drain: latestOffset advances per trigger
    q.stop()
    assert got_ids == set(range(50))
    assert len(seen) >= 3, seen
    # every batch bounded by the cap: 2 files x 10 rows
    assert all(rows <= 20 for _, rows in seen), seen


def test_byte_cap_admits_one_snapshot_per_trigger(spark, tmp_path):
    """maxBytesPerTrigger=1 forces the minimum quantum: exactly one
    file-adding snapshot per micro-batch (first-admit progress
    guarantee), so 3 commits drain as 3 batches."""
    register_table_source(spark)
    t, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")
    for i in range(3):
        append_snapshot(_df(spark, i * 10, (i + 1) * 10).coalesce(1), t)
    seen: list[int] = []
    got_ids: set[int] = set()

    def sink(bdf, bid):
        rows = bdf.collect()
        if rows:
            seen.append(len(rows))
            got_ids.update(r["doc_id"] for r in rows)

    q = (
        spark.readStream.format("kblock_table")
        .option("path", t)
        .option("maxBytesPerTrigger", "1")
        .option("paceCheckpoint", ck)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert got_ids == set(range(30))
    assert seen == [10, 10, 10]


def test_restart_against_backlog_stays_paced(spark, tmp_path):
    """The round-6 gap itself: a stream restarting against a backlog
    of commits must drain it in bounded micro-batches, not one giant
    batch — paceCheckpoint recovers the cursor from the offset WAL."""
    register_table_source(spark)
    t, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")
    append_snapshot(_df(spark, 0, 10).coalesce(1), t)
    seen: list[int] = []
    got_ids: set[int] = set()

    def sink(bdf, bid):
        rows = bdf.collect()
        if rows:
            seen.append(len(rows))
            got_ids.update(r["doc_id"] for r in rows)

    def run_stream():
        q = (
            spark.readStream.format("kblock_table")
            .option("path", t)
            .option("maxFilesPerTrigger", "1")
            .option("paceCheckpoint", ck)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_stream()
    assert got_ids == set(range(10))
    # stream is DOWN; a 4-commit backlog accumulates
    for i in range(1, 5):
        append_snapshot(_df(spark, i * 10, (i + 1) * 10).coalesce(1), t)
    run_stream()
    assert got_ids == set(range(50))
    # every batch (including the first after restart) bounded: 1 file
    assert all(rows <= 10 for rows in seen), seen
    assert len(seen) == 5, seen


def test_stream_with_snapshot_id_column(spark, tmp_path):
    """withSnapshotId stamps each row with the snapshot that added it
    — the ordering key for downstream upsert folds."""
    register_table_source(spark)
    t, out, ck = (str(tmp_path / p) for p in ("tbl", "out", "ck"))
    append_snapshot(_df(spark, 0, 10).coalesce(1), t)  # sid 1
    append_snapshot(_df(spark, 10, 20).coalesce(1), t)  # sid 2
    q = (
        spark.readStream.format("kblock_table")
        .option("path", t)
        .option("withSnapshotId", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.columns[-1] == "_snapshot_id"
    by_sid = {
        r["_snapshot_id"]: r["n"]
        for r in got.groupBy("_snapshot_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_sid == {1: 10, 2: 10}
    assert got.where("doc_id < 10 AND _snapshot_id = 1").count() == 10


def test_current_snapshot_unaffected_by_fixes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)
    assert current_snapshot_id(t) == 1


def test_stream_from_branch_ref(spark, tmp_path):
    """ref=<branch> streams the audit branch's commits while main's
    readers see nothing unpublished — the read side of WAP."""
    from kblock_spark.io.tableformat import create_branch, create_tag

    register_table_source(spark)
    t, out, ck, out2, ck2 = (
        str(tmp_path / p) for p in ("tbl", "out", "ck", "out2", "ck2")
    )
    append_snapshot(_df(spark, 0, 10).coalesce(1), t)  # main sid 1
    create_tag(t, "v1")
    create_branch(t, "audit")
    append_snapshot(_df(spark, 10, 30).coalesce(1), t, ref="audit")

    def drain(ref, o, c):
        q = (
            spark.readStream.format("kblock_table")
            .option("path", t)
            .option("ref", ref)
            .load()
            .writeStream.format("parquet")
            .option("path", o)
            .option("checkpointLocation", c)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["doc_id"] for r in spark.read.parquet(o).collect()}

    assert drain("audit", out, ck) == set(range(30))
    # a tag is a frozen endpoint: only the tagged snapshot's history
    assert drain("v1", out2, ck2) == set(range(10))


def test_stream_survives_compaction_with_skip_rewrites(spark, tmp_path):
    """skipRewrites=true: table maintenance (compaction) landing
    between micro-batches no longer kills the stream — the replace
    snapshot is an empty delta (same rows, new layout) and later
    appends keep flowing. Without the option the stream still fails
    fast (a true overwrite must not be silently skipped)."""
    from kblock_spark.io.tableformat import compact_data_files

    register_table_source(spark)
    t, out, ck = (str(tmp_path / p) for p in ("tbl", "out", "ck"))
    append_snapshot(_df(spark, 0, 20).coalesce(1), t)

    def drain():
        q = (
            spark.readStream.format("kblock_table")
            .option("path", t)
            .option("skipRewrites", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["doc_id"] for r in spark.read.parquet(out).collect()}

    assert drain() == set(range(20))
    compact_data_files(spark, t, target_files=1)  # maintenance lands
    append_snapshot(_df(spark, 20, 30).coalesce(1), t)
    # resumes across the replace snapshot; only the new append arrives
    assert drain() == set(range(30))


def test_branch_scoped_mor_writes(spark, tmp_path):
    """merge_into_mor / delete_where_mor / delete_keys_mor with
    ref=<branch> extend only the branch's chain: main's row set is
    untouched until publish, then sees the branch's merged state."""
    from kblock_spark.io.tableformat import (
        delete_where_mor,
        merge_into_mor,
        publish_branch,
        ref_head,
    )

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 20).coalesce(1), t, stat_cols=["doc_id"])
    main_head = current_snapshot_id(t)
    create_branch(t, "audit")
    upd = spark.createDataFrame([(5, 999), (100, 1)], "doc_id long, v long")
    r = merge_into_mor(spark, t, upd, "doc_id", ref="audit")
    assert r["rows_shadowed"] == 1
    delete_where_mor(spark, t, "doc_id = 7", ref="audit")
    delete_keys_mor(
        spark, t, spark.createDataFrame([(9,)], "doc_id long"),
        "doc_id", ref="audit",
    )
    # isolation: main's pointer and row set are untouched
    assert current_snapshot_id(t) == main_head
    main_rows = {
        (r["doc_id"], r["v"]) for r in read_snapshot(spark, t).collect()
    }
    assert main_rows == {(i, i * 7 % 100) for i in range(20)}
    # branch read sees merge + both deletes
    br = {
        (r["doc_id"], r["v"])
        for r in read_snapshot(spark, t, ref="audit").collect()
    }
    expect = {(i, i * 7 % 100) for i in range(20) if i not in (5, 7, 9)}
    expect |= {(5, 999), (100, 1)}
    assert br == expect
    publish_branch(t, "audit")
    post = {
        (r["doc_id"], r["v"]) for r in read_snapshot(spark, t).collect()
    }
    assert post == expect
    # publish fast-forwards main and retires the branch pointer
    assert ref_head(t, "audit") is None


def test_branch_mor_unknown_ref_raises(spark, tmp_path):
    from kblock_spark.io.tableformat import merge_into_mor

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 5).coalesce(1), t)
    upd = spark.createDataFrame([(1, 2)], "doc_id long, v long")
    with pytest.raises(FileNotFoundError, match="ref 'nope'"):
        merge_into_mor(spark, t, upd, "doc_id", ref="nope")


def test_inspect_tables(spark, tmp_path):
    """Iceberg-style metadata tables: snapshots/files/refs built from
    manifests only, consistent with each other and with the data."""
    from kblock_spark.io.tableformat import (
        create_tag,
        delete_where_mor,
        inspect_files,
        inspect_refs,
        inspect_snapshots,
    )

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 50).repartition(2), t)
    append_snapshot(_df(spark, 50, 80).repartition(1), t)
    delete_where_mor(spark, t, "doc_id < 5")
    keys = spark.createDataFrame([(60,), (61,)], "doc_id long")
    delete_keys_mor(spark, t, keys, "doc_id")
    create_tag(t, "pin", 2)
    create_branch(t, "wip")

    snaps = {r["snapshot_id"]: r for r in inspect_snapshots(spark, t).collect()}
    assert [snaps[i]["operation"] for i in (1, 2, 3, 4)] == [
        "append", "append", "delete-mor", "delete-mor"]
    assert snaps[1]["added_files"] == 2 and snaps[1]["added_rows"] == 50
    assert snaps[2]["added_rows"] == 30 and snaps[2]["total_rows"] == 80
    # MOR deletes leave data-file accounting untouched
    assert snaps[4]["total_rows"] == 80 and snaps[4]["n_delete_files"] == 2
    assert snaps[4]["total_bytes"] > 0

    files = inspect_files(spark, t).collect()
    kinds = {r["content"] for r in files}
    assert kinds == {"data", "pos-delete", "eq-delete"}
    data_rows = sum(r["rows"] for r in files if r["content"] == "data")
    assert data_rows == snaps[4]["total_rows"]
    eq = [r for r in files if r["content"] == "eq-delete"]
    assert eq[0]["seq"] is not None  # eq deletes are sequence-scoped
    # live row count = data rows minus both delete sets
    assert read_snapshot(spark, t).count() == 80 - 5 - 2

    refs = {(r["name"], r["type"]): r["snapshot_id"]
            for r in inspect_refs(spark, t).collect()}
    assert refs[("main", "main")] == 4
    assert refs[("wip", "branch")] == 4
    assert refs[("pin", "tag")] == 2

    # time travel: the snapshot-2 files listing has no delete files
    f2 = inspect_files(spark, t, snapshot_id=2).collect()
    assert {r["content"] for r in f2} == {"data"}
    assert sum(r["rows"] for r in f2) == 80


def test_timestamp_as_of_travel(spark, tmp_path):
    """FOR TIMESTAMP AS OF: wall-time travel resolves to the newest
    snapshot committed at or before the timestamp, refs included."""
    from kblock_spark.io.tableformat import read_snapshot, snapshot_as_of

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10).coalesce(1), t)
    t1 = time.time()
    time.sleep(0.05)
    append_snapshot(_df(spark, 10, 30).coalesce(1), t)
    t2 = time.time()
    time.sleep(0.05)
    append_snapshot(_df(spark, 30, 35).coalesce(1), t)

    assert snapshot_as_of(t, t1) == 1
    assert snapshot_as_of(t, t2) == 2
    assert snapshot_as_of(t, time.time()) == 3
    assert read_snapshot(spark, t, as_of=t1).count() == 10
    assert read_snapshot(spark, t, as_of=t2).count() == 30
    # before the first commit → explicit error, never "latest"
    with pytest.raises(ValueError, match="no snapshot"):
        snapshot_as_of(t, t1 - 3600)
    with pytest.raises(ValueError, match="not both"):
        read_snapshot(spark, t, snapshot_id=1, as_of=t1)
    # branch ancestry: a branch frozen at snapshot 2 never resolves
    # past its own head even for a NOW timestamp
    create_branch(t, "b2", at=2)
    assert snapshot_as_of(t, time.time(), ref="b2") == 2
    # committed_at surfaces in the snapshots inspection table
    from kblock_spark.io.tableformat import inspect_snapshots

    rows = {r["snapshot_id"]: r for r in inspect_snapshots(spark, t).collect()}
    assert rows[1]["committed_at"] <= t1 and rows[2]["committed_at"] <= t2
    assert rows[1]["committed_at"] < rows[3]["committed_at"]
