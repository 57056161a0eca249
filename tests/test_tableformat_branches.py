"""Write-audit-publish branches: create_branch / branch appends /
publish_branch fast-forward, with main's readers isolated until
publish and GC treating live branches as roots."""

import pytest
from pyspark.sql import functions as F

from kblock_spark.io.tableformat import (
    CommitConflict,
    append_snapshot,
    create_branch,
    current_snapshot_id,
    drop_branch,
    expire_snapshots,
    publish_branch,
    read_snapshot,
    ref_head,
    remove_orphan_files,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 100).alias("v")
    )


def test_write_audit_publish_flow(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 50), t)
    create_branch(t, "audit")
    append_snapshot(_df(spark, 50, 80), t, ref="audit")
    append_snapshot(_df(spark, 80, 90), t, ref="audit")
    # main is isolated until publish; the branch sees everything
    assert read_snapshot(spark, t).count() == 50
    assert read_snapshot(spark, t, ref="audit").count() == 90
    head = ref_head(t, "audit")
    published = publish_branch(t, "audit")
    assert published == head
    assert current_snapshot_id(t) == head
    assert read_snapshot(spark, t).count() == 90
    assert ref_head(t, "audit") is None  # dropped after publish


def test_publish_refuses_diverged_main_when_strict(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)
    create_branch(t, "audit")
    append_snapshot(_df(spark, 10, 20), t, ref="audit")
    append_snapshot(_df(spark, 90, 95), t)  # main advances on its own
    with pytest.raises(CommitConflict, match="not an ancestor"):
        publish_branch(t, "audit", cherry_pick=False)
    # both lines still intact after the strict refusal
    assert read_snapshot(spark, t).count() == 15
    assert read_snapshot(spark, t, ref="audit").count() == 20
    # the default publish cherry-picks the branch onto the new head
    publish_branch(t, "audit")
    got = {r["doc_id"] for r in read_snapshot(spark, t).collect()}
    assert got == set(range(20)) | set(range(90, 95))


def test_gc_treats_branches_as_roots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 30), t)
    create_branch(t, "wip")
    append_snapshot(_df(spark, 30, 60), t, ref="wip")
    append_snapshot(_df(spark, 100, 105), t)  # main moves on
    removed = remove_orphan_files(t)
    assert read_snapshot(spark, t, ref="wip").count() == 60
    expire_snapshots(t, keep_last=1)
    # the branch chain survives expiry
    assert read_snapshot(spark, t, ref="wip").count() == 60
    assert read_snapshot(spark, t).count() == 35
    drop_branch(t, "wip")
    assert ref_head(t, "wip") is None


def test_branch_name_validation_and_duplicates(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 5), t)
    with pytest.raises(ValueError):
        create_branch(t, "main")
    with pytest.raises(ValueError):
        create_branch(t, "bad/name")
    create_branch(t, "a1")
    with pytest.raises(ValueError, match="already exists"):
        create_branch(t, "a1")


def test_concurrent_main_and_branch_commits_get_distinct_sids(spark, tmp_path):
    """Snapshot ids are allocated globally by the manifest claim: a
    branch commit that would collide with a main commit's id advances
    to the next free id instead of conflicting (and vice versa);
    both chains stay intact via parent_id."""
    from kblock_spark.io.tableformat import read_manifest

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)              # sid 1 (main)
    create_branch(t, "audit")                          # at 1
    s_main = append_snapshot(_df(spark, 10, 20), t)    # sid 2 (main)
    s_br = append_snapshot(_df(spark, 20, 30), t, ref="audit")
    assert s_main != s_br
    assert read_manifest(t, s_br)["parent_id"] == 1
    assert read_manifest(t, s_main)["parent_id"] == 1
    assert read_snapshot(spark, t).count() == 20
    assert read_snapshot(spark, t, ref="audit").count() == 20
    # interleave more commits on both refs: ids never collide
    s2 = append_snapshot(_df(spark, 30, 35), t, ref="audit")
    s3 = append_snapshot(_df(spark, 40, 45), t)
    assert len({1, s_main, s_br, s2, s3}) == 5
    # diverged → strict publish refuses (main has its own commits)
    with pytest.raises(CommitConflict):
        publish_branch(t, "audit", cherry_pick=False)


def test_cherry_pick_publish_preserves_both_lines(spark, tmp_path):
    """Round-7: publish onto an advanced main re-bases the branch's
    append snapshots as fresh commits — no data file is rewritten,
    history shows the cherry-picks, and the isolation guarantee (no
    unaudited data on main before publish) still holds."""
    from kblock_spark.io.tableformat import read_manifest

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)  # main sid 1
    create_branch(t, "audit")
    append_snapshot(_df(spark, 10, 20), t, ref="audit")
    append_snapshot(_df(spark, 20, 30), t, ref="audit")
    append_snapshot(_df(spark, 50, 55), t)  # main advances mid-audit
    branch_files = {
        e["path"] for e in read_manifest(t, ref_head(t, "audit"))["files"]
    }
    head = publish_branch(t, "audit")
    assert current_snapshot_id(t) == head
    got = {r["doc_id"] for r in read_snapshot(spark, t).collect()}
    assert got == set(range(30)) | set(range(50, 55))
    m = read_manifest(t)
    # re-base reused the branch's data files verbatim
    assert branch_files - {e["path"] for e in m["files"]} <= {
        e["path"] for e in read_manifest(t, 1)["files"]
    }
    assert "cherry_picked_from" in m
    assert ref_head(t, "audit") is None


def test_cherry_pick_publish_survives_commit_race(spark, tmp_path, monkeypatch):
    """A competing append landing DURING the cherry-pick publish is
    absorbed by the commit retry, not lost and not wedging."""
    from kblock_spark.io import tableformat as tf

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)
    create_branch(t, "audit")
    append_snapshot(_df(spark, 10, 20), t, ref="audit")
    append_snapshot(_df(spark, 50, 55), t)  # diverged before publish
    real = tf._commit
    raced = {"done": False}

    def racing(path, manifest, expected_parent, ref="main"):
        if not raced["done"] and manifest.get("cherry_picked_from"):
            raced["done"] = True  # set FIRST: the injected append
            # recurses into this wrapper and must pass through
            append_snapshot(_df(spark, 60, 65), t)
        return real(path, manifest, expected_parent, ref=ref)

    monkeypatch.setattr(tf, "_commit", racing)
    publish_branch(t, "audit")
    got = {r["doc_id"] for r in read_snapshot(spark, t).collect()}
    assert got == (
        set(range(20)) | set(range(50, 55)) | set(range(60, 65))
    )


def test_cherry_picked_rows_not_shadowed_by_concurrent_eq_delete(
    spark, tmp_path
):
    """Equality deletes landing on main during the audit must not
    shadow the branch's rows once published: the re-based file
    entries are re-stamped with their NEW commit sequence (Iceberg
    cherry-pick semantics)."""
    from kblock_spark.io.tableformat import delete_keys_mor

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 20).coalesce(1), t)  # seq 1
    create_branch(t, "audit")
    append_snapshot(_df(spark, 100, 110).coalesce(1), t, ref="audit")
    keys = spark.createDataFrame([(5,), (105,)], "doc_id long")
    delete_keys_mor(spark, t, keys, "doc_id")  # main eq delete
    publish_branch(t, "audit")
    got = {r["doc_id"] for r in read_snapshot(spark, t).collect()}
    # 5 (pre-delete file) is shadowed; 105 (published after) survives
    assert got == (set(range(20)) - {5}) | set(range(100, 110))


def test_tags_pin_snapshots_and_survive_expiry(spark, tmp_path):
    """Round-7: named tags — immutable refs, readable by name, GC
    roots for expire/vacuum, release-pinning semantics."""
    from kblock_spark.io.tableformat import (
        create_tag,
        drop_tag,
        expire_snapshots,
        list_tags,
    )

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)  # sid 1
    create_tag(t, "v1")
    append_snapshot(_df(spark, 10, 30), t)  # sid 2
    append_snapshot(_df(spark, 30, 60), t)  # sid 3
    assert list_tags(t) == {"v1": 1}
    assert read_snapshot(spark, t, ref="v1").count() == 10
    # tags are immutable and namespace-checked
    with pytest.raises(ValueError, match="already exists"):
        create_tag(t, "v1", 2)
    create_branch(t, "wip")
    with pytest.raises(ValueError, match="branch named"):
        create_tag(t, "wip", 2)
    drop_branch(t, "wip")
    # expiry keeps the tagged chain alive
    expire_snapshots(t, keep_last=1)
    assert read_snapshot(spark, t, ref="v1").count() == 10
    assert read_snapshot(spark, t).count() == 60
    remove_orphan_files(t)
    assert read_snapshot(spark, t, ref="v1").count() == 10
    # dropping the tag releases it for the next expiry
    drop_tag(t, "v1")
    expire_snapshots(t, keep_last=1)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, ref="v1")


def test_streaming_branch_sink_and_publish_semantics(spark, tmp_path):
    """streaming_upsert_sink(ref=...): batches maintain the branch
    (main untouched); replayed batch ids no-op against the BRANCH
    chain; publish with a diverged main refuses (the branch segment
    holds merge-mor commits, which cherry-pick cannot re-base)."""
    from kblock_spark.io.tableformat import streaming_upsert_sink

    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 40).coalesce(1), t)
    create_branch(t, "audit")
    sink = streaming_upsert_sink(t, "doc_id", ref="audit")
    upd = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit(999).cast("long").alias("v")
    )
    sink(upd, 0)
    # replay of batch 0 no-ops (branch-scoped bookkeeping)
    h = ref_head(t, "audit")
    sink(upd, 0)
    assert ref_head(t, "audit") == h
    # main untouched; branch holds the upsert
    assert read_snapshot(spark, t).where("v = 999").count() == 0
    assert read_snapshot(spark, t, ref="audit").where("v = 999").count() == 10
    # a NEW batch advances the branch
    sink(spark.range(100, 105).select(
        F.col("id").alias("doc_id"), F.lit(7).cast("long").alias("v")), 1)
    assert read_snapshot(spark, t, ref="audit").count() == 45
    # main advances during the audit: strict publish refuses, and so
    # does cherry-pick — the branch segment holds merge-mor commits
    append_snapshot(_df(spark, 200, 210).coalesce(1), t)
    with pytest.raises(CommitConflict):
        publish_branch(t, "audit", cherry_pick=False)
    with pytest.raises(CommitConflict):
        publish_branch(t, "audit")
    # main's own writes are intact either way
    assert read_snapshot(spark, t).count() == 50
