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


def test_publish_refuses_diverged_main(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(_df(spark, 0, 10), t)
    create_branch(t, "audit")
    append_snapshot(_df(spark, 10, 20), t, ref="audit")
    append_snapshot(_df(spark, 90, 95), t)  # main advances on its own
    with pytest.raises(CommitConflict, match="not an ancestor"):
        publish_branch(t, "audit")
    # both lines still intact
    assert read_snapshot(spark, t).count() == 15
    assert read_snapshot(spark, t, ref="audit").count() == 20


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
    # diverged → publish refuses (main has its own commits)
    with pytest.raises(CommitConflict):
        publish_branch(t, "audit")
