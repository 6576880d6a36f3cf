"""Snapshot layer (plans/snapshots.py): versioned manifests, time
travel, copy-on-write MERGE with footer-stats file pruning, and
half-commit invisibility."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geoparser_spark.plans import snapshots as SN


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="gp_snap_t_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, ids):
    return spark.createDataFrame([Row(doc_id=i, val=f"v{i}") for i in ids])


def test_create_append_read_latest(spark, root):
    SN.create_table(_mk(spark, range(10)), root, key="doc_id")
    SN.append(_mk(spark, range(100, 105)), root)
    assert SN.latest_version(root) == 2
    assert SN.read_snapshot(spark, root).count() == 15
    assert SN.read_snapshot(spark, root, version=1).count() == 10


def test_merge_latest_wins_and_insert(spark, root):
    SN.create_table(_mk(spark, range(10)), root, key="doc_id")
    upd = spark.createDataFrame(
        [Row(doc_id=3, val="NEW3"), Row(doc_id=42, val="v42")]
    )
    SN.merge_upsert(spark, upd, root)
    got = {r.doc_id: r.val for r in SN.read_snapshot(spark, root).collect()}
    assert len(got) == 11
    assert got[3] == "NEW3" and got[42] == "v42" and got[4] == "v4"


def test_time_travel_is_immutable(spark, root):
    SN.create_table(_mk(spark, range(10)), root, key="doc_id")
    SN.merge_upsert(
        spark, spark.createDataFrame([Row(doc_id=3, val="NEW3")]), root
    )
    v1 = {r.doc_id: r.val for r in
          SN.read_snapshot(spark, root, version=1).collect()}
    assert v1[3] == "v3"  # the merge is invisible at v1


def test_merge_prunes_disjoint_files(spark, root):
    # 4 range-partitioned files over 0..99; updates touch only the top
    # of the key space -> at least 2 files must be carried over verbatim
    SN.create_table(_mk(spark, range(100)), root, key="doc_id", n_files=4)
    man1 = json.load(open(os.path.join(root, "_log", "v1.json")))
    assert len(man1["files"]) == 4
    assert all("key_min" in f for f in man1["files"])
    upd = spark.createDataFrame([Row(doc_id=97, val="X"), Row(doc_id=99, val="Y")])
    res = SN.merge_upsert(spark, upd, root)
    assert res["carried"] >= 2
    assert res["rewritten"] <= 2
    man2 = json.load(open(os.path.join(root, "_log", "v2.json")))
    carried_paths = {f["path"] for f in man1["files"]} & {
        f["path"] for f in man2["files"]}
    assert len(carried_paths) == res["carried"]  # same immutable files
    got = {r.doc_id: r.val for r in SN.read_snapshot(spark, root).collect()}
    assert len(got) == 100 and got[97] == "X" and got[0] == "v0"


def test_half_commit_is_invisible(spark, root):
    SN.create_table(_mk(spark, range(5)), root, key="doc_id")
    # simulate a crash: data files land but no manifest is committed
    os.makedirs(os.path.join(root, "data", "orphan"), exist_ok=True)
    with open(os.path.join(root, "data", "orphan", "junk.parquet"), "w") as f:
        f.write("not parquet")
    assert SN.latest_version(root) == 1
    assert SN.read_snapshot(spark, root).count() == 5


def test_history(spark, root):
    SN.create_table(_mk(spark, range(4)), root, key="doc_id")
    SN.append(_mk(spark, [10]), root)
    SN.merge_upsert(spark, spark.createDataFrame([Row(doc_id=1, val="z")]), root)
    ops = [h["op"] for h in SN.history(root)]
    assert ops == ["create", "append", "merge"]


def test_create_twice_refuses(spark, root):
    SN.create_table(_mk(spark, range(3)), root, key="doc_id")
    with pytest.raises(ValueError):
        SN.create_table(_mk(spark, range(3)), root, key="doc_id")


def test_expire_versions_reclaims_only_unreferenced(spark, root):
    SN.create_table(_mk(spark, range(100)), root, key="doc_id", n_files=4)
    upd = spark.createDataFrame([Row(doc_id=99, val="X")])
    SN.merge_upsert(spark, upd, root)          # v2 carries most v1 files
    v1_files = {f["path"] for f in
                json.load(open(os.path.join(root, "_log", "v1.json")))["files"]}
    v2_files = {f["path"] for f in
                json.load(open(os.path.join(root, "_log", "v2.json")))["files"]}
    shared = v1_files & v2_files
    res = SN.expire_versions(root, keep_from=2)
    assert res["expired_versions"] == 1
    assert res["deleted_files"] == len(v1_files - v2_files)
    # shared (carried-over) files survive and the latest still reads
    for p in shared:
        assert os.path.exists(os.path.join(root, p))
    assert SN.read_snapshot(spark, root).count() == 100
    assert SN.latest_version(root) == 2        # gap doesn't hide v2
    assert [h["version"] for h in SN.history(root)] == [2]


def test_expire_refuses_to_drop_latest(spark, root):
    SN.create_table(_mk(spark, range(4)), root, key="doc_id")
    with pytest.raises(ValueError):
        SN.expire_versions(root, keep_from=2)


def test_snapshot_diff_append_and_merge(spark, root):
    """CDC between versions: appends surface as inserted, merge
    updates as updated with both sides, untouched rows never appear;
    identical versions diff to zero rows."""
    SN.create_table(_mk(spark, range(6)), root, key="doc_id")       # v1
    SN.append(_mk(spark, range(100, 103)), root)                    # v2
    SN.merge_upsert(
        spark, spark.createDataFrame([Row(doc_id=2, val="NEW2")]), root
    )                                                               # v3

    d12 = {r.doc_id: r for r in SN.snapshot_diff(spark, root, 1, 2).collect()}
    assert set(d12) == {100, 101, 102}
    assert all(r.change_type == "inserted" and r.new_val == f"v{i}"
               for i, r in d12.items())

    d23 = {r.doc_id: r for r in SN.snapshot_diff(spark, root, 2, 3).collect()}
    assert set(d23) == {2}
    assert d23[2].change_type == "updated"
    assert (d23[2].old_val, d23[2].new_val) == ("v2", "NEW2")

    # v1 -> v3 composes: three inserts + one update, nothing else
    d13 = {r.doc_id: r.change_type
           for r in SN.snapshot_diff(spark, root, 1, 3).collect()}
    assert d13 == {100: "inserted", 101: "inserted", 102: "inserted",
                   2: "updated"}

    assert SN.snapshot_diff(spark, root, 3, 3).count() == 0


def test_snapshot_diff_reads_only_changed_files(spark, root):
    """The file-level short-circuit: diffing an append-only history
    must scan ONLY the appended files (carried files are skipped by
    manifest path identity, not by reading them)."""
    SN.create_table(_mk(spark, range(500)), root, key="doc_id")
    SN.append(_mk(spark, [1000]), root)
    diff = SN.snapshot_diff(spark, root, 1, 2)
    plan = diff._jdf.queryExecution().executedPlan().toString()
    man1 = json.load(open(os.path.join(root, "_log", "v1.json")))
    man2 = json.load(open(os.path.join(root, "_log", "v2.json")))
    carried = {f["path"] for f in man1["files"]} & {
        f["path"] for f in man2["files"]}
    assert carried, "append must carry the v1 files forward"
    # no carried file's path may appear in the physical scan
    for p in carried:
        assert os.path.basename(p) not in plan
    assert diff.count() == 1
