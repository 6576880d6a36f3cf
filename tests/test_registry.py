"""Q13 registry: upsert / lookup / delete as normal rows (replacing the
reference's parallel-array admin core, solr_admin.py:22-38)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from geoparser_spark.plans import registry as R


@pytest.fixture()
def reg_dir():
    d = tempfile.mkdtemp(prefix="gp_reg_")
    yield os.path.join(d, "registry")
    shutil.rmtree(d, ignore_errors=True)


def test_register_get_update_delete(spark, reg_dir):
    R.register_index(spark, reg_dir, "example.org", "/idx1", "core_a",
                     ["id", "text"], n_points=10, idx_size=1000)
    R.register_index(spark, reg_dir, "example.org", "/idx2", "core_b",
                     ["id"], n_points=5, idx_size=500)
    R.register_index(spark, reg_dir, "other.net", "/idx1", "core_c")

    assert R.read_registry(spark, reg_dir).count() == 3
    assert R.list_domain(spark, reg_dir, "example.org").count() == 2

    got = R.get_index(spark, reg_dir, "example.org", "/idx1").collect()[0]
    assert got.core_name == "core_a" and got.n_points == 10

    # upsert: latest registration wins
    R.register_index(spark, reg_dir, "example.org", "/idx1", "core_a",
                     ["id", "text"], n_points=42, idx_size=2000)
    got = R.get_index(spark, reg_dir, "example.org", "/idx1").collect()[0]
    assert got.n_points == 42
    assert R.read_registry(spark, reg_dir).count() == 3

    # delete: tombstone hides the row, others unaffected
    R.delete_index(spark, reg_dir, "example.org", "/idx1")
    assert R.get_index(spark, reg_dir, "example.org", "/idx1").count() == 0
    assert R.read_registry(spark, reg_dir).count() == 2

    # re-register after delete works
    R.register_index(spark, reg_dir, "example.org", "/idx1", "core_d")
    got = R.get_index(spark, reg_dir, "example.org", "/idx1").collect()[0]
    assert got.core_name == "core_d"


def test_empty_registry(spark, reg_dir):
    assert R.read_registry(spark, reg_dir).count() == 0


def test_same_seq_collision_resolves_deterministically(spark, reg_dir):
    """Two writers that raced _next_seq and minted the SAME updated_seq
    (a register and a delete) must resolve the same way on every read:
    op_id breaks the tie totally."""
    rows = [
        ("example.org", "/idx", "core_live", ["id"], 1, 1, 7,
         "aaaaaaaa-0000-0000-0000-000000000000"),
        ("example.org", "/idx", None, None, None, None, 7,
         "ffffffff-0000-0000-0000-000000000000"),
    ]
    spark.createDataFrame(rows, R.REGISTRY_SCHEMA).write.mode("append").parquet(reg_dir)
    # highest (updated_seq, op_id) is the tombstone -> row hidden
    results = {R.read_registry(spark, reg_dir).count() for _ in range(5)}
    assert results == {0}

    # flip the op_ids: now the live row wins, again on every read
    rows2 = [
        ("example.org", "/idx2", "core_live", ["id"], 1, 1, 9,
         "ffffffff-0000-0000-0000-000000000001"),
        ("example.org", "/idx2", None, None, None, None, 9,
         "aaaaaaaa-0000-0000-0000-000000000001"),
    ]
    spark.createDataFrame(rows2, R.REGISTRY_SCHEMA).write.mode("append").parquet(reg_dir)
    for _ in range(5):
        got = R.get_index(spark, reg_dir, "example.org", "/idx2").collect()
        assert len(got) == 1 and got[0].core_name == "core_live"
