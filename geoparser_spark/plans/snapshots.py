"""Snapshot-isolated table layer over Parquet: versioned manifests,
time travel, and copy-on-write MERGE with file-level key pruning.

This is the executable stand-in for the Iceberg runtime the sandbox
can't load (sources/catalog.py documents the seam; SURVEY.md §1.3 maps
the reference's Solr cores to Iceberg tables).  The reference mutates
rows in place with per-doc Solr `set` updates
(`geoparser_app/solr.py:181-200,216-235`); at 10^12 docs row-level
update must be snapshot-based: immutable data files + an atomic
manifest swap.  This module implements exactly that contract on plain
Parquet so the semantics are TESTED, not just documented:

- every commit writes new immutable part files plus a JSON manifest
  `_log/v{N}.json` listing the snapshot's full file set; readers pin a
  version (time travel) or take the latest;
- the manifest records per-file MIN/MAX of the merge key, read from
  the Parquet FOOTER (no data scan) — the same column-stats pruning an
  Iceberg manifest provides;
- `merge_upsert` is copy-on-write MERGE: files whose [min,max] key
  range cannot contain any update key are CARRIED OVER untouched into
  the new snapshot (file-level pruning); only intersecting files are
  rewritten via anti-join + union.  At 100 TB this is the difference
  between rewriting the table and rewriting the handful of files a
  trickle of updates lands in.

Commit protocol: manifests are written to a temp name then atomically
renamed; the latest version is the highest committed v{N}.json, so a
crashed half-commit (data files without a manifest) is invisible —
readers never see it, and the orphaned files are GC-able.  (A real
multi-writer deployment would CAS the rename through a catalog; the
single-driver batch jobs here — like the reference's single Django
loop — have one committer.)
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_log"


def _data_dir(root: str) -> str:
    return os.path.join(root, "data")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _LOG, f"v{version}.json")


def latest_version(root: str) -> int:
    """Highest committed version, 0 if none.  Listing-based (not
    contiguous-walk) so expired early versions don't hide later ones."""
    import re

    log = os.path.join(root, _LOG)
    if not os.path.isdir(log):
        return 0
    best = 0
    for name in os.listdir(log):
        m = re.fullmatch(r"v(\d+)\.json", name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def _key_stat_json(v, *, widen: int = 0):
    """Coerce a footer min/max (or a prune-time bound) to a JSON-native
    value under an ORDER-PRESERVING mapping, so manifest commit never
    crashes on datetime/date/bytes/Decimal keys and prune comparisons
    stay apples-to-apples (both sides pass through this function).

    - datetime/date -> isoformat (fixed-width fields: lexicographic ==
      chronological; datetimes are microsecond-padded by isoformat);
    - bytes -> latin-1 string (per-byte code points: lexicographic
      string order == bytewise order);
    - Decimal -> float, WIDENED one ulp outward for file stats
      (widen=-1 for min, +1 for max) so rounding can only make pruning
      more conservative, never wrong.
    """
    import datetime as _dt
    import math
    from decimal import Decimal

    if isinstance(v, (_dt.datetime, _dt.date)):
        if isinstance(v, _dt.datetime):
            return v.isoformat(timespec="microseconds")
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("latin-1")
    if isinstance(v, Decimal):
        f = float(v)
        if widen:
            f = math.nextafter(f, math.inf if widen > 0 else -math.inf)
        return f
    return v


def _file_key_stats(path: str, key: str):
    """(min, max) of `key` across row groups, from the footer only.
    Values are JSON-native (see _key_stat_json) so _commit can always
    serialize the manifest."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    if md.num_rows == 0:
        return None
    idx = md.schema.to_arrow_schema().get_field_index(key)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None  # no stats -> never prune this file
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (_key_stat_json(lo, widen=-1), _key_stat_json(hi, widen=1))


def _write_files(df: DataFrame, root: str, key: str | None) -> list[dict]:
    """Write df as new immutable part files; return file entries with
    footer-derived key stats."""
    commit_id = uuid.uuid4().hex[:12]
    out = os.path.join(_data_dir(root), commit_id)
    df.write.mode("error").parquet(out)
    entries = []
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(out)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(out, name)
        n_rows = pq.ParquetFile(path).metadata.num_rows
        if n_rows == 0:
            os.remove(path)  # drop empty shards from the snapshot
            continue
        rel = os.path.relpath(path, root)
        ent: dict = {"path": rel, "rows": n_rows}
        if key is not None:
            st = _file_key_stats(path, key)
            if st is not None:
                ent["key_min"], ent["key_max"] = st
        entries.append(ent)
    return entries


def _commit(root: str, version: int, files: list[dict], op: str,
            key: str | None) -> int:
    os.makedirs(os.path.join(root, _LOG), exist_ok=True)
    manifest = {
        "version": version,
        "op": op,
        "key": key,
        "files": files,
    }
    tmp = _manifest_path(root, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, _manifest_path(root, version))
    return version


def _load_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def create_table(df: DataFrame, root: str, key: str | None = None,
                 n_files: int = 4) -> int:
    """v1: write df range-partitioned on `key` so file key ranges are
    disjoint and MERGE pruning has teeth."""
    if latest_version(root) != 0:
        raise ValueError(f"table already exists at {root}")
    if key is not None:
        df = df.repartitionByRange(n_files, key)
    files = _write_files(df, root, key)
    return _commit(root, 1, files, "create", key)


def append(df: DataFrame, root: str) -> int:
    v = latest_version(root)
    if v == 0:
        raise ValueError(f"no table at {root}")
    man = _load_manifest(root, v)
    new = _write_files(df, root, man.get("key"))
    return _commit(root, v + 1, man["files"] + new, "append", man.get("key"))


def read_snapshot(spark: SparkSession, root: str,
                  version: int | None = None) -> DataFrame:
    v = version if version is not None else latest_version(root)
    man = _load_manifest(root, v)
    paths = [os.path.join(root, f["path"]) for f in man["files"]]
    if not paths:
        raise ValueError(f"empty snapshot v{v} at {root}")
    return spark.read.parquet(*paths)


def merge_upsert(spark: SparkSession, updates: DataFrame, root: str) -> dict:
    """Copy-on-write MERGE (latest wins by key): carry over every file
    whose footer key range cannot intersect the update keys; rewrite
    the rest as anti-join(current-slice, updates) + updates.

    Returns {"version", "carried", "rewritten"} so callers (and tests)
    can see the pruning do its work.  The update key bounds come from
    ONE small agg over the updates side; per-file intersection is a
    manifest-local check, no data read.  Updates must be unique per
    key (upsert semantics are undefined otherwise — enforced cheaply
    by the caller or an assert_unique pass)."""
    v = latest_version(root)
    man = _load_manifest(root, v)
    key = man.get("key")
    if key is None:
        raise ValueError("merge_upsert requires a table created with a key")
    b = updates.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
    # run the bounds through the same order-preserving JSON coercion the
    # manifest stats went through, so datetime/bytes/Decimal keys compare
    # like-for-like against the stored key_min/key_max
    lo, hi = _key_stat_json(b["lo"]), _key_stat_json(b["hi"])
    carried, rewrite = [], []
    for ent in man["files"]:
        if ("key_min" in ent and lo is not None
                and (ent["key_max"] < lo or ent["key_min"] > hi)):
            carried.append(ent)
        else:
            rewrite.append(ent)
    if rewrite:
        paths = [os.path.join(root, f["path"]) for f in rewrite]
        current = spark.read.parquet(*paths)
        merged = current.join(
            updates.select(key), key, "left_anti"
        ).unionByName(updates)
    else:
        merged = updates
    new = _write_files(merged, root, key)
    nv = _commit(root, v + 1, carried + new, "merge", key)
    return {"version": nv, "carried": len(carried), "rewritten": len(rewrite)}


def history(root: str) -> list[dict]:
    out = []
    for v in range(1, latest_version(root) + 1):
        if not os.path.exists(_manifest_path(root, v)):
            continue  # expired by expire_versions
        man = _load_manifest(root, v)
        out.append({"version": v, "op": man["op"],
                    "n_files": len(man["files"])})
    return out


def _content_digest(cols: list[str]):
    """md5 over ``cols`` with NULL encoded as an explicit sentinel:
    concat_ws SKIPS nulls (("a", NULL) would collide with ("a",)) and a
    bare "\\x00" sentinel would collide with a literal "\\x00" string —
    shared by append_dedup and snapshot_diff so both stay hardened."""
    return F.md5(F.concat_ws("\x1f", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00"))
        for c in cols]))


def append_dedup(spark: SparkSession, df: DataFrame, root: str,
                 hash_cols: list[str]) -> dict:
    """Idempotent ingest: append only rows whose content hash (md5 over
    ``hash_cols``) is not already in the table — re-delivering the same
    batch (crawler retries, at-least-once upstream) adds ZERO rows.
    The probe ships only hash digests (the exact-dedup-hashed shape:
    shuffle carries md5 strings, never bodies); the incoming batch is
    also self-deduped on the hash so one delivery can't insert twins.

    Returns {"version", "appended"} where "appended" is the ROW count
    actually added (summed from the freshly written files' parquet
    footers — no extra job), version unchanged when the whole batch
    was already present."""
    v = latest_version(root)
    if v == 0:
        raise ValueError(f"no table at {root}")
    digest = _content_digest(hash_cols)
    current = read_snapshot(spark, root, version=v)
    seen = current.select(digest.alias("h")).distinct()
    fresh = (
        df.withColumn("h", digest)
        .dropDuplicates(["h"])
        .join(seen, "h", "left_anti")
        .drop("h")
    )
    man = _load_manifest(root, v)
    new = _write_files(fresh, root, man.get("key"))
    if not new:
        return {"version": v, "appended": 0}
    _commit(root, v + 1, man["files"] + new, "append", man.get("key"))
    return {"version": v + 1, "appended": sum(e["rows"] for e in new)}


def expire_versions(root: str, keep_from: int) -> dict:
    """Time-travel retention (the expire_snapshots analog): drop every
    manifest below `keep_from` and DELETE data files referenced only by
    expired versions.  Files shared with surviving versions stay — a
    COW merge's carried-over files are typically referenced by many
    snapshots, so vacuum reclaims exactly the rewritten-away files.

    Returns {"expired_versions", "deleted_files"}.  Refuses to expire
    the latest version."""
    latest = latest_version(root)
    if keep_from > latest:
        raise ValueError(
            f"keep_from {keep_from} would expire the latest version {latest}")
    keep_refs: set[str] = set()
    for v in range(keep_from, latest + 1):
        if os.path.exists(_manifest_path(root, v)):
            keep_refs |= {f["path"] for f in _load_manifest(root, v)["files"]}
    expired, deleted = 0, 0
    for v in range(1, keep_from):
        mp = _manifest_path(root, v)
        if not os.path.exists(mp):
            continue
        for f in _load_manifest(root, v)["files"]:
            if f["path"] in keep_refs:
                continue
            full = os.path.join(root, f["path"])
            if os.path.exists(full):
                os.remove(full)
                deleted += 1
        os.remove(mp)
        expired += 1
    return {"expired_versions": expired, "deleted_files": deleted}


def snapshot_diff(spark: SparkSession, root: str, v_from: int, v_to: int,
                  key: str | None = None) -> DataFrame:
    """Row-level change feed between two versions — the CDC surface an
    Iceberg `changelog` read provides (incremental consumers resume
    from a version instead of re-reading the table).

    File-level short-circuit first: data files are immutable and
    manifests reference them by path, so any file present in BOTH
    manifests is skipped entirely — only files added or removed
    between the versions are read (an append-only history diffs by
    scanning just the appended files; a COW merge reads the rewritten
    file and its predecessors).  The row diff over that bounded slice
    is a full-outer join on ``key`` (default: the table's manifest
    key) comparing md5 over all non-key columns.

    Returns old/new rows with change_type in
    {inserted, deleted, updated}.
    """
    from pyspark.sql import functions as F

    man_a, man_b = _load_manifest(root, v_from), _load_manifest(root, v_to)
    key = key or man_b.get("key") or man_a.get("key")
    if not key:
        raise ValueError("snapshot_diff needs a key column")
    paths_a = {f["path"] for f in man_a["files"]}
    paths_b = {f["path"] for f in man_b["files"]}
    only_a = sorted(paths_a - paths_b)
    only_b = sorted(paths_b - paths_a)

    def read(paths: list[str]) -> DataFrame | None:
        if not paths:
            return None
        return spark.read.parquet(
            *[os.path.join(root, p) for p in paths])

    a, b = read(only_a), read(only_b)
    # STABLE schema on every branch — (key, change_type, old_*, new_*)
    # with NULLs on the absent side — so an incremental consumer can
    # accumulate diff outputs across commits without schema drift
    base = read_snapshot(spark, root, v_to)
    val_cols = [c for c in base.columns if c != key]

    def hashed(df: DataFrame | None, side: str) -> DataFrame:
        if df is None:
            df = base.limit(0)
        return df.select(
            F.col(key),
            _content_digest(val_cols).alias(f"_h_{side}"),
            *[F.col(c).alias(f"{side}_{c}") for c in val_cols],
        )

    j = hashed(a, "old").join(hashed(b, "new"), key, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), "inserted")
        .when(F.col("_h_new").isNull(), "deleted")
        .when(F.col("_h_old") != F.col("_h_new"), "updated")
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())  # unchanged rows drop
        .select(key, "change_type",
                *[f"old_{c}" for c in val_cols],
                *[f"new_{c}" for c in val_cols])
    )
