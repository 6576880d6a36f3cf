"""Interval (range) join: events x time windows, binned to stay an
equi-join.

``left.t in [right.start, right.end)`` is a non-equi condition; Spark
plans it as BroadcastNestedLoopJoin (small right) or falls to a
cartesian — both explode at scale.  The standard fix is BINNING: every
interval replicates to the fixed-width bins it overlaps, every event
maps to its one bin, and the join becomes an EQUI-join on the bin id
with the range predicate left as a cheap residual filter.  Exact by
construction; the only tunable is ``bin_width``, which trades interval
replication (long intervals / narrow bins) against per-bin candidate
fan-in (short intervals / wide bins).  Pick the typical interval
length; replication then averages ~2 rows per interval.

Time travels as integer MICROSECONDS (``unix_micros``) end-to-end —
half-open semantics need exact arithmetic at the boundary and the last
overlapped bin is floor((end-1)/width), which is only correct in
integers.

Reference parity: none in GeoParser (no time dimension); this belongs
to the training-pipeline mandate (joining events against
incident/session/experiment windows)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["interval_join"]


def _micros(c: Column, dtype) -> Column:
    # NTZ included: parquet-naive timestamps and INTERVAL arithmetic
    # both surface as TIMESTAMP_NTZ, which unix_micros only accepts
    # after a session-zone cast (consistent for both sides of a join)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long")


def interval_join(left: DataFrame, right: DataFrame, time_col: str,
                  start_col: str, end_col: str, bin_width: int,
                  keys: list[str] | None = None) -> DataFrame:
    """Rows (left ++ right) for every pair with
    ``start <= t < end`` (half-open) and equal ``keys`` (optional
    extra equi conditions, e.g. user_id).

    ``bin_width`` is in MICROSECONDS for timestamp columns, in the
    column's own unit for numeric columns.  Empty/negative intervals
    (end <= start) match nothing.  Column names must be disjoint
    across the two sides apart from ``keys``."""
    keys = list(keys or [])
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    overlap = [c for c in left.columns if c in right.columns and c not in keys]
    if overlap:
        raise ValueError(f"column names overlap across sides: {overlap}")
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError("column name '_bin' is reserved by interval_join")
    lt = _micros(F.col(time_col), left.schema[time_col].dataType)
    rs = _micros(F.col(start_col), right.schema[start_col].dataType)
    re_ = _micros(F.col(end_col), right.schema[end_col].dataType)
    w = F.lit(int(bin_width)).cast("long")
    r_binned = right.where(re_ > rs).withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(rs / w), F.floor((re_ - 1) / w))),
    )
    l_binned = left.withColumn("_bin", F.floor(lt / w))
    out = l_binned.join(r_binned, [*keys, "_bin"]).where(
        (lt >= rs) & (lt < re_))
    return out.drop("_bin")
