"""As-of join: for each left row, the most recent right row at or
before its timestamp (per key) — the state-at-event-time primitive
(config/profile/price in effect when an event happened).

Spark has no native ASOF JOIN.  The naive decorrelation — range join
``l.ts >= r.ts`` + window max — explodes to |L|x|R| rows per key
before pruning.  The scale shape here is the UNION-AND-SWEEP
formulation: tag both sides, union on an aligned schema, and sweep one
window per key ordered by time carrying the latest right payload
forward with ``last(ignorenulls=True)``.  Cost: ONE shuffle of
|L|+|R| rows at key grain and one sort within each key partition —
no row multiplication, no range-join explosion, skewed keys handled by
the same AQE machinery as any key-grain window.

Ordering discipline inside a timestamp tie: right rows sort BEFORE
left rows at equal time (a state change effective at t applies to an
event at t — backward-inclusive, DuckDB ASOF's `>=` semantics), and
right rows carry a caller-guaranteed unique (key, time) grain (dedup
upstream; duplicate states at the same instant have no well-defined
winner in any engine).

Reference parity: GeoParser has no time-series ops; this belongs to
the training-pipeline mandate (joining events against slowly-changing
metadata without snapshotting the corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              time_col: str, payload_cols: list[str] | None = None) -> DataFrame:
    """Left rows + the latest right payload at-or-before their time.

    ``payload_cols`` default: every right column that is neither a key
    nor the time column.  Right payloads surface under their own names
    (caller renames collisions upstream); left rows with no prior right
    row get NULL payloads (left-outer semantics, like DuckDB ASOF LEFT
    JOIN)."""
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in key_cols and c != time_col]
    for c in payload_cols:
        if c in left.columns:
            raise ValueError(f"payload column {c!r} collides with a left column")
    for c in ("_side", "_payload"):
        if c in left.columns or c in right.columns:
            raise ValueError(f"column name {c!r} is reserved by asof_join")
    # the sweep carries ONE struct of all payloads, not per-column
    # values: last(col, ignorenulls) per column would skip a matched
    # right row whose payload is legitimately NULL (resurrecting stale
    # state) and could stitch fields from DIFFERENT right rows.  The
    # struct is non-null exactly when the row IS a right row, so
    # ignorenulls skips only left rows, and all fields travel together
    # — matching DuckDB ASOF's whole-row semantics.
    payload = F.struct(*[F.col(c) for c in payload_cols])
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_payload",
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType),
    )
    r_tag = right.select(*key_cols, time_col, payload.alias("_payload")) \
        .withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in key_cols and c != time_col:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [*key_cols, time_col, "_side", "_payload",
            *[c for c in left.columns if c not in key_cols and c != time_col]]
    both = l_tag.select(*cols).unionByName(r_tag.select(*cols))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = both.withColumn("_payload", F.last("_payload", ignorenulls=True).over(w))
    out = both.where(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col("_payload")[c])
    return out.drop("_side", "_payload")
