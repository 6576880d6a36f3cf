"""Salted equi-join: explicit skew defusing for large-x-medium joins.

AQE's skew-join splitter (enabled session-wide, session.py) handles
most skew reactively, but it only splits SORT-MERGE join partitions and
only after a stage materializes the skew.  When the key distribution is
KNOWN skewed ahead of time (the web reality: half the crawl is from a
handful of hosts) and the dimension side is too big to broadcast,
pre-salting is the deterministic, planner-independent fix: the large
side scatters each row to one of `salt` sub-keys, the medium side
replicates `salt` ways, and every reducer sees at most 1/salt of any
hot key.

Cost model: medium side inflates x salt (choose salt so
|medium| * salt stays comfortably under a reducer's memory); the large
side gains one extra tiny column.  Use plain join + AQE when the skew
is mild; use broadcast when the medium side fits; use this when
neither holds.

The large side's salt must be uniform WITHIN a hot key, so it hashes a
per-row UNIQUE column (caller-designated), never the join key — and
never rand(), which re-rolls under task retries and breaks exactly-once
row accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(large: DataFrame, medium: DataFrame, key: str,
                row_id_col: str, salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Join `large` (skewed on `key`, with unique `row_id_col`) to
    `medium` on `key`, scattering each hot key across `salt` reducers.

    Returns the joined frame without the salt column; column set
    matches a plain `large.join(medium, key, how)`.

    `how` is restricted to joins whose semantics survive the salt-way
    replication of the medium side: inner/left/left_semi/left_anti.
    Under 'right'/'full' every unmatched medium row would surface once
    PER SALT VALUE (the replicas have no large-side partner to collapse
    them), silently inflating the result — rejected up front."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join how={how!r} unsupported: replicated medium rows "
            "would be emitted once per salt for unmatched right/full rows; "
            "use inner/left/left_semi/left_anti")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    for df, col in ((large, _SALT), (medium, _SALT)):
        if col in df.columns:
            raise ValueError(f"column {col} already exists on an input")
    l = large.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(row_id_col)), F.lit(salt)).cast("int"))
    m = medium.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return l.join(m, [key, _SALT], how).drop(_SALT)
