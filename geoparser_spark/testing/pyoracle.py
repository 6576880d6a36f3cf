"""Pure-Python oracle kernels for the driver's correctness harness.

The DuckDB oracle can express most operators in ANSI SQL, but a few are
built on primitives DuckDB lacks (Spark's ``xxhash64``, deterministic
k-means, the sha256 stub featurizer).  For those, the oracle is computed
HERE — an independent pure-Python implementation, no Spark involved —
and emitted as a SQL ``VALUES`` list (the same pattern as the geotag
scoring oracle in ``__spark_entry__``).

The builders read the parquet tables directly through DuckDB from the
scale-factor directory the harness is checking (env
``SPARK_GRAFT_ORACLE_SF_DIR``; the driver's correctness gate runs at
``/root/testdata/sf0.01``, the default).

Nothing in this module imports pyspark: every kernel is an independent
reimplementation (public xxHash64 spec; java.math.BigDecimal HALF_UP
rounding semantics) so a value match is evidence, not tautology.
"""

from __future__ import annotations

import os
import struct
from decimal import ROUND_HALF_UP, Decimal

import duckdb

# ------------------------------------------------------------------ xxHash64
# Public xxHash64 algorithm (Yann Collet, BSD-2) as specialized by
# Spark's catalyst XXH64 for the ``xxhash64`` SQL function: strings hash
# their UTF-8 bytes; longs hash through a single-word fast path; multi-
# argument calls chain, each result seeding the next; initial seed 42.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """xxHash64 of a byte string (unsigned result)."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            for _ in range(1):
                k1 = int.from_bytes(data[i:i + 8], "little")
                v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
                k2 = int.from_bytes(data[i + 8:i + 16], "little")
                v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
                k3 = int.from_bytes(data[i + 16:i + 24], "little")
                v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
                k4 = int.from_bytes(data[i + 24:i + 32], "little")
                v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """xxHash64 single-long fast path (Spark hashes integral types this
    way, not through the byte-stream loop)."""
    seed &= _M64
    value &= _M64
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((value * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def double_to_long_bits(d: float) -> int:
    """java.lang.Double.doubleToLongBits (canonical NaN), with Spark's
    -0.0 → +0.0 normalization in hash expressions."""
    if d == 0.0:
        d = 0.0
    bits = struct.unpack("<q", struct.pack("<d", d))[0] & _M64
    exp = (bits >> 52) & 0x7FF
    if exp == 0x7FF and (bits & ((1 << 52) - 1)) != 0:
        return 0x7FF8000000000000
    return bits


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Spark's ``xxhash64(col1, col2, ...)``: fold left, each column's
    hash seeding the next.  Accepts str (UTF-8 bytes), int (long path),
    float (doubleToLongBits then long path), bytes.  Returns a SIGNED
    64-bit value like Spark's LongType output."""
    h = seed & _M64
    for v in values:
        if isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bool):
            raise TypeError("bool hashing not needed/supported")
        elif isinstance(v, int):
            h = xxh64_long(v, h)
        elif isinstance(v, float):
            h = xxh64_long(double_to_long_bits(v), h)
        elif isinstance(v, (bytes, bytearray)):
            h = xxh64_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return _signed(h)


# ------------------------------------------------------------- Spark round

def spark_round(x: float, digits: int) -> float:
    """Spark's ROUND on double: BigDecimal.valueOf(x) (shortest decimal
    repr — Python's repr is the same shortest-roundtrip string) then
    setScale(digits, HALF_UP) back to double."""
    if x != x or x in (float("inf"), float("-inf")):
        return x
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


# ------------------------------------------------------------ text kernels

def normalize(s: str) -> str:
    """trim(lower(regexp_replace(s, '[^\\p{L}\\p{N}]+', ' '))) — Java
    \\p{L}\\p{N} is exactly the Unicode letter+number categories, which
    is str.isalnum()'s definition."""
    out = []
    prev_sep = False
    for ch in s:
        if ch.isalnum():
            out.append(ch)
            prev_sep = False
        elif not prev_sep:
            out.append(" ")
            prev_sep = True
    return "".join(out).strip().lower()


def tokens(s: str) -> list[str]:
    """split(normalize(s), ' ') — Spark split on '' yields ['']."""
    return normalize(s).split(" ")


def distinct_keep_order(xs: list) -> list:
    seen = set()
    out = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def shingles(toks: list[str], n: int = 3) -> list[str]:
    """Distinct word n-grams, first-occurrence order (array_distinct)."""
    if len(toks) < n:
        return []
    return distinct_keep_order(
        [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    )


# -------------------------------------------------------------- data access

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def oracle_sf_dir() -> str:
    """The scale-factor dir the oracle reads.  The driver's correctness
    gate runs at sf0.01; tools/check_oracles.py exports the dir it was
    given so local checks at other SFs stay consistent."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", DEFAULT_SF_DIR)


def read_table(name: str, cols: str = "*", where: str = "",
               order: str = "") -> list[tuple]:
    path = f"{oracle_sf_dir()}/{name}.parquet"
    sql = f"SELECT {cols} FROM '{path}'"
    if where:
        sql += f" WHERE {where}"
    if order:
        sql += f" ORDER BY {order}"
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------- VALUES emission

def sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_float(x: float) -> str:
    """Shortest-roundtrip literal.  Emitted as a STRING cast: DuckDB
    parses a bare numeric literal as DECIMAL first and converts, which
    can land one ulp off (CAST(1.1945067673663499 AS DOUBLE) !=
    CAST('1.1945067673663499' AS DOUBLE) — verified); the string path
    is correctly-rounded strtod."""
    if x != x:
        return "CAST('nan' AS DOUBLE)"
    r = repr(float(x))
    return f"CAST('{r}' AS DOUBLE)"


def sql_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return sql_str(v)
    if isinstance(v, float):
        return sql_float(v)
    if isinstance(v, int):
        return str(v)
    raise TypeError(f"unsupported VALUES type {type(v)}")


def values_sql(rows: list[tuple], colnames: list[str]) -> str:
    """SELECT-from-VALUES with given column names; empty input yields a
    zero-row SELECT with the right shape."""
    cols = ", ".join(colnames)
    if not rows:
        nulls = ", ".join(f"NULL AS {c}" for c in colnames)
        return f"SELECT {nulls} WHERE 1 = 0"
    body = ",\n".join("(" + ", ".join(sql_value(v) for v in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES {body}) AS t({cols})"
