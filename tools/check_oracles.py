"""Local replica of the driver's correctness harness: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables; compare row count, column names, and order-insensitive
values.  Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from geoparser_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(v):
    # driver-faithful strictness: exact float repr (round(_,4) boundary
    # ties differ in low bits and the driver's hash catches them), and
    # Decimal tagged so a DuckDB HUGEINT/decimal128 never silently
    # renders equal to a Spark BIGINT (the round-2 hash_match failures
    # were exactly this class)
    import decimal
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec({v})"
    if v is None:
        return ""
    return str(v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = "|".join(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # pure-Python oracle builders (testing/pyoracle_queries) read the
    # tables from this dir; keep them on the same SF as the Spark side.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        finally:
            # per-query drain of operator-internal caches (enforced
            # release — plans/caching.py): a 124-query session must
            # not accumulate corpus-sized persists
            from geoparser_spark.plans.caching import release_all
            release_all()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: spark rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            s_set = rows_to_set(scols, [tuple(r) for r in srows])
            o_set = rows_to_set(ocols, orows)
            if s_set != o_set:
                diff_s = {k: v for k, v in s_set.items() if o_set.get(k) != v}
                diff_o = {k: v for k, v in o_set.items() if s_set.get(k) != v}
                print(f"FAIL {name}: value mismatch; spark-only={list(diff_s)[:3]} duck-only={list(diff_o)[:3]}")
                ok = False
        if ok:
            print(f"OK   {name}: rows={len(srows)}")
        else:
            failures += 1
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
