"""Benchmark harness.  Prints ONE JSON line:

  {"metric": "extract_geotag_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "docs": N, "docs_per_sec": D}

Headline: the full extract+geotag pipeline (the BASELINE.json metric is
docs/sec extracted+geotagged) over a deterministic synthetic interleaved
corpus sized by sf (200k docs/sf unit → 20k docs at sf0.1), plus a
representative set of the operator queries over $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_N_DOCS (override corpus size).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoparser_spark.session import get_spark  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def run_pipeline(spark, n_docs: int, gaz, mega_every: int = 1000) -> tuple[float, int]:
    """Extract+geotag end-to-end; returns (wall_sec, docs_out).
    Corpus generation happens first and is NOT in the timed window
    (generation is test scaffolding, not the engine)."""
    from geoparser_spark.operators.extract import extract_with_skew_split
    from geoparser_spark.operators.geotag import geotag
    from geoparser_spark.testing.corpus import build_docs

    par = spark.sparkContext.defaultParallelism
    docs = build_docs(spark, n_docs, seed=42, mega_every=mega_every,
                      partitions=par * 2)
    docs = docs.persist()
    docs.count()  # materialize corpus outside the timed window
    t0 = time.monotonic()
    tagged = geotag(extract_with_skew_split(docs, par * 4), gaz)
    n = tagged.count()
    wall = time.monotonic() - t0
    docs.unpersist()
    return wall, n


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    n_docs = int(os.environ.get("BENCH_N_DOCS", max(int(200_000 * sf), 1000)))
    spark = get_spark(app_name="geoparser-bench")
    from geoparser_spark.testing.gazetteer import gazetteer_df

    gaz = gazetteer_df(spark).cache()
    gaz.count()

    # warmup: same plan shape, tiny corpus — JIT/codegen out of the
    # measured window
    run_pipeline(spark, 500, gaz, mega_every=0)

    wall, _ = run_pipeline(spark, n_docs, gaz)

    # representative operator queries over the sf tables
    import __spark_entry__ as entrymod

    q_names = [
        "pipeline_extract_spans", "geotag_candidates", "tpch_q1_pricing",
        "tpch_q3_shipping", "q4_semi_join", "dedup_exact",
        "dedup_minhash_lsh", "dedup_simhash", "sim_topk_bruteforce",
        "text_quality_score", "text_fingerprint",
    ]
    qs = entrymod.queries()
    times: dict[str, float] = {"extract_geotag_pipeline": round(wall, 3)}
    for name in q_names:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)

    result = {
        "metric": "extract_geotag_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / wall, 2),
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
