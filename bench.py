"""Benchmark harness.  Prints ONE JSON line:

  {"metric": "extract_geotag_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query MIN sec...}, "sf": <sf>,
   "docs": N, "docs_per_sec": D, "runs_per_query": 4,
   "steal": {"samples": n, "mean_pct": m, "max_pct": x}}

Headline: the full extract+geotag pipeline (the BASELINE.json metric is
docs/sec extracted+geotagged) over a deterministic synthetic interleaved
corpus sized by sf (200k docs/sf unit → 20k docs at sf0.1), plus a
representative set of the operator queries over $SPARK_GRAFT_SF_DIR.

Methodology: every timed thing runs once as warmup (JIT/codegen/Python
workers out of the window) then N measured runs (default 4), and the
MIN is reported.  Min, not median: this sandbox VM sits on a shared
hypervisor whose CPU steal is strictly ADDITIVE one-sided noise — a
round-3 control of 6 identical headline runs measured walls of
[26.7, 35.6, 9.0, 5.8, 12.4, 13.4] (6.1x spread, steal bursts to 28%),
where the median (12.9) reflects the neighbours and the min (5.8) the
engine.  timeit's docs prescribe the same estimator for the same
reason.  vmstat samples steal every 2 s for the whole session so
round-over-round comparisons can tell plan regressions from platform
noise.

Every session also embeds TWO zero-Spark platform micro-controls
(VERDICT r4 #1), run at session start and end at the same process
count: a cache-resident HTML-parse loop (CPU-ceiling probe) and
strided sums over 64 MB/process buffers (shared-memory-bus probe).
Their throughputs ride in the JSON under "controls", so a cross-round
wall comparison can first normalize by the box's own measured health
in the SAME window — bandwidth-bound query families on this VM swing
26-65% with bus contention while cache-resident ones stay flat, and
the control pair tells the two stories apart without separate probe
runs.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_N_DOCS (override corpus size),
     BENCH_RUNS (override measured runs per query, default 4),
     BENCH_SKIP_CONTROLS=1 (skip the platform controls).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoparser_spark.session import get_spark  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


class _StealSampler:
    """vmstat-based hypervisor-steal sampler ('st' column located from
    the header row — procps >= 4 appends 'gu' after it)."""

    def __init__(self, interval: int = 2):
        self.proc: subprocess.Popen | None = None
        try:
            self.proc = subprocess.Popen(
                ["vmstat", str(interval)], stdout=subprocess.PIPE, text=True
            )
        except OSError:
            self.proc = None

    def stop(self) -> dict:
        if self.proc is None:
            return {"samples": 0, "mean_pct": None, "max_pct": None}
        self.proc.terminate()
        lines = self.proc.stdout.read().splitlines() if self.proc.stdout else []
        st_idx = None
        vals: list[int] = []
        for l in lines:
            cols = l.split()
            if st_idx is None and "st" in cols and "id" in cols:
                st_idx = cols.index("st")
            elif st_idx is not None and len(cols) > st_idx and cols[st_idx].isdigit():
                vals.append(int(cols[st_idx]))
        return {
            "samples": len(vals),
            "mean_pct": round(statistics.mean(vals), 1) if vals else None,
            "max_pct": max(vals) if vals else None,
        }


def run_pipeline(spark, n_docs: int, gaz, mega_every: int = 1000,
                 runs: int = 1) -> tuple[float, int]:
    """Extract+geotag end-to-end; returns (min wall_sec, docs_out).
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
    walls = []
    n = 0
    for _ in range(runs):
        t0 = time.monotonic()
        tagged = geotag(extract_with_skew_split(docs, par * 4), gaz)
        n = tagged.count()
        walls.append(time.monotonic() - t0)
    docs.unpersist()
    return min(walls), n


def _platform_controls(procs: int) -> dict:
    """Both micro-controls at ``procs`` processes; {} when skipped.
    NEVER raises: a transient subprocess failure (fork/OOM right after
    a 32-thread JVM session) must not discard the whole session's
    measurements — the JSON artifact is the round's record."""
    if os.environ.get("BENCH_SKIP_CONTROLS"):
        return {}
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    try:
        from scaling_bench import CONTROL, CONTROL_BW, platform_control_at

        return {
            "parse_tp": round(platform_control_at(procs, CONTROL), 1),
            "bw_tp": round(platform_control_at(procs, CONTROL_BW), 2),
        }
    except Exception as e:  # noqa: BLE001 — control is advisory
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    n_docs = int(os.environ.get("BENCH_N_DOCS", max(int(200_000 * sf), 1000)))
    n_runs = int(os.environ.get("BENCH_RUNS", 4))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    steal = _StealSampler()
    # platform controls BEFORE the JVM exists: the measurement is the
    # box, not contention with our own executor threads
    ctl_start = _platform_controls(cpus)
    spark = get_spark(app_name="geoparser-bench")
    from geoparser_spark.testing.gazetteer import gazetteer_df

    gaz = gazetteer_df(spark).cache()
    gaz.count()

    # warmup: same plan shape, tiny corpus — JIT/codegen out of the
    # measured window
    run_pipeline(spark, 500, gaz, mega_every=0)

    wall, _ = run_pipeline(spark, n_docs, gaz, runs=n_runs)

    # representative operator queries over the sf tables
    import __spark_entry__ as entrymod

    q_names = [
        "pipeline_extract_spans", "geotag_candidates", "tpch_q1_pricing",
        "tpch_q3_shipping", "q4_semi_join", "dedup_exact",
        "dedup_minhash_lsh", "dedup_simhash", "sim_topk_bruteforce",
        "text_quality_score", "text_fingerprint",
        "dedup_lines_cms", "dedup_embedding_lsh", "text_pii_scrub",
        "curation_decontaminate", "curation_familiarity", "sample_hash",
        "dedup_cluster", "events_asof_state", "events_interval_join",
        "q14_nearest_place", "text_chunk_windows", "text_pack_sequences",
        "events_rolling_sum", "text_tfidf_topk", "dedup_levenshtein",
        "dedup_semantic", "text_bpe_encode", "web_url_dedup",
        "geo_zorder_cells", "events_funnel", "events_salted_join",
        "q15_bm25_search", "text_compression_ratio", "web_host_pagerank",
        "profile_histogram", "events_cube", "dedup_substring",
        "text_unicode_norm", "dedup_lsh_incremental", "ann_knn_join",
        "sample_temperature", "curation_familiarity2", "text_all_signals",
        "eval_lsh_recall_matrix", "sample_global_shuffle",
    ]
    qs = entrymod.queries()
    times: dict[str, float] = {"extract_geotag_pipeline": round(wall, 3)}
    from geoparser_spark.plans.caching import release_all

    for name in q_names:
        walls = []
        for r in range(n_runs + 1):  # run 0 is warmup, discarded
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_all()  # enforced cache release INSIDE the timed
            # region: the cost of dropping a query's caches is part of
            # that query's wall, and caches never accumulate across
            # the 46-query session (plans/caching.py)
            if r > 0:
                walls.append(time.monotonic() - t0)
        times[name] = round(min(walls), 3)

    spark.stop()
    # and again AFTER: start-vs-end drift flags a window that degraded
    # mid-session (one more story min-of-4 cannot tell on its own)
    ctl_end = _platform_controls(cpus)
    result = {
        "metric": "extract_geotag_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / wall, 2),
        "runs_per_query": n_runs,
        "steal": steal.stop(),
        "controls": {"procs": cpus, "start": ctl_start, "end": ctl_end},
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
