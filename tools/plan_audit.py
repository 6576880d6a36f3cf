"""Dump formatted physical plans of the headline queries to PLANS.md.

The scale invariants (broadcast-not-shuffle tag join, bounded exchange
count, scan pushdown, partition pruning, TakeOrderedAndProject top-k,
zero-exchange simhash) are enforced by tests/test_plans.py; this tool
materializes the actual plans so a reviewer can read them without
running Spark.  Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _fmt(df) -> str:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # strip per-run noise (ids stay, paths shortened)
    return re.sub(r"file:[^\],\s]*/(sf[0-9.]+)", r"\1", plan)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    from geoparser_spark.operators.extract import extract_with_skew_split
    from geoparser_spark.operators.geotag import geotag
    from geoparser_spark.session import get_spark
    from geoparser_spark.testing.corpus import build_docs
    from geoparser_spark.testing.gazetteer import gazetteer_df

    import __spark_entry__ as entry

    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    qs = entry.queries()

    docs = build_docs(spark, 200, seed=42)
    gaz = gazetteer_df(spark)

    sections: list[tuple[str, str, str]] = [
        (
            "extract_geotag_pipeline",
            "THE headline pipeline: mega-doc split -> salted repartition "
            "(the ONE corpus shuffle) -> Arrow-batched extract -> "
            "broadcast-gazetteer tag join -> per-doc aggregation.  "
            "Invariants: BroadcastHashJoin (never SortMergeJoin) on the "
            "tag join; <= 3 non-broadcast exchanges total.",
            _fmt(geotag(extract_with_skew_split(docs, 16), gaz)),
        ),
        (
            "tpch_q3_shipping",
            "Fact-fact join + broadcast decision left to AQE (no forced "
            "hints — a forced broadcast of an O(sf) side is an OOM at "
            "sf100); top-10 via TakeOrderedAndProject.",
            _fmt(qs["tpch_q3_shipping"](spark, sf_dir)),
        ),
        (
            "q5_projection",
            "Column pruning must reach the scan: ReadSchema lists exactly "
            "the two projected columns.",
            _fmt(qs["q5_projection"](spark, sf_dir)),
        ),
        (
            "q12_topn",
            "Top-N compiles to TakeOrderedAndProject — per-partition "
            "heaps + driver merge, no global sort shuffle.",
            _fmt(qs["q12_topn"](spark, sf_dir)),
        ),
        (
            "dedup_simhash",
            "SimHash signatures: ONE higher-order expression per doc — "
            "zero exchanges, zero Generate (the naive formulation "
            "shuffles the corpus at token grain).",
            _fmt(qs["dedup_simhash"](spark, sf_dir)),
        ),
        (
            "dedup_minhash_lsh",
            "MinHash+LSH: banded equi-join on (band_idx, band_hash) — "
            "candidate generation shuffles O(docs x bands) rows, never "
            "O(pairs).",
            _fmt(qs["dedup_minhash_lsh"](spark, sf_dir)),
        ),
        (
            "dedup_lines_cms",
            "Count-min-sketch line dedup: the estimate pass is depth "
            "BroadcastHashJoins over the corpus lines (the sketch is "
            "bounded depth x width) — the corpus never shuffles on the "
            "skewed line key; no Window, no SortMergeJoin.",
            _fmt(qs["dedup_lines_cms"](spark, sf_dir)),
        ),
        (
            "dedup_embedding_lsh",
            "Embedding near-dup via multi-table sign-LSH: banded "
            "candidate equi-join carries ids only; vectors re-attach "
            "for the exact cosine verify — shuffle is O(vectors x "
            "tables), never O(pairs).",
            _fmt(qs["dedup_embedding_lsh"](spark, sf_dir)),
        ),
        (
            "curation_decontaminate",
            "Benchmark decontamination: eval-set 8-grams broadcast; the "
            "corpus side explodes grams map-side and LEFT-SEMI-probes "
            "the broadcast — the only corpus shuffle carries per-doc "
            "counters (map-side combined), never the gram stream.",
            _fmt(qs["curation_decontaminate"](spark, sf_dir)),
        ),
        (
            "curation_familiarity",
            "Unigram familiarity: the vocab aggregate shuffles at "
            "VOCABULARY grain (map-side combine collapses each "
            "partition to its distinct tokens) and broadcasts back; "
            "the per-doc rollup is the only corpus-grain shuffle.",
            _fmt(qs["curation_familiarity"](spark, sf_dir)),
        ),
        (
            "sample_hash",
            "Keyed sampling: the xxhash64 bucket filter is a codegen'd "
            "column expression at the scan — zero exchanges.",
            _fmt(qs["sample_hash"](spark, sf_dir)),
        ),
        (
            "events_asof_state",
            "As-of join via union-and-sweep: ONE key-grain exchange, "
            "no Join operator anywhere — the range semantics ride in "
            "a window sweep, never a row-multiplying join.",
            _fmt(qs["events_asof_state"](spark, sf_dir)),
        ),
        (
            "events_interval_join",
            "Binned interval join: the range predicate compiles to an "
            "EQUI hash/sort-merge join on the bin id (never "
            "BroadcastNestedLoop/Cartesian) with the range check as a "
            "residual filter.",
            _fmt(qs["events_interval_join"](spark, sf_dir)),
        ),
        (
            "sample_cap_per_group",
            "Per-group cap: rank-limit window compiles to "
            "WindowGroupLimit with a PARTIAL instance before the "
            "exchange — each map task forwards at most k rows per "
            "group it sees.",
            _fmt(qs["sample_cap_per_group"](spark, sf_dir)),
        ),
        (
            "text_tfidf_topk",
            "Corpus-relative tf-idf: token explode map-side, doc-term "
            "aggregate persisted ONCE and read by both the scored join "
            "and the vocabulary-grain df rollup (two InMemoryTableScans "
            "— without it the corpus scans twice), 1-row corpus count "
            "broadcast, per-doc top-k window — no Cartesian anywhere.",
            _fmt(qs["text_tfidf_topk"](spark, sf_dir)),
        ),
        (
            "dedup_levenshtein",
            "Banded edit-distance pairs: the self-join is an EQUI join "
            "on (lang, length-bucket) with the 2x adjacent-bucket "
            "explode on the left side only; levenshtein runs as a "
            "residual on candidates — never all-pairs.",
            _fmt(qs["dedup_levenshtein"](spark, sf_dir)),
        ),
        (
            "dedup_semantic",
            "SemDeDup: nearest-centroid assignment is a pure expression "
            "(no shuffle); the pairwise cosine pass equi-joins on "
            "ivf_list so the quadratic is bounded by cluster size and "
            "the shuffle is cluster-grain.",
            _fmt(qs["dedup_semantic"](spark, sf_dir)),
        ),
        (
            "web_url_dedup",
            "URL dedup: canonicalization is one map-side expression "
            "tree (regexp component split + array_sort of params); the "
            "single exchange is the canonical-URL aggregation.",
            _fmt(qs["web_url_dedup"](spark, sf_dir)),
        ),
        (
            "sample_weighted",
            "Weighted domain mixing: CASE-over-literals rate lookup "
            "folded into the keyed-hash filter — map-only, zero "
            "exchanges.",
            _fmt(qs["sample_weighted"](spark, sf_dir)),
        ),
        (
            "events_rolling_sum",
            "1-hour rolling aggregate: RANGE frame over integer "
            "microseconds — ONE user-grain exchange, sliding-frame "
            "WindowExec, exact long-cents arithmetic.",
            _fmt(qs["events_rolling_sum"](spark, sf_dir)),
        ),
        (
            "profile_documents",
            "Table profiling: 5 columns x 5 metrics in ONE scan + one "
            "1-row exchange; the per-column unpivot explodes the "
            "single aggregate row, never re-scanning.",
            _fmt(qs["profile_documents"](spark, sf_dir)),
        ),
        (
            "q15_bm25_search",
            "BM25 ranked search: corpus stats collapse to a driver row "
            "(the aggregate pass is separate); the scoring pass is one "
            "codegen'd expression over literal idf/avgdl constants + "
            "TakeOrderedAndProject — no join, no window, no sort.",
            _fmt(qs["q15_bm25_search"](spark, sf_dir)),
        ),
        (
            "text_compression_ratio",
            "zlib compression signal: scan pruned to (id, text), one "
            "Arrow-batched MapInPandas stage, zero exchanges — "
            "embarrassingly parallel at any scale.",
            _fmt(qs["text_compression_ratio"](spark, sf_dir)),
        ),
        (
            "web_host_pagerank",
            "Integer-exact PageRank: edges normalized once with outdeg "
            "attached and persisted hash-partitioned on src (one "
            "InMemoryTableScan per iteration); each round is a "
            "co-partitioned ranks-edges join + one host-grain "
            "aggregation — contributions combine map-side.",
            _fmt(qs["web_host_pagerank"](spark, sf_dir)),
        ),
        (
            "profile_histogram",
            "Equi-width histogram: map-only bucket expression, then a "
            "bucket-grain count — the exchange after map-side combine "
            "carries at most `buckets` rows per task.",
            _fmt(qs["profile_histogram"](spark, sf_dir)),
        ),
        (
            "events_cube",
            "CUBE: one scan -> Expand (4 grouping sets) -> single hash "
            "aggregate; no per-grouping-set rescan.",
            _fmt(qs["events_cube"](spark, sf_dir)),
        ),
        (
            "text_all_signals",
            "Single-scan signal extraction: language ID + quality + "
            "token counts + repetition + fingerprints as ONE map-only "
            "projection, zero exchanges — five standalone queries scan "
            "the corpus five times.",
            _fmt(qs["text_all_signals"](spark, sf_dir)),
        ),
        (
            "ann_knn_join",
            "Batch ANN join: bucket equi-join candidates (shuffle "
            "proportional to rows, never |Q|x|N|), exact cosine rerank, "
            "per-query top-k via rank window with the PARTIAL "
            "WindowGroupLimit before the exchange.",
            _fmt(qs["ann_knn_join"](spark, sf_dir)),
        ),
        (
            "dedup_substring",
            "Exact-substring duplication: window hashes explode "
            "map-side into ONE window-grain aggregate (the op's honest "
            "token-grain cost) + a left-semi re-probe rolled up per "
            "doc; n_windows itself never shuffles (array size at the "
            "scan).",
            _fmt(qs["dedup_substring"](spark, sf_dir)),
        ),
    ]

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — formatted physical plans of the headline queries\n\n"
            f"Generated by tools/plan_audit.py over {sf_dir} "
            "(plan-shape invariants are enforced in tests/test_plans.py; "
            "this file is the human-readable evidence).\n"
        )
        for name, blurb, plan in sections:
            f.write(f"\n## {name}\n\n{blurb}\n\n```\n{plan}\n```\n")
    print("wrote PLANS.md")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
