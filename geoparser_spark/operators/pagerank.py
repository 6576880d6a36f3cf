"""Host-level PageRank for crawl curation.

Web-scale training pipelines rank crawl hosts by link structure to
weight or prune sources (the Common-Crawl-style domain ranking the
mixing stage consumes).  The reference itself never ranks — it serves
whatever Solr returns — but its corpus IS a crawl (the admin layer
manages per-domain crawled indexes: search_crawled_index,
geoparser_app/views.py:415-427; domain/index tables,
geoparser_app/solr_admin.py), so the curation layer needs the ranking
the crawler side would provide.

Integer-exact formulation: double-precision PageRank is
order-dependent (float sums do not associate), so distributed re-runs
would not be bit-reproducible.  Ranks here are scaled integers
(``SCALE`` micro-units per node):

    r0(v)   = SCALE
    r_t+1(v)= floor(0.15 * SCALE) + sum_{u->v} floor(17 * r_t(u)
                                                / (20 * outdeg(u)))

Integer sums are order-independent, so the result is identical on any
partitioning, any executor count, and in the pure-Python oracle
replica.  Dangling hosts (no outlinks) keep receiving the teleport
term but forward nothing — the standard mass-leak simplification,
mirrored exactly by the oracle.  Overflow bound: a rank can never
exceed total initial mass n*SCALE, so ``17 * r`` fits a long for
n*SCALE < 5.4e17 (e.g. 5e8 hosts at SCALE=1e9 — beyond any real
host graph).

Plan shape (the 100 TB question): edges are normalized to distinct
(src, dst) with outdeg attached ONCE and persisted hash-partitioned on
src; each iteration is then one co-partitioned join ranks⋈edges (ranks
arrive already hashed on the same key — no edge re-shuffle) plus one
aggregation shuffle at host grain (hosts ≪ pages: this is the small
table).  ``localCheckpoint`` every few rounds truncates the lineage
exactly like operators/components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # integer rank units per node
TELEPORT_NUM, TELEPORT_DEN = 15, 100   # 0.15
DAMP_NUM, DAMP_DEN = 17, 20            # 0.85


def pagerank(edges: DataFrame, iterations: int = 10,
             src_col: str = "src", dst_col: str = "dst",
             checkpoint_every: int = 4) -> DataFrame:
    """(src, dst) link table → (host, rank) with integer-exact ranks.

    ``edges`` may contain duplicates; they are collapsed to distinct
    directed pairs first (host-grain PageRank over the site graph).
    Returns every host that appears as src or dst.
    """
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # one-time normalization: edges carry outdeg, hash-partitioned on
    # src so every iteration's ranks join arrives co-partitioned
    e = (e.join(outdeg, "src")
         .repartition("src")
         .persist())
    e.count()
    # nodes derive from the PERSISTED edge table and persist themselves
    # — otherwise every iteration re-runs the distinct over raw input
    nodes = (e.select(F.col("src").alias("host"))
             .unionAll(e.select(F.col("dst").alias("host")))
             .distinct()
             .persist())

    teleport = (TELEPORT_NUM * SCALE) // TELEPORT_DEN
    ranks = nodes.select("host", F.lit(SCALE).cast("long").alias("rank"))
    for it in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("host", "src"), "src")
            .select(
                F.col("dst").alias("host"),
                F.expr(f"(rank * {DAMP_NUM}) DIV ({DAMP_DEN} * outdeg)")
                .alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (F.lit(teleport)
                 + F.coalesce(F.col("inflow"), F.lit(0))).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # sever the result from the cached inputs, then release them — a
    # long-lived session (bench/driver harness) must not accumulate one
    # pinned edge+node table per pagerank() call
    ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_topk(edges: DataFrame, k: int = 20,
                  iterations: int = 10) -> DataFrame:
    """Top-k hosts by rank — TakeOrderedAndProject, host tie-break."""
    return (pagerank(edges, iterations=iterations)
            .orderBy(F.col("rank").desc(), F.col("host").asc())
            .limit(k))
