"""Distributed connected components — the missing last stage of the
near-dup dedup story: MinHash-LSH / SimHash / embedding-LSH emit PAIRS,
but dedup must act on CLUSTERS (keep one canonical doc per component,
drop the rest).  Pair lists are not transitively closed: (a,b), (b,c)
must collapse to one cluster {a,b,c} even though (a,c) never survived
the similarity threshold.

Algorithm: the alternating large-star / small-star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
each round is two groupBy-min + join passes over the edge list, and the
edge list provably CONTRACTS toward a star per component in O(log^2 n)
rounds (O(log n) in practice; near-dup clusters are dense and close in
2-3).  This is the right 100 TB shape:

* state is only the current edge list — no vertex-indexed maps, no
  driver-side graph, memory O(|edges|/partitions) per task;
* naive min-label propagation needs O(diameter) rounds (a 10^6-long
  chain of pairwise near-dups — common in templated spam — needs 10^6
  shuffles; alternating stars need ~40);
* every round's shuffle keys on the node id, so AQE coalesces and
  skew-splits the mega-component partitions.

Each iteration ends in ``localCheckpoint`` to truncate lineage (an
iterative plan otherwise grows one join+agg deep per round and Catalyst
re-optimizes the whole history every action).  On a real cluster with a
reliable checkpoint dir, pass ``use_reliable_checkpoint=True`` (executor
loss under localCheckpoint forfeits the partition).

Reference parity: GeoParser has no clustering stage (its dedup is
Solr's per-field exact match, /root/reference/geoparser_app/views.py
search paths); this operator serves the LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "assign_components", "canonical_docs"]


def _dedup_edges(e: DataFrame) -> DataFrame:
    return e.dropDuplicates(["u", "v"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to the min of u's closed
    neighborhood.  Input/output: undirected edges as (u, v) rows in
    arbitrary orientation; output edges point larger -> smaller-min."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("nbr_min"))
        .select("u", F.least("u", "nbr_min").alias("m"))
    )
    out = (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    return _dedup_edges(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor <= u (and u itself) to the min of u's
    smaller neighborhood.  Orients each edge larger-first, so the
    grouped neighbors are exactly the smaller ones."""
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        e.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
    )
    return _dedup_edges(out)


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(count, order-free checksum) in ONE action — the convergence
    probe.  xxhash64 over both endpoints makes checksum collisions
    across iterations vanishingly unlikely; equality of (count, sum)
    across consecutive rounds is the fixpoint test."""
    row = edges.agg(
        F.count("*").alias("n"),
        # decimal accumulator: a long sum of 64-bit hashes overflows
        # (ANSI mode raises); decimal(38,0) holds 10^12 rows of 10^19
        # terms exactly, and this probe aggregates a handful of rows
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("chk"),
    ).collect()[0]
    return int(row["n"]), int(row["chk"])


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 50,
                         use_reliable_checkpoint: bool = False) -> DataFrame:
    """Pairs (id_a, id_b) -> (id, component) where component is the
    MINIMUM id in each connected component.  Only ids that appear in
    ``pairs`` are emitted (isolated docs trivially form their own
    singleton — :func:`assign_components` fills them in without ever
    materializing singleton edges).

    Ids must be orderable and hashable under xxhash64 (long or string).
    Raises RuntimeError if ``max_iter`` rounds do not converge — at the
    default 50 that would take a component of ~2^50 nodes (the bound is
    O(log^2 n) rounds), i.e. it only fires on a genuine bug."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    checkpoint = (
        (lambda df: df.checkpoint(eager=True)) if use_reliable_checkpoint
        else (lambda df: df.localCheckpoint(eager=True))
    )
    edges = checkpoint(edges)
    prev = None
    for _ in range(max_iter):
        new_edges = checkpoint(_small_star(_large_star(edges)))
        fp = _edge_fingerprint(new_edges)
        if fp == prev:
            # The fingerprint is a cheap probabilistic screen; before
            # declaring the fixpoint, CONFIRM with one exact set check.
            # Counts are equal (part of fp) and both sides are deduped,
            # so one-sided exceptAll emptiness == multiset equality.
            # This runs once per convergence (not per round), making the
            # termination test airtight at the cost of a single extra
            # edge-grain comparison over the whole run.
            if new_edges.exceptAll(edges).isEmpty():
                edges = new_edges
                break
        prev = fp
        edges = new_edges
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # at fixpoint the edge list IS the star assignment (node -> root);
    # roots appear only on the v side — add their self-assignment
    nodes = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id")).distinct().join(
        nodes.select("id"), "id", "left_anti"
    ).select("id", F.col("id").alias("component"))
    return nodes.union(roots)


def assign_components(ids: DataFrame, components: DataFrame,
                      id_col: str = "doc_id",
                      broadcast_map: bool = True) -> DataFrame:
    """Left-join the component map onto a full id universe: docs that
    never appeared in any pair keep their own id as the component.

    ``broadcast_map=True`` fits corpora whose near-dup members are a
    small minority.  Raw web crawls are NOT that (30-50% near-dup rates
    are routine, so the map is billions of rows): pass False and the
    join shuffles on the id both sides — one exchange, equi-key, AQE
    handles the rest."""
    comp = components.select(
        F.col("id").alias(id_col), F.col("component").alias("_comp")
    )
    if broadcast_map:
        comp = F.broadcast(comp)
    return (
        ids.join(comp, id_col, "left")
        .withColumn("component", F.coalesce(F.col("_comp"), F.col(id_col)))
        .drop("_comp")
    )


def canonical_docs(docs: DataFrame, components: DataFrame,
                   id_col: str = "doc_id",
                   broadcast_map: bool = True) -> DataFrame:
    """Keep exactly one doc per component — the minimum id (stable,
    rerun-safe; no arbitrary first()).  Because the component label IS
    the min member id, the keep-set is just ids where id == component:
    a broadcast semi-join against the (small) component map, never a
    corpus shuffle."""
    assigned = assign_components(docs, components, id_col, broadcast_map)
    return assigned.where(F.col(id_col) == F.col("component")).drop("component")
