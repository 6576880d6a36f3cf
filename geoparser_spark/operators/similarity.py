"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — one codegen'd pass, orderBy+limit
(TakeOrderedAndProject: no full sort materializes).  Scale paths:
  * LSH (random-hyperplane sign buckets): candidates share a bucket
    key; exact rerank inside buckets only.
  * IVF (inverted file over k-means centroids): assign every vector to
    its nearest centroid natively; probe only the closest nprobe lists.

All distance math is native SQL (zip_with + aggregate) — zero Python
in any hot path; numpy appears only to fit IVF centroids on a bounded
sample at the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoparser_spark.operators.tiles import kmeans_fit


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_to_query(vec_col: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def brute_force_topk(embeddings: DataFrame, query: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k.  orderBy+limit compiles to
    TakeOrderedAndProject — per-partition heaps + driver merge, no
    global sort shuffle."""
    return (
        embeddings.select(
            F.col(id_col),
            cosine_to_query(F.col(vec_col).cast("array<double>"), query).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-of-dot-product bucket key as a bit string — native.

    The planes ship as ONE SQL array-of-arrays literal (a single parsed
    expression) instead of n_planes x dim individual F.lit Column
    objects: at 8 planes x 64 dims the literal-by-literal construction
    was ~1000 py4j round trips of driver-side plan-building per query
    (measured ~1.5 s) for identical semantics — the per-plane dot is
    still the same left-fold _dot, so bucket strings are bit-identical."""
    rows = ", ".join(
        "array(" + ", ".join(repr(float(x)) + "D" for x in p) + ")"
        for p in planes
    )
    planes_lit = F.expr(f"array({rows})")
    return F.array_join(
        F.transform(
            planes_lit,
            lambda p: F.when(_dot(vec_col, p) >= 0, "1").otherwise("0"),
        ),
        "",
    )


def lsh_topk(embeddings: DataFrame, query: list[float], k: int = 10,
             n_planes: int = 8, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN: rerank only vectors in the query's hyperplane bucket.
    Recall < 1 by design; the bucket scan touches ~1/2^n_planes of the
    data (partition-prunable if the table is written bucketed by the
    key)."""
    planes = _hyperplanes(len(query), n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    qkey = "".join("1" if float(np.dot(p, query)) >= 0 else "0" for p in planes)
    return (
        embeddings.withColumn("bucket", lsh_bucket_col(v, planes))
        .where(F.col("bucket") == qkey)
        .select(F.col(id_col), cosine_to_query(v, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_fit_centroids(embeddings: DataFrame, n_lists: int = 16,
                      sample: int = 4096, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> np.ndarray:
    """Fit IVF centroids on a deterministic bounded sample (same
    deterministic k-means as the tile pyramid — kmeans_fit works on
    arbitrary dim).  The sample is keyed on xxhash64 of the row id
    (tie-broken by the id itself): id hashing is cheap, fully
    reproducible, and independently recomputable — the previous
    string-cast-of-the-vector key depended on Java's double formatting."""
    pdf = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample)
        .toPandas()
    )
    pts = np.array(pdf["v"].tolist(), dtype=np.float64)
    return kmeans_fit(pts, n_lists)


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid list id per vector — a native expression over
    centroid literals (no Python, no shuffle)."""
    v = F.col(vec_col).cast("array<double>")
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(x)) for x in c]),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return embeddings.withColumn(
        "ivf_list", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def ivf_topk(embeddings: DataFrame, query: list[float], centroids: np.ndarray,
             k: int = 10, nprobe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Probe the nprobe nearest inverted lists, exact rerank inside.
    At scale the table is pre-partitioned by ivf_list so the probe is
    partition pruning, not a scan."""
    q = np.asarray(query, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]
    assigned = ivf_assign(embeddings, centroids, vec_col)
    v = F.col(vec_col).cast("array<double>")
    return (
        assigned.where(F.col("ivf_list").isin(probe))
        .select(F.col(id_col), cosine_to_query(v, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_bucketize(embeddings: DataFrame, path: str, n_planes: int = 8,
                  seed: int = 42, dim: int | None = None,
                  vec_col: str = "embedding") -> None:
    """Materialize the table partitioned by LSH bucket — the scale path
    for repeated queries: a top-k then reads ONE partition directory
    (true partition pruning at the file level) instead of scanning the
    corpus to recompute buckets per query."""
    first = embeddings.select(F.size(vec_col)).first()
    d = dim or (first[0] if first else 0)
    planes = _hyperplanes(d, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    (
        embeddings.withColumn("bucket", lsh_bucket_col(v, planes))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    )


def lsh_topk_prebucketed(spark, path: str, query: list[float], k: int = 10,
                         n_planes: int = 8, seed: int = 42,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """ANN over a bucket-partitioned table: the bucket equality predicate
    prunes to one partition directory — the scan reads ~1/2^n_planes of
    the files, no bucket recomputation."""
    planes = _hyperplanes(len(query), n_planes, seed)
    qkey = "".join("1" if float(np.dot(p, query)) >= 0 else "0" for p in planes)
    v = F.col(vec_col).cast("array<double>")
    return (
        spark.read.parquet(path)
        .where(F.col("bucket") == qkey)
        .select(F.col(id_col), cosine_to_query(v, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_materialize(embeddings: DataFrame, centroids: np.ndarray,
                    path: str, vec_col: str = "embedding") -> None:
    """Materialize the table partitioned by inverted-list id: probes
    become partition pruning (read nprobe directories), the layout a
    production IVF index uses."""
    (
        ivf_assign(embeddings, centroids, vec_col)
        .write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    )


def ivf_topk_pruned(spark, path: str, query: list[float],
                    centroids: np.ndarray, k: int = 10, nprobe: int = 2,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Probe a pre-partitioned IVF table: the IN-list predicate on the
    partition column prunes the scan to the probed directories."""
    q = np.asarray(query, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]
    v = F.col(vec_col).cast("array<double>")
    return (
        spark.read.parquet(path)
        .where(F.col("ivf_list").isin(probe))
        .select(F.col(id_col), cosine_to_query(v, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, pairwise) — for
    bounded/filtered subsets; at scale feed LSH buckets in first."""
    v = F.col(vec_col).cast("array<double>")
    base = embeddings.select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("nrm")
    )
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.99,
                       n_planes: int = 8, n_tables: int = 2, seed: int = 42,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       dim: int | None = None) -> DataFrame:
    """Embedding near-dup pairs via multi-table sign-LSH — the scale
    path that replaces :func:`cosine_near_dup_pairs`'s O(n²) self-join.

    Candidates are pairs whose bucket key matches in ANY of n_tables
    independent plane sets (seeds seed..seed+n_tables-1) — the same
    banding idea as MinHash-LSH: per-table collision probability for
    angle θ is (1-θ/π)^n_planes, and tables are OR-ed for recall.  The
    band join carries IDS ONLY (vectors would ride the exchange
    n_tables-fold otherwise); after dropDuplicates on the pair, each
    side's vector is re-attached and the exact cosine filter runs.
    Shuffle is proportional to vectors × tables, never to pairs.
    Recall < 1 by design; the pairs it does emit are exactly verified.
    Pass ``dim`` when known to skip the one-row dimension probe job.
    """
    if dim is None:
        first = embeddings.select(F.size(vec_col)).first()
        dim = first[0] if first else 0
    v = F.col(vec_col).cast("array<double>")
    # Hard-fail on a dim mismatch: zip_with null-pads a shorter vector,
    # the dot folds to NULL, every sign test yields '0' and ALL vectors
    # share one bucket — silently degenerating to the O(n²) cross join
    # this function exists to avoid.
    # (as a WHERE clause — a projected-then-dropped assert column gets
    # pruned by Catalyst and never evaluates; assert_true returns NULL
    # on success, so the filter passes every valid row and throws on
    # the first invalid one)
    guarded = embeddings.where(
        F.assert_true(
            F.size(vec_col) == F.lit(dim),
            F.lit(f"lsh_near_dup_pairs: embedding size != dim={dim}"),
        ).isNull()
    )
    base = guarded.select(F.col(id_col).alias("id"), v.alias("v"),
                          _norm(v).alias("nrm"))
    buckets = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            lsh_bucket_col(F.col("v"), _hyperplanes(dim, n_planes, seed + t))
             .alias("bucket"),
        )
        for t in range(n_tables)
    ])
    banded = base.select("id", F.explode(buckets).alias("tb")) \
                 .select("id", "tb.tbl", "tb.bucket")
    a = banded.select(F.col("tbl").alias("t_a"), F.col("bucket").alias("b_a"),
                      F.col("id").alias("id_a"))
    b = banded.select(F.col("tbl").alias("t_b"), F.col("bucket").alias("b_b"),
                      F.col("id").alias("id_b"))
    cand = (
        a.join(b, (F.col("t_a") == F.col("t_b"))
               & (F.col("b_a") == F.col("b_b"))
               & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    left = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                       F.col("nrm").alias("n_a"))
    right = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        F.col("nrm").alias("n_b"))
    return (
        cand.join(left, "id_a").join(right, "id_b")
        .withColumn("cosine",
                    _dot(F.col("v_a"), F.col("v_b"))
                    / (F.col("n_a") * F.col("n_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup_prune(embeddings: DataFrame, centroids: np.ndarray,
                   threshold: float = 0.3, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:
    2303.09540): cluster the embedding space, then prune any vector
    that has a LOWER-id neighbor in the SAME cluster with cosine >=
    threshold (keep-lowest-id is the deterministic stand-in for the
    paper's keep-farthest-from-centroid — representative choice is
    policy, the quadratic-bounded-by-cluster structure is the
    algorithm).

    Shape at scale: assignment is a native expression (no shuffle);
    the pairwise pass is a self-equi-join on ivf_list, so the shuffle
    is cluster-grain and the quadratic is bounded by cluster size —
    exactly why SemDeDup clusters first.  Oversized clusters are the
    skew knob: raise n_lists (or sub-cluster recursively) so no single
    cluster outgrows a task.

    Returns (vec_id, ivf_list, pruned: int 0/1) for every input row.
    """
    from geoparser_spark.plans.caching import track

    assigned = track(ivf_assign(embeddings, centroids, vec_col=vec_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        "ivf_list",
    ).withColumn(
        # per-VECTOR norm computed once here, not re-folded per PAIR in
        # the quadratic pass (the oracle replica caches norms the same
        # way, so the float ops stay bit-identical)
        "nrm", _norm(F.col("v")),
    ))  # feeds both join sides + the final flag join: without the
    # persist the n_lists x dim literal fold re-evaluates 3x per
    # vector; release enforced via plans.caching (released()/
    # release_all())
    keep = assigned.select(
        F.col("id").alias("id_keep"), F.col("v").alias("v_keep"),
        F.col("nrm").alias("n_keep"), "ivf_list")
    cand = assigned.select(
        F.col("id").alias("id_cand"), F.col("v").alias("v_cand"),
        F.col("nrm").alias("n_cand"), "ivf_list")
    cos = _dot(F.col("v_keep"), F.col("v_cand")) / (
        F.col("n_keep") * F.col("n_cand"))
    pruned = (
        keep.join(cand, "ivf_list")
        .where(F.col("id_keep") < F.col("id_cand"))
        .where(cos >= F.lit(threshold))
        .select(F.col("id_cand").alias("id"))
        .distinct()
        .withColumn("pruned", F.lit(1))
    )
    return (
        assigned.join(pruned, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "ivf_list",
            F.coalesce(F.col("pruned"), F.lit(0)).cast("int").alias("pruned"),
        )
    )


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
             n_planes: int = 4, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int | None = None) -> DataFrame:
    """Batch ANN join: top-k corpus neighbours for EVERY query vector —
    the multi-query serving shape (the single-vector lsh_topk/ivf_topk
    answer one literal query; embedding-lookup serving and
    retrieval-training pipelines join whole tables of queries).

    Shape: both sides get the SAME sign-LSH bucket key (one literal
    plane array, codegen'd fold per row); candidates come from an
    equi-join on the bucket — shuffle ∝ rows, never |Q|x|N|; the exact
    cosine rerank runs on candidates only; per-query top-k is a
    rank-limit window, which Spark compiles with a PARTIAL
    WindowGroupLimit before the exchange (each map task forwards at
    most k rows per query it sees).  Recall < 1 by construction
    (single-probe); raise recall with multi-table union like
    lsh_near_dup_pairs.

    ``dim`` defaults to probing one row (bounded driver action).
    Returns (q_id, c_id, cosine[rounded 6], rank).
    """
    from pyspark.sql import Window

    if dim is None:
        probe = queries.select(vec_col).head()
        if probe is None or probe[0] is None:  # empty/NULL queries:
            return queries.select(            # the empty result shape
                F.col(id_col).alias("q_id"),
                F.col(id_col).alias("c_id"),
                F.lit(0.0).alias("cosine"),
                F.lit(0).alias("rank"),
            ).where(F.lit(False))
        dim = len(probe[0])
    planes = _hyperplanes(dim, n_planes, seed)
    qv = F.col(vec_col).cast("array<double>")
    q = queries.select(
        F.col(id_col).alias("q_id"), qv.alias("qv"),
        lsh_bucket_col(qv, planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), qv.alias("cv"),
        lsh_bucket_col(qv, planes).alias("bucket"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv")))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_raw").desc(), F.col("c_id").asc())
    return (
        q.join(c, "bucket")
        .select("q_id", "c_id", cos.alias("cos_raw"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("cos_raw", 6).alias("cosine"),
                "rank")
    )
