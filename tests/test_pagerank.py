"""Integer-exact PageRank (operators/pagerank.py)."""

from pyspark.sql import functions as F

from geoparser_spark.operators.pagerank import SCALE, pagerank, pagerank_topk


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_cycle_is_fixed_point(spark):
    """On a pure cycle every node keeps exactly SCALE: teleport
    0.15*SCALE + floor(17*SCALE/20) = SCALE, iteration after
    iteration — the integer formula has the uniform fixed point."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = {r.host: r.rank for r in pagerank(e, iterations=7).collect()}
    assert got == {"a": SCALE, "b": SCALE, "c": SCALE}


def test_star_hub_outranks_leaves(spark):
    e = _edges(spark, [(f"leaf{i}", "hub") for i in range(5)]
               + [("hub", "leaf0")])
    got = {r.host: r.rank for r in pagerank(e, iterations=10).collect()}
    # hub collects 5 in-links; leaf0 gets hub's whole mass (outdeg 1);
    # the other leaves only ever hold the teleport term
    assert got["hub"] > got["leaf1"]
    assert got["leaf0"] > got["leaf1"]
    assert got["leaf1"] == got["leaf2"] == got["leaf4"]


def test_partitioning_invariance_and_duplicate_edges(spark):
    """Integer sums are order-independent: any partitioning, same
    bits.  Duplicate (src,dst) rows collapse before outdeg."""
    pairs = [(f"h{i}", f"h{(i * 3 + 1) % 7}") for i in range(7)] * 3 \
        + [(f"h{i}", f"h{(i + 2) % 7}") for i in range(7)]
    a = pagerank(_edges(spark, pairs).repartition(1), iterations=6)
    b = pagerank(_edges(spark, pairs).repartition(13), iterations=6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_topk_plan(spark):
    e = _edges(spark, [(f"h{i}", f"h{(i + 1) % 9}") for i in range(9)])
    q = pagerank_topk(e, k=3, iterations=4)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert q.count() == 3


def test_pagerank_releases_cached_tables(spark):
    """A long-lived session must not accumulate CacheManager-pinned
    edge/node tables across pagerank() calls.  The one allowed pin per
    LIVE result is its own localCheckpoint storage, which Spark's
    ContextCleaner reclaims when the caller drops the DataFrame —
    unlike .persist() entries, which stay until explicit unpersist."""
    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    e = _edges(spark, [("a", "b"), ("b", "a")])
    r1 = pagerank(e, iterations=3)
    r1.collect()
    r2 = pagerank(e, iterations=3)
    r2.collect()
    after = sc.getPersistentRDDs().size()
    # two LIVE results => at most 2 checkpoint pins; the edge/node
    # caches of both calls must be gone (4 tables would leak otherwise)
    assert after <= before + 2
