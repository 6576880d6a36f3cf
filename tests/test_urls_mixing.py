"""URL canonicalization (operators/urls.py), weighted sampling
(sampling.weighted_sample), and idempotent snapshot ingest
(snapshots.append_dedup)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geoparser_spark.operators.sampling import weighted_sample
from geoparser_spark.operators.urls import canonical_url, url_dedup
from geoparser_spark.plans import snapshots as SN


def _canon(spark, urls):
    df = spark.createDataFrame([Row(url=u) for u in urls])
    return [r.c for r in
            df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_rules(spark):
    got = _canon(spark, [
        "HTTP://Example.COM:80/path/?b=2&a=1#frag",
        "https://Example.com:443",
        "http://user@Example.com:80/x/",
        "http://example.com/",
        "ftp://Host:21/file",
        "http://example.com/?",
    ])
    assert got == [
        "http://example.com/path?a=1&b=2",
        "https://example.com/",
        "http://user@example.com/x",
        "http://example.com/",   # root slash preserved
        "ftp://host:21/file",    # non-default port preserved
        "http://example.com/",   # empty query dropped
    ]


def test_canonical_url_collapses_variants(spark):
    variants = [
        "http://A.example/p?x=1&y=2",
        "HTTP://a.EXAMPLE:80/p/?y=2&x=1#z",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_url_dedup_counts_and_representative(spark):
    df = spark.createDataFrame([
        Row(url="http://a.example/p"),
        Row(url="HTTP://A.example:80/p/"),
        Row(url="http://b.example/q"),
    ])
    got = {r.canon_url: r for r in url_dedup(df).collect()}
    assert got["http://a.example/p"].n_variants == 2
    # bytewise-min raw spelling is the representative
    assert got["http://a.example/p"].first_url == "HTTP://A.example:80/p/"
    assert got["http://b.example/q"].n_variants == 1


def test_weighted_sample_rates_and_determinism(spark):
    rows = [Row(doc_id=i, source=f"src{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows)
    rates = {"src0": 0, "src1": 2500, "src2": 10_000}
    out = weighted_sample(df, rates).groupBy("source").count().collect()
    got = {r.source: r["count"] for r in out}
    assert "src0" not in got                     # dropped entirely
    assert got["src2"] == 500                    # keep-all
    assert got["src3"] == 500                    # default keeps all
    assert 75 <= got["src1"] <= 175              # ~25% of 500
    # stable: second run identical row set
    a = sorted(r.doc_id for r in weighted_sample(df, rates).collect())
    b = sorted(r.doc_id for r in weighted_sample(df, rates).collect())
    assert a == b


def test_weighted_sample_rejects_bad_rate(spark):
    df = spark.createDataFrame([Row(doc_id=1, source="s")])
    with pytest.raises(ValueError):
        weighted_sample(df, {"s": 10_001})


def test_append_dedup_idempotent(spark):
    root = tempfile.mkdtemp(prefix="gp_ad_t_")
    try:
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=f"t{i}") for i in range(20)]
        )
        SN.create_table(docs.where(F.col("doc_id") % 2 == 0), root,
                        key="doc_id")
        r1 = SN.append_dedup(spark, docs, root, hash_cols=["doc_id", "text"])
        assert r1["appended"] == 10                # ROW count, not file count
        assert SN.read_snapshot(spark, root).count() == 20
        r2 = SN.append_dedup(spark, docs, root, hash_cols=["doc_id", "text"])
        assert r2["appended"] == 0                 # zero-row redelivery
        assert r2["version"] == r1["version"]      # no empty commit
        assert SN.read_snapshot(spark, root).count() == 20
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_append_dedup_self_dedupes_batch(spark):
    root = tempfile.mkdtemp(prefix="gp_ad_t2_")
    try:
        base = spark.createDataFrame([Row(doc_id=1, text="a")])
        SN.create_table(base, root, key="doc_id")
        twin = spark.createDataFrame(
            [Row(doc_id=2, text="b"), Row(doc_id=2, text="b")]
        )
        SN.append_dedup(spark, twin, root, hash_cols=["doc_id", "text"])
        assert SN.read_snapshot(spark, root).count() == 2
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_append_dedup_null_vs_missing_not_collided(spark):
    import shutil as _sh
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="gp_ad_null_")
    try:
        base = spark.createDataFrame([Row(doc_id=1, text="seed")])
        SN.create_table(base, root, key="doc_id")
        # two rows whose concat_ws-without-sentinel digests would
        # collide: ('a', NULL) vs ('a\x1f',) -> both 'a' under skip-null
        batch = spark.createDataFrame(
            [Row(doc_id=2, text=None), Row(doc_id=2, text="")]
        )
        SN.append_dedup(spark, batch, root, hash_cols=["text"])
        assert SN.read_snapshot(spark, root).count() == 3
    finally:
        _sh.rmtree(root, ignore_errors=True)
