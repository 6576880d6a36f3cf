"""Curation operators (operators/curation.py): decontamination,
familiarity scoring, source blocklist — behavior plus the plan
invariants (small side broadcasts, corpus side never shuffles for the
probe join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.curation import (
    ngram_overlap,
    source_filter,
    token_familiarity,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, base),                               # contains the eval 8-gram
        (2, "x " + base),                        # shifted, still contains it
        (3, "unrelated words only here nothing matches at all today ok"),
        (4, "alpha bravo charlie"),              # < 8 tokens: clean
        (5, ""),                                 # empty: clean
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string").cache()


def test_ngram_overlap_plants(spark, docs):
    ev = spark.createDataFrame(
        [(100, "alpha bravo charlie delta echo foxtrot golf hotel")],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: (r.n_gram_hits, r.contaminated)
           for r in ngram_overlap(docs, ev, n=8).collect()}
    assert got[1] == (1, True)
    assert got[2] == (1, True)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    assert got[5] == (0, False)


def test_ngram_overlap_counts_distinct_per_doc(spark):
    # the same eval gram repeated in one doc counts once
    d = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d e f g h")],
        "doc_id: long, text: string",
    )
    ev = spark.createDataFrame([(9, "a b c d e f g h")],
                               "doc_id: long, text: string")
    [r] = ngram_overlap(d, ev, n=8).collect()
    # grams of the doubled doc include the eval gram plus shifted ones;
    # the eval gram itself contributes exactly one hit
    assert r.n_gram_hits == 1


def test_ngram_probe_join_is_broadcast(spark, docs):
    ev = docs.where(F.col("doc_id") == 1)
    plan = (
        ngram_overlap(docs, ev, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hashed_and_string_grams_agree(spark, docs):
    """The xxhash64 fingerprint probe must give the same hit counts as
    the byte-exact string-gram join (the DuckDB oracle mirrors the
    string formulation)."""
    ev = docs.where(F.col("doc_id").isin(1, 3))
    a = sorted(map(tuple, ngram_overlap(docs, ev, n=8, hashed=True).collect()))
    b = sorted(map(tuple, ngram_overlap(docs, ev, n=8, hashed=False).collect()))
    assert a == b


def test_familiarity_integer_exact(spark):
    d = spark.createDataFrame(
        [(1, "cat cat cat dog"), (2, "cat bird"), (3, "")],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.familiarity)
           for r in token_familiarity(d, min_count=2).collect()}
    # corpus freqs: cat=4, dog=1(oov), bird=1(oov), ''=1(oov)
    assert got[1] == (4, 1, 12)   # 3 cats * 4 + dog oov
    assert got[2] == (2, 1, 4)
    assert got[3] == (1, 1, 0)    # '' token, oov


def test_familiarity_deterministic_across_partitioning(spark):
    rows = [(i, f"w{i % 7} w{i % 3} common common") for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    a = sorted(map(tuple, token_familiarity(d, 5).collect()))
    b = sorted(map(tuple, token_familiarity(d.repartition(13), 5).collect()))
    assert a == b


def test_source_filter_anti_join(spark):
    d = spark.createDataFrame(
        [(1, "a", "good.com"), (2, "b", "spam.com"), (3, "c", "good.com")],
        "doc_id: long, text: string, source: string",
    )
    blocked = spark.createDataFrame([("spam.com",)], "source: string")
    kept = sorted(r.doc_id for r in source_filter(d, blocked).collect())
    assert kept == [1, 3]
    plan = source_filter(d, blocked)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_bigram_familiarity(spark):
    """Known counts: a bigram appearing in >= min_count docs scores;
    rare bigrams are OOV; one-token docs emit zero bigrams."""
    from geoparser_spark.operators.curation import bigram_familiarity

    rows = [(i, "the cat sat") for i in range(1, 4)] + [
        (4, "the cat ran away"), (5, "word")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           bigram_familiarity(docs, min_count=3).collect()}
    # "the cat" occurs 4x (docs 1-4) -> familiar; "cat sat" 3x -> familiar
    assert got[1].n_bigrams == 2 and got[1].n_oov_bigrams == 0
    assert got[1].bigram_familiarity == 4 + 3
    # doc 4: "the cat"(4) familiar, "cat ran"/"ran away" 1x -> OOV
    assert got[4].n_bigrams == 3 and got[4].n_oov_bigrams == 2
    assert got[4].bigram_familiarity == 4
    assert got[5].n_bigrams == 0 and got[5].bigram_familiarity == 0
