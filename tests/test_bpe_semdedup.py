"""BPE tokenizer (operators/bpe.py) and SemDeDup
(similarity.semdedup_prune) unit tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from geoparser_spark.operators.bpe import (
    bpe_encode,
    encode_word,
    learn_bpe,
)
from geoparser_spark.operators.similarity import semdedup_prune


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i * 10, text=t) for i, t in enumerate(texts)]
    )


def test_learn_bpe_picks_most_frequent_pair(spark):
    # 'ab' dominates: first merge must be (a, b)
    d = _docs(spark, ["ab ab ab abc", "ab ab"])
    merges = learn_bpe(d, n_merges=1, modulus=10)
    assert merges == [("a", "b")]


def test_learn_bpe_tie_breaks_lexicographically(spark):
    # 'xy' and 'pq' each appear twice; lexicographically smaller wins
    d = _docs(spark, ["xy pq", "xy pq"])
    merges = learn_bpe(d, n_merges=1, modulus=10)
    assert merges[0] == ("p", "q")


def test_encode_word_coverage_invariant():
    # any encoding concatenates back to word + </w>
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "</w>"): 2}
    for w in ["abc", "abcabc", "zzz", "a"]:
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + "</w>"


def test_encode_word_leftmost_lowest_rank():
    ranks = {("a", "b"): 0}
    assert encode_word("abab", ranks) == ["ab", "ab", "</w>"]


def test_bpe_encode_counts_and_first_pieces(spark):
    d = _docs(spark, ["the the the", "the cat"])
    merges = learn_bpe(d, n_merges=10, modulus=10)
    out = {r.doc_id: r for r in bpe_encode(d, merges).collect()}
    # 'the' occurs 4x in the sample -> fully merged to one token 'the</w>'
    assert out[0].n_words == 3
    assert out[0].first_pieces == "the</w>"
    assert out[0].n_bpe_tokens == 3
    # concat invariant holds through the Spark kernel too
    assert out[10].first_pieces.replace("|", "") == "the</w>"


def test_bpe_empty_text(spark):
    d = _docs(spark, ["", "word"])
    out = {r.doc_id: r for r in bpe_encode(d, learn_bpe(d, modulus=10)).collect()}
    assert out[0].n_words == 0 and out[0].n_bpe_tokens == 0
    assert out[0].first_pieces == ""


def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_semdedup_prunes_planted_near_dup(spark):
    rng = np.random.RandomState(7)
    base = [(i, rng.normal(size=8)) for i in range(40)]
    # plant: vec 100 is nearly identical to vec 5 -> same cluster, cos~1
    planted = base + [(100, base[5][1] + 1e-6)]
    df = _emb(spark, planted)
    from geoparser_spark.operators.similarity import ivf_fit_centroids

    cents = ivf_fit_centroids(df, n_lists=4, sample=64)
    out = {r.vec_id: r for r in
           semdedup_prune(df, cents, threshold=0.95).collect()}
    assert out[100].pruned == 1   # higher id pruned
    assert out[5].pruned == 0     # lower id kept
    assert out[100].ivf_list == out[5].ivf_list


def test_semdedup_no_cross_cluster_prune(spark):
    # two orthogonal tight groups: high cosine only within a group
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    rows = [(1, a), (2, a), (3, b), (4, b)]
    df = _emb(spark, rows)
    from geoparser_spark.operators.similarity import ivf_fit_centroids

    cents = ivf_fit_centroids(df, n_lists=2, sample=4)
    out = {r.vec_id: r.pruned for r in
           semdedup_prune(df, cents, threshold=0.99).collect()}
    assert out == {1: 0, 2: 1, 3: 0, 4: 1}
