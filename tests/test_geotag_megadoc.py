"""Mention-dense mega-doc stress for the longest-match window sweep.

One gazetteer-dense document with tens of thousands of mentions used to
cost O(m²) comparisons in a single task under the collected-array
shadow filter (10^5 mentions → 10^10 comparisons).  The range-frame
window form is O(m · MAX_NGRAM · dup) — this fixture pins both the
SEMANTICS (longest-match counts on a crafted repeat pattern, checked
against closed-form expectations) and the BOUNDED task cost (a 24k-
mention doc must clear in seconds, where the quadratic form took
minutes)."""

from __future__ import annotations

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from geoparser_spark.operators.geotag import (
    build_surface_forms,
    candidate_mentions,
)
from geoparser_spark.testing.gazetteer import gazetteer_df


def _cands(spark, text):
    texts = spark.createDataFrame([Row(doc_id=1, text=text)])
    surf = build_surface_forms(gazetteer_df(spark))
    return candidate_mentions(texts, surf)


def test_longest_match_on_repeat_pattern(spark):
    """'united states of america' x R: each repetition is ONE 4-gram
    span ('united states of america' is a US alternatename); the
    contained 'united states' 2-gram at the same pos is dropped, and no
    other fixture surface fires inside the phrase."""
    R = 50
    out = _cands(spark, "United States of America " * R)
    rows = out.select("pos", "n", "gram").collect()
    assert len(rows) == R
    assert all(r.n == 4 and r.gram == "united states of america"
               for r in rows)
    assert sorted(r.pos for r in rows) == [4 * i for i in range(R)]


def test_longest_match_dense_megadoc_bounded(spark):
    """24k mentions in ONE doc: 'pasadena texas' repeats — both
    1-grams survive (no 2-gram 'pasadena texas' surface in the
    fixtures), each with 2 gazetteer candidates (US/CO and US/MX
    ambiguity pairs), so spans = 2·R and candidate rows = 4·R.  The
    quadratic shadow filter did m²/2 ≈ 3·10^8 struct comparisons here;
    the window sweep must stay well inside a CI-friendly wall budget."""
    R = 12_000
    t0 = time.monotonic()
    out = _cands(spark, "Pasadena Texas " * R)
    got = (out.groupBy("pos", "n")
           .count()
           .agg(F.count("*").alias("n_spans"),
                F.sum("count").alias("n_cands"))
           .collect()[0])
    wall = time.monotonic() - t0
    assert got.n_spans == 2 * R
    assert got.n_cands == 4 * R
    assert wall < 60, f"mega-doc longest-match took {wall:.1f}s"


def test_unigram_only_max_n_1(spark):
    """max_n=1 has no before-frame (rangeBetween(0,-1) would be an
    invalid window); unigram matches must still come through."""
    from pyspark.sql import Row
    from geoparser_spark.operators.geotag import build_surface_forms

    texts = spark.createDataFrame([Row(doc_id=1, text="Texas and Texas")])
    surf = build_surface_forms(gazetteer_df(spark), max_tokens=1)
    out = candidate_mentions(texts, surf, max_n=1).collect()
    assert sorted({r.pos for r in out}) == [0, 2]
    assert all(r.n == 1 for r in out)
