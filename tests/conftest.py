"""Shared Spark session for the whole test run (JVM startup and
whole-stage-codegen warmup are expensive; one session amortizes them).
"""

from __future__ import annotations

import pytest

from geoparser_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="geoparser-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def gazetteer(spark):
    from geoparser_spark.testing.gazetteer import gazetteer_df

    return gazetteer_df(spark).cache()
