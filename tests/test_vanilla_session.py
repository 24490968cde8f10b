"""Regression: every query path must work under a VANILLA SparkSession.

Round-1 driver failure: the `spark.sql.legacy.parquet.nanosAsLong`
workaround lived only in sparketl.session.get_spark, but the driver
constructs its own SparkSession with no sparketl configs and passes it
into ``queries()`` callables — so every events-based query died with
PARQUET_TYPE_ILLEGAL (TIMESTAMP(NANOS)).

The conf is runtime-settable, so we simulate the vanilla session by
UNSETTING it on the live session before each load: if load_table does
not restore it itself, the read fails exactly as it did for the driver.
"""

import pytest

from tests.conftest import SF_SMOKE

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _make_vanilla(spark):
    try:
        spark.conf.unset(NANOS_CONF)
    except Exception:
        pass


def test_load_events_self_sufficient(spark):
    from sparketl.io import load_table

    _make_vanilla(spark)
    df = load_table(spark, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


EVENTS_QUERIES = [
    "agg_02_value_counts",
    "agg_06_pivot",
    "ext_05_json_extract",
    "ext_05_from_json_struct",
    "ext_06_hourly_window",
    "ext_06_sessionize",
    "ext_07_asof_join",
    "ext_07_range_join",
    # round-3 driver failures: unix_micros(ts) on a TIMESTAMP_NTZ column
    # (modern readers ignore nanosAsLong and surface NTZ natively)
    "ext_25_gapfill",
    "ext_26_merge_intervals",
    "ext_30_top_paths",
    "ext_38_chisq",
    "ext_47_dow_entropy",
    # other unix_micros consumers, kept under the same guard
    "ext_11_rolling_7d",
    "ext_53_hopping_window",
    "ext_54_session_window",
    "ext_57_cumulative_users",
]


@pytest.mark.parametrize("qname", EVENTS_QUERIES)
def test_events_query_vanilla_session(spark, qname):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    if qname not in qs:
        pytest.skip(f"{qname} not registered")
    _make_vanilla(spark)
    df = qs[qname](spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_vanilla_session(spark):
    import __spark_entry__ as entry_mod

    _make_vanilla(spark)
    df = entry_mod.entry(spark)
    assert df.count() > 0
