"""Session-timezone independence: every timestamp-bearing query must
produce identical results under a hostile session timezone — Spark's
date_trunc/unix_timestamp family silently casts NTZ through the
SESSION zone (the +14 h Pacific/Kiritimati shift found three real
bugs: hourly rollup, cohort weeks, gap-fill spine; fixed via
functions/ntz_time.py). This test re-runs the timestamp-heavy rows
under that zone against their DuckDB oracles."""

from __future__ import annotations

import math

import pytest

from kafka_topic_dumper_spark import registry
from tests.conftest import SF_CORRECTNESS

TZ_SENSITIVE = [
    "events_hourly_rollup",
    "cohort_retention",
    "timeseries_gap_fill",
    "f_scalar_surface",
    "a1_latest_dump_id",
    "window_rolling_hour",
    "sessionize_events",
    "layout_zorder_events",
    "layout_hilbert_events",
    "asof_join_tolerance",
    "stats_rolling_anomaly",
    "stats_cusum_changepoints",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_matches_oracle_under_hostile_timezone(spark, duck, name):
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        sdf = registry.QUERIES[name](spark, SF_CORRECTNESS)
        srows = sorted(tuple(_norm(v) for v in r) for r in sdf.collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    rel = duck.sql(registry.ORACLES[name])
    drows = sorted(tuple(_norm(v) for v in r) for r in rel.fetchall())
    assert sdf.columns == rel.columns, name
    assert srows == drows, f"{name}: session-timezone-dependent result"


def test_ntz_truncation_floors_pre_epoch(spark, duck):
    """ADVICE r6: pre-1970 NTZ values must truncate DOWNWARD (DuckDB's
    flooring date_trunc), not toward zero — and identically under a
    hostile session timezone."""
    from pyspark.sql import functions as F

    from kafka_topic_dumper_spark.functions.ntz_time import (
        trunc_hour_ntz,
        trunc_week_ntz,
    )

    vals = [
        "1969-12-31 13:27:45.123456",
        "1969-12-29 00:00:00",
        "1969-12-28 23:59:59.999999",
        "1970-01-01 00:00:00",
        "1969-07-20 20:17:40",
        "2024-06-15 17:45:12.5",
    ]
    want = {
        v: tuple(
            str(x)
            for x in duck.sql(
                f"SELECT date_trunc('hour', TIMESTAMP '{v}'),"
                f" CAST(date_trunc('week', TIMESTAMP '{v}') AS TIMESTAMP)"
            ).fetchone()
        )
        for v in vals
    }
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "Pacific/Kiritimati"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.createDataFrame([(v,) for v in vals], "s string").withColumn(
                "ts", F.col("s").cast("timestamp_ntz")
            )
            got = {
                r.s: (str(r.h), str(r.w))
                for r in df.select(
                    "s",
                    trunc_hour_ntz("ts").alias("h"),
                    trunc_week_ntz("ts").alias("w"),
                ).collect()
            }
            assert got == want, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
