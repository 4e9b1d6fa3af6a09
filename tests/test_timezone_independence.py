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
