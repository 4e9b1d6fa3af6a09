"""Schema-drift tripwire for the ``events`` table.

Round 4 was lost to a silent driver-side testdata change: ``events.ts``
drifted from parquet TIMESTAMP(NANOS) to ``timestamp[us]`` and the
unconditional nanos→µs conversion in ``sources/tables.py`` broke 28 of
93 registry queries, the entry smoke, and the bench — all through one
line.  This test pins the contract in ONE named place: whatever the
parquet footer says, ``load_table(..., "events")`` must yield a
TIMESTAMP_NTZ(µs) ``ts`` with stable wall-clock values.

If this test fails, fix ``kafka_topic_dumper_spark/sources/tables.py``
(``load_table``'s events branch) — nothing else.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import types as T

from kafka_topic_dumper_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_events_ts_is_ntz_micros(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    ts_type = ev.schema["ts"].dataType
    assert isinstance(ts_type, T.TimestampNTZType), (
        f"events.ts loaded as {ts_type}, expected TIMESTAMP_NTZ(us). "
        "The testdata footer likely drifted again — fix the dtype branch in "
        "kafka_topic_dumper_spark/sources/tables.py::load_table, not the callers."
    )


def test_events_ts_values_match_duckdb(spark):
    """Wall-clock values must agree with DuckDB's read of the same file —
    the oracle comparisons for all 28 events-reading queries ride on this."""
    ev = load_table(spark, SF_SMOKE, "events")
    row = ev.orderBy("event_id").select("event_id", "ts").first()
    want = duckdb.sql(
        "SELECT event_id, ts FROM "
        f"'{SF_SMOKE}/events.parquet' ORDER BY event_id LIMIT 1"
    ).fetchone()
    assert row["event_id"] == want[0]
    got_ts = row["ts"]
    want_ts = want[1]
    if isinstance(want_ts, datetime.datetime) and want_ts.tzinfo is not None:
        want_ts = want_ts.replace(tzinfo=None)
    assert got_ts == want_ts, (
        f"events.ts wall-clock mismatch vs DuckDB: spark={got_ts!r} "
        f"duckdb={want_ts!r} — timezone or unit handling broke in "
        "tables.py::load_table."
    )


def test_events_ltz_branch_is_timezone_independent(spark, tmp_path):
    """The TimestampType (LTZ) branch must rebuild NTZ from the stored
    instant, not via a bare cast: a cast renders wall time in the
    SESSION timezone, so an externally-created non-UTC session would
    silently shift every ts (ADVICE r5, medium).  We synthesize an
    events.parquet whose footer is isAdjustedToUTC µs (Spark's default
    TimestampType write) and assert identical wall-clock values under
    a UTC and a UTC+14 session."""
    src = tmp_path / "tzcase"
    src.mkdir()
    spark.sql(
        "SELECT 1 AS event_id, timestamp'2024-03-01 12:34:56.789' AS ts"
    ).write.parquet(str(src / "events.parquet"))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_row = load_table(spark, str(src), "events").first()["ts"]
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        far_row = load_table(spark, str(src), "events").first()["ts"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert utc_row == far_row, (
        f"LTZ→NTZ normalization is session-timezone-dependent: "
        f"UTC={utc_row!r} vs UTC+14={far_row!r} — tables.py must use the "
        "unix_micros() construction, not a bare cast."
    )
    want = duckdb.sql(
        f"SELECT ts FROM '{src}/events.parquet/*.parquet'"
    ).fetchone()[0]
    if isinstance(want, datetime.datetime) and want.tzinfo is not None:
        want = want.replace(tzinfo=None)
    assert utc_row == want


def test_events_load_is_pushdown_friendly(spark):
    """The normalization must not block column pruning: selecting two
    columns should read only those from parquet."""
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "event_type" not in read_schema and "props" not in read_schema, (
        f"column pruning lost through load_table normalization: {read_schema}"
    )
