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
