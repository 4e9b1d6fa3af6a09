"""Timezone-independent truncation for TIMESTAMP_NTZ columns.

Spark's ``date_trunc`` takes TIMESTAMP (LTZ): applied to an NTZ
column it implicitly casts through the SESSION timezone, silently
shifting every wall time (and the result type) under a non-UTC
session — found by running the full oracle differential under
``spark.sql.session.timeZone=Pacific/Kiritimati`` (hourly rollup,
cohort weeks, and the gap-fill spine all moved by +14 h). The same
trap as the events loader's LTZ→NTZ cast (sources/tables.py, ADVICE
r5); these helpers are the truncation-shaped fix: pure integer
arithmetic against the NTZ epoch literal, so the result stays NTZ and
is bit-identical under ANY session timezone — matching DuckDB's
timezone-naive ``date_trunc`` exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def trunc_hour_ntz(col: str = "ts") -> Column:
    """``date_trunc('hour', ts)`` for NTZ, session-timezone-free."""
    return F.expr(
        f"timestampadd(HOUR, timestampdiff(HOUR, {_EPOCH}, {col}), {_EPOCH})"
    )


def trunc_week_ntz(col: str = "ts") -> Column:
    """``date_trunc('week', ts)`` (Monday origin, like both engines)
    for NTZ, session-timezone-free. 1970-01-01 was a Thursday, so
    ``(days_since_epoch + 3) % 7`` is the days-since-Monday offset."""
    d = f"timestampdiff(DAY, {_EPOCH}, {col})"
    return F.expr(f"timestampadd(DAY, {d} - pmod({d} + 3, 7), {_EPOCH})")
