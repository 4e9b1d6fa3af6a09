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

# Truncation is a FLOOR, not a round-toward-zero (ADVICE r6): the
# earlier timestampdiff(HOUR/DAY, ...) forms truncated the interval
# toward zero, so pre-1970 timestamps rounded UP to the next boundary
# while DuckDB's date_trunc floors. The µs-exact diff below never
# truncates (every NTZ value is whole microseconds), and
# ``x - pmod(x, unit)`` floors to the boundary for negative x too —
# both helpers now match DuckDB's date_trunc over the full NTZ range.
_US_HOUR = 3_600_000_000
_US_DAY = 86_400_000_000


def trunc_hour_ntz(col: str = "ts") -> Column:
    """``date_trunc('hour', ts)`` for NTZ, session-timezone-free and
    floor-correct on both sides of the epoch."""
    us = f"timestampdiff(MICROSECOND, {_EPOCH}, {col})"
    return F.expr(
        f"timestampadd(MICROSECOND, {us} - pmod({us}, {_US_HOUR}), {_EPOCH})"
    )


def trunc_week_ntz(col: str = "ts") -> Column:
    """``date_trunc('week', ts)`` (Monday origin, like both engines)
    for NTZ, session-timezone-free and floor-correct on both sides of
    the epoch. 1970-01-01 was a Thursday, so shifting by 3 days makes
    the modulus Monday-anchored (1969-12-29 was a Monday)."""
    us = f"timestampdiff(MICROSECOND, {_EPOCH}, {col})"
    return F.expr(
        f"timestampadd(MICROSECOND,"
        f" {us} - pmod({us} + {3 * _US_DAY}, {7 * _US_DAY}), {_EPOCH})"
    )
