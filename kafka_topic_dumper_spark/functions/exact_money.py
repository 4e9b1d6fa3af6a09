"""Partition-order-exact money arithmetic.

Sums of price×discount products are 4-decimal true values; a float sum
can land exactly on a round(x, 2) boundary, where (a) the value itself
depends on shuffle/partition order and (b) Spark and DuckDB round the
same double differently (shortest-decimal-repr HALF_UP vs binary
value). Aggregating in integer cents / basis points and dividing by
the scale WITHOUT rounding is bit-identical in every engine under any
partition layout. The inputs must be exact 2-decimal values (true for
all testdata money columns); at ~10^8 rows per group the 3-factor
product sum approaches int64 — move to DECIMAL(38) aggregation there.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """2-decimal price → integer cents."""
    return F.round(col * 100, 0).cast("bigint")


def pct_units(col: Column) -> Column:
    """2-decimal rate (e.g. 1-discount, 1+tax) → integer percent units."""
    return F.round(col * 100, 0).cast("bigint")
