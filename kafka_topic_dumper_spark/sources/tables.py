"""Batch table access over the driver-generated parquet testdata.

Plain ``spark.read.parquet`` — schema comes from the footer, predicate
pushdown / column pruning / partition discovery are Catalyst's job, not
ours. At 100 TB the same call reads a partitioned s3a:// table root.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. ``name`` must be in :data:`TABLES`.

    ``events.ts`` has drifted across testdata generations: parquet
    TIMESTAMP(NANOS) in some, ``timestamp[us]`` in others. We normalize
    to TIMESTAMP_NTZ(µs) regardless of what the footer says, branching
    on the dtype Spark actually read:

    - ``TimestampNTZType`` — already what we want; pass through.
    - ``TimestampType`` (LTZ) — rebuild NTZ from the stored instant:
      ``unix_micros(ts)`` extracts the parquet µs value regardless of
      session timezone, then we add it to the NTZ epoch literal.  (A
      bare LTZ→NTZ *cast* renders wall time in the SESSION timezone,
      so under a non-UTC externally-created session every ts would
      shift — this construction matches DuckDB's timezone-independent
      read of isAdjustedToUTC µs footers.)
    - ``LongType`` — raw nanos under the legacy ``nanosAsLong`` conf;
      truncate to µs and add to the NTZ epoch literal — the same
      timezone-independent construction.

    A TIMESTAMP(NANOS) footer makes the plain read raise before we can
    inspect the dtype, so on failure we retry once under the legacy
    conf (runtime-settable, so this also works under an externally-
    created session).
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        path = os.path.join(sf_dir, "events.parquet")
        try:
            df = spark.read.parquet(path)
            df.schema  # force analysis so a nanos footer fails here
        except Exception as exc:
            # ONLY the TIMESTAMP(NANOS) footer maps to the legacy-read
            # retry; a missing/corrupt file must surface as itself, and
            # must not flip the session-wide nanosAsLong conf as a side
            # effect (code-review r6). The conf deliberately stays set
            # after a genuine nanos retry: it only affects nanos
            # columns, which this engine always wants read as longs.
            if "NANOS" not in str(exc):
                raise
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.TimestampNTZType):
            return df
        if isinstance(ts_type, T.TimestampType):
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts),"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        if isinstance(ts_type, T.LongType):
            return df.withColumn(
                "ts",
                F.expr(
                    # floor-division form: bare `div` truncates toward
                    # zero, shifting PRE-epoch nanos forward 1 µs
                    "timestampadd(MICROSECOND,"
                    " (ts - ((ts % 1000) + 1000) % 1000) div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        raise TypeError(
            f"events.ts read as unexpected dtype {ts_type}; "
            "expected timestamp_ntz, timestamp, or raw-nanos long"
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
