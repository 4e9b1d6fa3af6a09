"""Batch table access over the driver-generated parquet testdata.

Plain ``spark.read.parquet`` — schema comes from the footer, predicate
pushdown / column pruning / partition discovery are Catalyst's job, not
ours. At 100 TB the same call reads a partitioned s3a:// table root.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects by default; we read it as raw nanos (legacy conf, runtime-
    settable so it also works under an externally-created session) and
    truncate to a TIMESTAMP_NTZ(µs) column — the same truncation DuckDB
    applies, so oracle comparisons agree.

    The NTZ value is built by adding the epoch microseconds to the NTZ
    epoch literal — a timezone-independent construction.
    (``timestamp_micros()`` would yield TIMESTAMP_LTZ, and LTZ→NTZ
    casts render wall time in the SESSION timezone: under a non-UTC
    externally-created session every ts would shift.)
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
