"""Table-layout sink: the write-side half of the 100 TB story.

Every scan-side optimization the engine leans on — partition pruning,
parquet row-group min/max skipping, co-located joins — is only
available if the WRITER laid the data out for it. This module owns
that layout contract:

- hive-style ``partitionBy`` on low-cardinality columns ⇒ the reader's
  partition filters prune whole directories before any I/O
  (``PartitionFilters`` in the scan node);
- ``repartition`` on the partition columns first ⇒ one task owns one
  partition value, so a P-valued column yields ~P files instead of
  tasks × P small files (the classic small-file explosion);
- ``sortWithinPartitions`` on the range-queried columns ⇒ parquet
  row-group min/max statistics become selective, so range predicates
  skip row groups inside each file;
- ``maxRecordsPerFile`` bounds file size for parallel downstream reads
  (same knob as the dump chunker, streaming/dump.py).

The reference has exactly one layout: flat zero-padded parquet parts
under a dump prefix (kafka_client.py:178-181, 280-298). This is its
generalization to analytics tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_layout(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``, clustered
    so each partition value is produced by one task, sorted within
    files on ``sort_cols`` for row-group skipping."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    out = df.repartition(*partition_cols)
    if sort_cols:
        # the partitioned-file writer requires rows sorted by the
        # partition columns within each task and will inject its own
        # (order-destroying) sort if they aren't — so sort by
        # (partition_cols, sort_cols) in ONE pass: the writer's
        # requirement is then already satisfied and the secondary
        # order survives into the files
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_layout(spark: SparkSession, path: str) -> DataFrame:
    """Read a layout-written table; partition columns come back via
    partition discovery and filters on them prune directories."""
    return spark.read.parquet(path)
