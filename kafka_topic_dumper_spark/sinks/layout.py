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


def compact(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(n_rows / target)`` right-sized files; returns
    (files_before, files_after).

    The 100 TB reality this serves: every micro-batch sink — the
    streaming dump chunker, the per-batch quarantining ingest dirs
    (``ingest_batch=<id>``), foreachBatch MERGE maintenance — produces
    files sized by BATCH cadence, not by read efficiency, and a table
    of 10k tiny files costs a scan 10k opens + footer reads and the
    scheduler 10k splits. Compaction is the standing maintenance op
    (Delta's OPTIMIZE, Iceberg's rewrite_data_files) expressed with
    stock Spark: read, one round-robin repartition to the target file
    count (plus an optional sort for row-group skipping), and an
    ATOMIC swap via a temp directory + rename so readers never observe
    a half-compacted table. The rename swap assumes a posix filesystem
    (local/NFS/HDFS-with-rename); object stores have no atomic rename —
    there the swap is a table-format commit (Delta/Iceberg pointer
    flip), same read/repartition/write body.

    Plan shape: one read + one exchange + one write — no driver-side
    row handling; the file COUNT is the only thing collected.
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    n_rows = df.count()
    files_before = len(
        [f for f in _parquet_files(path)]
    )
    n_files = max(1, math.ceil(n_rows / max(1, target_rows_per_file)))
    tmp = path.rstrip("/") + "._compacting"
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = len([f for f in _parquet_files(path)])
    return files_before, files_after


def _parquet_files(path: str) -> list[str]:
    import glob
    import os

    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
