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
from pyspark.sql import functions as F


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
    target_bytes_per_file: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet table into
    ``ceil(total_bytes / target)`` right-sized files PER PARTITION,
    preserving any hive-partitioned layout; returns
    (files_before, files_after).

    The 100 TB reality this serves: every micro-batch sink — the
    streaming dump chunker, the per-batch quarantining ingest dirs
    (``ingest_batch=<id>``), foreachBatch MERGE maintenance — produces
    files sized by BATCH cadence, not by read efficiency, and a table
    of 10k tiny files costs a scan 10k opens + footer reads and the
    scheduler 10k splits. Compaction is the standing maintenance op
    (Delta's OPTIMIZE, Iceberg's rewrite_data_files) expressed with
    stock Spark: read with partition discovery, repartition to the
    byte-sized target file count, rewrite WITH the same partitionBy
    (review r6: a flat rewrite of a partitioned table hides every
    compacted row from partition discovery the moment a writer adds
    the next ``key=value`` dir — confirmed empirically), then swap
    directories.

    Sizing is by on-disk BYTES (no extra count() job — the file
    listing already has sizes); compressed-size-in ≈ compressed-size-
    out is the standard OPTIMIZE approximation.

    Concurrency contract — READ BEFORE SCHEDULING: the swap is two
    renames, so (a) there is a brief window where ``path`` does not
    exist (readers retry; a crash in the window leaves the data intact
    in ``<path>._old`` for manual recovery), and (b) a WRITER
    committing files between compact's read and the swap loses those
    files. Compact only quiescent tables/partitions (e.g. batch dirs
    older than the running stream's horizon). True lost-nothing
    concurrent compaction needs a table format's transactional commit
    (Delta/Iceberg) — same read/repartition/write body, different
    publish step.
    """
    import math
    import os
    import shutil

    if "://" in path:
        # the swap is os.rename — a URI/object-store path would write
        # the tmp dir then crash mid-swap; table formats own that case
        raise ValueError(
            "compact() requires a local filesystem path (rename swap); "
            f"got {path!r} — use a table format's OPTIMIZE on object stores"
        )
    files = _parquet_files(path)
    files_before = len(files)
    if not files:
        return 0, 0  # nothing to compact (vacuumed/empty dir)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_files = max(1, math.ceil(total_bytes / max(1, target_bytes_per_file)))

    df = spark.read.parquet(path)
    # partition columns from segments BELOW the table root only — an
    # ancestor dir named "<datacol>=..." must not restructure the
    # table (review r6)
    rel_segs = {
        seg
        for f in files
        for seg in os.path.relpath(f, path).split(os.sep)[:-1]
    }
    part_cols = [
        c for c in df.columns if any(s.startswith(f"{c}=") for s in rel_segs)
    ]
    if part_cols:
        # hash on (partition cols + a deterministic row salt): hashing
        # on the partition cols alone collapses every partition value
        # into ONE task and one giant file (review r6). The salt is a
        # pure function of the data columns, so task retries are
        # deterministic (rand() here could duplicate/lose rows on
        # stage retry).
        data_cols = [c for c in df.columns if c not in part_cols]
        salted = df.withColumn(
            "_compact_salt",
            F.pmod(F.hash(*(data_cols or part_cols)), F.lit(n_files)),
        )
        out = salted.repartition(n_files, *part_cols, "_compact_salt").drop(
            "_compact_salt"
        )
    else:
        out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*(part_cols + sort_cols))
    elif part_cols:
        out = out.sortWithinPartitions(*part_cols)
    tmp = path.rstrip("/") + "._compacting"
    writer = out.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)

    # Publish gate (ADVICE r6): a short rewrite — the documented
    # concurrent-writer race, or a partially materialized tmp — must
    # never reach the swap, because the post-swap rmtree(old) would
    # make the loss unrecoverable. Both checks are metadata-plane
    # (parquet footer num_rows, no extra Spark job):
    #   1. the source listing is unchanged since the read (a writer
    #      that committed mid-rewrite would otherwise be dropped);
    #   2. the rewritten tree carries exactly the source's row count.
    # On violation the tmp dir is removed and the table is untouched.
    if sorted(_parquet_files(path)) != sorted(files):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact({path!r}) aborted: source files changed during the "
            "rewrite (concurrent writer) — table left untouched; compact "
            "only quiescent tables/partitions"
        )
    src_rows = _footer_rows(files)
    dst_rows = _footer_rows(_parquet_files(tmp))
    if src_rows != dst_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact({path!r}) aborted: rewritten tree has {dst_rows} rows "
            f"vs {src_rows} in the source — table left untouched"
        )

    old = path.rstrip("/") + "._old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return files_before, len(_parquet_files(path))


def _footer_rows(files: list[str]) -> int:
    """Total row count from parquet footers — metadata-only reads, no
    Spark job; the cheap invariant compact()'s publish gate compares."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _parquet_files(path: str) -> list[str]:
    import glob
    import os

    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
