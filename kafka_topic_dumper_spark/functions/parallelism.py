"""Scale-adaptive input spreading for CPU-heavy map stages.

The bytes-vs-work mismatch at the SCAN (r18, guide §2.5): Spark sizes
file splits by BYTES (maxPartitionBytes / openCostInBytes), so the
bench-scale parquet inputs — a few MB — arrive as ONE split, and every
CPU-heavy map stage above the plan's first Exchange (per-token md5
resurfacing, q-gram explode+hash, shingle hashing, the from-scratch
image/audio codecs inside mapInPandas) ran on ONE core of local[32].
Measured at sf0.1: editdist gram counts 5.9 → 1.1 s,
ngram_jaccard 2.2 → 1.3 s, decode_mjpeg 3.3 → 1.0 s,
decode_gif 2.5 → 0.9 s from this one fix.

:func:`spread_input` repartitions to core count ONLY when the input is
narrower than the machine. It is a no-op at deployment scale — a
100 TB corpus arrives in thousands of splits — and on inputs that are
already post-shuffle, so it never adds a corpus-scale shuffle where
parallelism already exists. Round-robin keys (no hash column needed);
all consumers are per-row transforms or key-shuffled aggregations, so
partition placement never reaches any result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it currently
    has fewer partitions than that (see module docstring)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
