"""Training-shard sink: materialize packed token sequences as the
fixed-shape files a training data-loader consumes.

The cells produced by ``operators/packing.py::tokenize_pack_ids`` are
one row per token; a trainer wants one ROW PER SEQUENCE with a
fixed-length ``array<bigint>`` of token ids, sharded into files that
each hold a CONTIGUOUS, internally-sorted seq_id range (recoverable
from parquet footer min/max stats — range-addressable like the
reference's zero-padded dump chunks, kafka_client.py:242-243, though
the range lives in the footer, not the file name).

Assembly is one ``groupBy(seq_id)`` over the cell stream
(map-side-combinable ``collect_list`` of (pos, id) structs, sorted
in-group by position — array_sort on the struct is JVM-side), then a
range-partitioned write so shard k holds a contiguous seq_id range.
Short final sequences are padded to ``seq_len`` with ``PAD_ID`` so
every row is fixed-shape. PAD_ID is -1, deliberately OUTSIDE the
vocabulary id range (0 = OOV/unk, 1..V = vocab): a loader building an
attention mask from ``token_ids != PAD_ID`` must never mask a real
trailing unk token (``n_real`` also records the boundary exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAD_ID = -1


def assemble_sequences(cells: DataFrame, seq_len: int) -> DataFrame:
    """(seq_id, token_ids array<bigint> of exactly seq_len, n_real) —
    one row per training sequence from the per-token cell stream."""
    packed = (
        cells.groupBy("seq_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos_in_seq", "token_id"))
            ).alias("cells"),
        )
        .select(
            "seq_id",
            F.transform(F.col("cells"), lambda c: c["token_id"]).alias("ids"),
            F.size("cells").cast("bigint").alias("n_real"),
        )
    )
    pad = F.transform(
        F.sequence(F.lit(1), F.lit(seq_len) - F.size("ids")),
        lambda _: F.lit(PAD_ID).cast("bigint"),
    )
    return packed.select(
        "seq_id",
        F.when(F.size("ids") < seq_len, F.concat("ids", pad))
        .otherwise(F.col("ids"))
        .alias("token_ids"),
        "n_real",
    )


def write_token_shards(
    cells: DataFrame, path: str, seq_len: int, n_shards: int = 16
) -> None:
    """Range-partition the assembled sequences by seq_id into
    ``n_shards`` contiguous shards, each written sorted so a loader
    streams sequences in order."""
    (
        assemble_sequences(cells, seq_len)
        .repartitionByRange(n_shards, "seq_id")
        .sortWithinPartitions("seq_id")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_token_shards(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
