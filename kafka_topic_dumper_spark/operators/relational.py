"""Relational analogues of the reference's metadata-plane operators.

The reference (Cobliteam/kafka-topic-dumper) computes these with Python
loops over dicts; here each is a declarative DataFrame op so Catalyst
plans it (partial aggregation, pushdown, AQE) and it scales to arbitrary
partition counts. Reference citations are on each function.

All helpers take and return DataFrames; none collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """ARGMAX per key: the reference's latest-state-record pattern
    (``kafka_client.py:343-344`` — ``max(messages, key=dump_date)``),
    generalized per-key.

    Implemented as a rank-1 window, which Spark executes as a single
    shuffle on ``key_cols`` + in-partition sort — no driver-side
    materialization. ``order_cols`` must be a total order (add a unique
    id as tie-break) for deterministic output.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def tail_k_per_partition(
    df: DataFrame, part_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Top-K-by-offset per partition — the relational form of the
    reference's tail-N seek (``kafka_client.py:144-156``:
    ``start = max(begin, end - ceil(N/P))``). Emits a ``tail_rank``
    column (1 = newest)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("tail_rank", F.row_number().over(w)).filter(
        F.col("tail_rank") <= k
    )


def clamped_start_offsets(
    df: DataFrame, part_col: str, offset_col: str, displacement: int
) -> DataFrame:
    """Per-partition ``greatest(beginning, end - displacement)`` — the
    reference's offset clamp (``kafka_client.py:152-153``) as one
    partial-aggregatable groupBy. ``end_offset`` is the EXCLUSIVE
    log-end offset (max existing + 1), Kafka's convention and the
    reference's: with an inclusive end the reported
    ``available_messages`` undercounted the rows an inclusive-start
    consumer actually replays by one (code-review r6)."""
    end = F.max(offset_col) + F.lit(1)
    start = F.greatest(F.min(offset_col), end - F.lit(displacement))
    return df.groupBy(part_col).agg(
        F.min(offset_col).alias("beginning_offset"),
        end.alias("end_offset"),
        start.alias("start_offset"),
        (end - start).alias("available_messages"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-mitigating equi-join: the big side gets a deterministic salt
    (hash of its whole key-row spread over ``n_salts``), the small side
    is replicated ×``n_salts``, and the join key becomes
    (key, salt) — a single hot key now lands on ``n_salts`` reducers
    instead of one. Semantically identical to ``big.join(small, key)``
    (the differential oracle for ``join_salted_skew`` is the PLAIN
    join). Use when AQE's skew-join split isn't available or the skew
    is in a single key beyond what splitting a partition fixes.

    The big-side salt is derived from the ROW POSITION
    (monotonically_increasing_id), not a content hash: a hot key whose
    rows are byte-identical would all hash to ONE salt, putting the
    whole hot partition back on a single reducer while still paying
    the small-side replication (code-review r6). Position-derived
    salts spread identical rows round-robin; the output row SET is
    invariant to salt choice (each big row joins the one replicated
    small copy with its salt), which is what the plain-join oracle
    checks.
    """
    salt_small = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt_s")
            )
        )
    )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    return (
        salted_big.join(
            salt_small,
            (F.col(big_key) == F.col(small_key))
            & (F.col("_salt") == F.col("_salt_s")),
        )
        .drop("_salt", "_salt_s")
    )


def chunk_plan(df: DataFrame, order_col: Column, chunk_size: int) -> DataFrame:
    """The reference's fixed-size file chunking (``kafka_client.py:238-255``)
    as a plan: assign each row a ``chunk_id`` by global order and
    summarize per chunk.

    NOTE: the global ``row_number`` needs a single-partition window —
    correct but serial. The production dump pipeline never does this; it
    uses ``maxRecordsPerFile`` (see ``streaming/dump.py``) so chunking
    is per-task and parallel. This operator exists as the *queryable*
    form of the plan for catalog/debug use at small N.
    """
    w = Window.orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "chunk_id", ((F.col("__rn") - 1) / F.lit(chunk_size)).cast("bigint")
        )
        .groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(order_col).alias("start_key"),
            F.max(order_col).alias("end_key"),
        )
    )
