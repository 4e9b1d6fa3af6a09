"""Oracle-gated registry rows for the STREAMING operators.

The streaming twins (streaming/windows.py, streaming/stateful.py) are
pytest-proven against their batch equivalents, but until round 6 none
had a driver correctness row (r5 verdict item 5). This module batchifies
one real streaming query — file source → watermarked event-time agg →
memory sink, Trigger.AvailableNow — into the ``queries()`` contract so
the driver differentially verifies streaming SEMANTICS, not just the
batch plans. The pattern is the same bounded-drain shape the reference's
dump loop uses (kafka_client.py:168-176): drain everything available,
then stop.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_topic_dumper_spark.sources.tables import load_table

# One materialized stream-input directory per (process, sf_dir) — same
# rationale as the stored-index cache in operators/similarity.py: the
# bench and driver invoke a query callable many times per process.
_STREAM_INPUT_CACHE: dict = {}
_SINK_SEQ = itertools.count()

# Every document gets a deterministic event time inside ONE wall-clock
# hour; the marker row sits hours later so the watermark (2 h default)
# passes every document window, while the marker's own window never
# finalizes and is dropped by append mode — the same advancing-marker
# scheme tests/test_streaming_windows.py established.
_DOC_TS = "timestampadd(MINUTE, CAST(doc_id % 60 AS INT), TIMESTAMP_NTZ '2024-01-01 00:00:00')"
_MARKER_ID = 10**9


def _lm_stream_input(spark: SparkSession, sf_dir: str) -> str:
    key = ("lm_docs", sf_dir)
    if key not in _STREAM_INPUT_CACHE:
        import atexit
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="stream_input_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = f"{root}/docs"
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", F.expr(_DOC_TS).alias("ts")
        )
        marker = spark.sql(
            f"SELECT CAST({_MARKER_ID} AS BIGINT) AS doc_id,"
            " 'watermark advance marker' AS text,"
            " TIMESTAMP_NTZ '2024-01-01 12:00:00' AS ts"
        )
        docs.union(marker).coalesce(1).write.parquet(path)
        _STREAM_INPUT_CACHE[key] = path
    return _STREAM_INPUT_CACHE[key]


def register(reg) -> None:
    from kafka_topic_dumper_spark.operators.text import (
        bigram_lm_model,
        bigram_lm_oracle_ctes,
    )
    from kafka_topic_dumper_spark.streaming.windows import (
        score_stream_against_model,
    )

    # The model is trained on the same corpus the stream replays, so the
    # streaming scorer's left-join add-one fallbacks reduce to the batch
    # inner-join formula — the batch LM CTE chain IS the oracle. The
    # window_start column is deliberately dropped: hour-window alignment
    # under a non-UTC harness session is a presentation detail, while
    # (doc_id, n_bigrams, bits_per_bigram) is session-independent.
    @reg(
        "streaming_lm_quality",
        f"""
        WITH {bigram_lm_oracle_ctes("documents")}
        SELECT doc_id, n_bigrams, bits_per_bigram FROM lmq
        """,
    )
    def streaming_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The documents table replayed through a REAL streaming query:
        file stream → bigram scoring against the historical-corpus LM →
        event-time window agg with watermark → memory sink, drained
        with Trigger.AvailableNow. Proves watermark finalization,
        append-mode exactly-once emission, and the stream-static model
        join against the batch oracle."""
        pair_counts, ctx_counts, vocab = bigram_lm_model(
            load_table(spark, sf_dir, "documents")
        )
        v = int(vocab.collect()[0]["v"])
        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp_ntz"
        ).parquet(_lm_stream_input(spark, sf_dir))
        name = f"streaming_lm_quality_sink_{next(_SINK_SEQ)}"
        q = (
            score_stream_against_model(stream, pair_counts, ctx_counts, v)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.table(name).select("doc_id", "n_bigrams", "bits_per_bigram")
