"""Dump-state manifest — the engine's idempotency / "hot reload" record.

Reference behavior being re-expressed (SURVEY §2 S8/K4/P3/A2/B3):

- state record schema (kafka_client.py:312-317): ``{dump_id,
  topic_name, offsets: partition→end-offset, dump_date: unix seconds,
  transformer_id}``; JSON-encoded (kafka_client.py:325) onto a side
  Kafka topic (kafka_client.py:47) with a blocking single write
  (kafka_client.py:321-327).
- latest state = argmax by dump_date (kafka_client.py:343-344).
- hot-reload predicate: state exists ∧ topic ∧ dump_id ∧ transformer_id
  all match (kafka_client.py:349-358) ⇒ skip all data movement.

Here the manifest is a JSON-lines directory next to the dump data
(works on file:// and s3a:// alike); ``offsets`` is declared
``MapType(StringType, LongType)`` — fixing the reference's int→str key
asymmetry (kafka_client.py:310,366) by always using string keys on
disk and int keys in memory (plans.offsets.offsets_from_json).
"""

from __future__ import annotations

import time

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("dump_id", T.StringType(), False),
        T.StructField("topic_name", T.StringType(), False),
        T.StructField("offsets", T.MapType(T.StringType(), T.LongType()), False),
        T.StructField("dump_date", T.LongType(), False),
        T.StructField("transformer_id", T.StringType(), False),
        # sink identity (upgrade over the reference, whose sink is the
        # one fixed topic at kafka_client.py:47): without it, reloading
        # the same dump to a DIFFERENT destination hot-skips and the
        # new target silently receives nothing. Nullable so manifests
        # written before round 6 still parse (missing -> null -> "").
        T.StructField("sink_id", T.StringType(), True),
    ]
)


def gen_state(
    dump_id: str,
    topic_name: str,
    end_offsets: dict[int, int],
    transformer_id: str,
    dump_date: int | None = None,
    sink_id: str = "",
) -> dict:
    """Build a state record. Like the reference's ``_gen_state``
    (kafka_client.py:300-319) this snapshots the CURRENT end offsets
    BEFORE any data is re-produced, so a later hot reload seeks past
    everything this reload wrote."""
    return {
        "dump_id": dump_id,
        "topic_name": topic_name,
        "offsets": {str(p): int(o) for p, o in end_offsets.items()},
        "dump_date": int(time.time()) if dump_date is None else int(dump_date),
        "transformer_id": transformer_id,
        "sink_id": sink_id,
    }


def save_state(spark: SparkSession, state_root: str, state: dict) -> None:
    """Append one state record to the manifest (JSON lines). The write
    is a single-row job — the Spark analogue of the reference's
    blocking single produce (kafka_client.py:321-327)."""
    df = spark.createDataFrame([Row(**state)], schema=STATE_SCHEMA)
    df.coalesce(1).write.mode("append").json(state_root)


def read_latest_state(spark: SparkSession, state_root: str) -> dict | None:
    """Latest state record: argmax by (dump_date, dump_id) — reference
    A2 (kafka_client.py:343-344) with a deterministic tie-break the
    reference lacks. Returns None when no manifest exists yet.

    ``sink_id`` / ``transformer_id`` close the CONCURRENT-writer tie:
    reload_dump advances a superseding record's dump_date strictly
    past the current latest, which serialises same-second SERIAL
    reloads, but two writers that read the same latest both bump to
    latest+1 and re-tie on (dump_date, dump_id). Those records can
    only differ in sink/transformer identity, so ordering on them
    keeps the argmax deterministic (which record "wins" under true
    concurrency is inherently arbitrary — the guarantee here is that
    every reader picks the SAME one, so the hot-skip predicate is
    stable). Last-write-wins semantics proper still assume one writer
    per manifest at a time, as with the reference's state topic."""
    try:
        df = spark.read.schema(STATE_SCHEMA).json(state_root)
        df.schema  # force analysis so a missing path surfaces here
    except Exception as exc:
        # ONLY the no-manifest-yet case maps to None. A transient
        # storage/credential error must propagate: swallowing it made
        # state_matches() return False and the caller re-produce the
        # whole dump — the duplicate delivery the manifest exists to
        # prevent (code-review r6).
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise
    rows = (
        df.orderBy(
            F.col("dump_date").desc(),
            F.col("dump_id").desc(),
            F.col("sink_id").desc_nulls_last(),
            F.col("transformer_id").desc_nulls_last(),
        )
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    rec = rows[0].asDict(recursive=True)
    return rec


def state_matches(
    state: dict | None,
    topic_name: str,
    dump_id: str,
    transformer_id: str,
    sink_id: str = "",
) -> bool:
    """The hot-reload predicate P3 (kafka_client.py:349-358): a 4-way
    conjunction — state exists and topic/dump/transformer all equal —
    extended with sink identity (see STATE_SCHEMA) so a replay to a
    NEW destination is never skipped on the strength of an old one."""
    return (
        state is not None
        and state.get("topic_name") == topic_name
        and state.get("dump_id") == dump_id
        and state.get("transformer_id") == transformer_id
        and (state.get("sink_id") or "") == (sink_id or "")
    )
