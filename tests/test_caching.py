"""Tracked-persist lifecycle: operators register internal persists,
release_persisted() frees them (ADVICE r1: bare persist() leaked cached
partitions across invocations in long-lived sessions)."""

from __future__ import annotations

from kafka_topic_dumper_spark.functions.caching import (
    operator_caches,
    release_persisted,
    tracked_persist,
)
from kafka_topic_dumper_spark.operators import dedup
from kafka_topic_dumper_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_tracked_persist_round_trip(spark):
    df = tracked_persist(spark.range(10))
    assert df.count() == 10
    assert df.storageLevel.useMemory
    assert release_persisted() >= 1
    assert not df.storageLevel.useMemory
    assert release_persisted() == 0


def test_operator_caches_scope_releases_only_inner(spark):
    outer = tracked_persist(spark.range(5))
    with operator_caches():
        inner = tracked_persist(spark.range(7))
        assert inner.count() == 7
        assert inner.storageLevel.useMemory
    # the scope released exactly what was registered inside it
    assert not inner.storageLevel.useMemory
    assert outer.storageLevel.useMemory
    assert release_persisted() == 1
    assert not outer.storageLevel.useMemory


def test_operator_caches_releases_on_error(spark):
    try:
        with operator_caches():
            df = tracked_persist(spark.range(3))
            df.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not df.storageLevel.useMemory
    assert release_persisted() == 0


def test_operator_persists_are_released(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    dedup.minhash_lsh_dedup(docs).count()
    n = release_persisted()
    assert n >= 1
    # nothing left pinned in the cache manager by this operator
    assert release_persisted() == 0
