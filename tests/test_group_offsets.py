"""B3 consumer-group offset reset + CLI reload offset guards.

The committer is injected (no broker in this container); the real
kafka-python committer is exercised only by the opt-in broker harness
(test_kafka_integration.py). Reference parity: kafka_client.py:360-370
(group reset on hot reload) and 158-166 (seek+commit)."""

from __future__ import annotations

import pytest

from kafka_topic_dumper_spark.streaming.group_offsets import reset_group_to_state


class FakeCommitter:
    def __init__(self):
        self.calls: list[tuple[str, dict[int, int]]] = []

    def __call__(self, topic: str, offsets: dict[int, int]) -> None:
        self.calls.append((topic, offsets))


def test_reset_group_commits_state_offsets():
    state = {
        "dump_id": "20260813000001",
        "topic_name": "test",
        "offsets": {"0": 400, "1": 400, "2": 399},
        "dump_date": 1765000000,
        "transformer_id": "Identity",
    }
    committer = FakeCommitter()
    committed = reset_group_to_state(state, "test", committer)
    # the committed map must be EXACTLY the state snapshot, with int
    # partition keys (manifest stores string keys on disk)
    assert committed == {0: 400, 1: 400, 2: 399}
    assert committer.calls == [("test", {0: 400, 1: 400, 2: 399})]


def test_reset_group_refuses_empty_offsets():
    committer = FakeCommitter()
    with pytest.raises(ValueError):
        reset_group_to_state(None, "test", committer)
    with pytest.raises(ValueError):
        reset_group_to_state({"offsets": {}}, "test", committer)
    assert committer.calls == []


def test_produce_test_messages_with_injected_producer():
    """The load-generator port (reference utils/kafka_producer.py:17-33)
    sends value-only zero-padded messages and flushes once."""
    from kafka_topic_dumper_spark.sources.kafka import produce_test_messages

    class FakeProducer:
        def __init__(self):
            self.sent: list[tuple[str, bytes]] = []
            self.flushes = 0
            self.closed = False

        def send(self, topic, value):
            self.sent.append((topic, value))

        def flush(self):
            self.flushes += 1

        def close(self):
            self.closed = True

    fake = FakeProducer()
    assert produce_test_messages("ignored:9092", "t", 5, lambda: fake) == 5
    assert len(fake.sent) == 5
    assert fake.sent[3] == ("t", b"This is a dummy test message 000000000000003")
    assert fake.flushes == 1 and fake.closed


def test_cli_dump_reload_e2e_and_group_guard(spark, tmp_path, monkeypatch):
    """Drive the full CLI: generate archive → dump → reload, then the
    reload guards: --group without --bootstrap-servers is an error, and
    reload with no offset source (no archive, no broker) must refuse to
    write a state record rather than snapshot empty offsets."""
    from kafka_topic_dumper_spark import cli

    # cli builds its own session via getOrCreate — reuses the test one
    archive = str(tmp_path / "archive.parquet")
    dumps = str(tmp_path / "dumps")
    sink = str(tmp_path / "produced")

    assert cli.main(
        ["generate", "--records-parquet", archive, "-t", "test", "-n", "120",
         "--partitions", "3"]
    ) == 0
    assert cli.main(
        ["dump", "--records-parquet", archive, "-t", "test", "-n", "60",
         "--output", dumps, "-p", "20260813099999"]
    ) == 0
    assert cli.main(
        ["reload", "--records-parquet", archive, "-t", "test",
         "--output", dumps, "--reload-output", sink]
    ) == 0
    assert spark.read.parquet(sink).count() == 60

    # offsets in the archive: 120 ids / 3 partitions, integer division
    # (exactness guard) → end offset 40 per partition
    from kafka_topic_dumper_spark.streaming import state as state_mod

    st = state_mod.read_latest_state(spark, dumps + "/_state")
    assert st["offsets"] == {"0": 40, "1": 40, "2": 40}

    # --group without a broker connection is a hard error, validated
    # UP FRONT: the replay must NOT run first (a half-applied B3 would
    # have appended another 60 rows to the sink before exiting 2)
    assert cli.main(
        ["reload", "--records-parquet", archive, "-t", "test",
         "--output", dumps, "--reload-output", sink, "--group", "g1"]
    ) == 2
    assert spark.read.parquet(sink).count() == 60

    # no archive and no broker: refuse rather than write empty offsets
    assert cli.main(
        ["reload", "-t", "test", "--output", dumps, "--reload-output", sink]
    ) == 2
