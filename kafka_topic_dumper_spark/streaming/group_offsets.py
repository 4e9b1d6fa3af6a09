"""Consumer-group offset reset — reference operator B3.

The reference's hot-reload path rewrites an EXTERNAL consumer group's
committed offsets to the state record's end offsets, so consumers in
that group resume past everything the replay (re-)produced
(kafka_client.py:360-370, committing via ``_set_offsets``
kafka_client.py:158-166: seek + commit per partition).

This engine keeps the offsets in the state manifest (SURVEY §2.6 B3)
and performs the group commit as an OPTIONAL driver-side step: it is a
metadata-plane operation on a handful of partitions — never a Spark
job. The Kafka client is injected so the logic is unit-testable without
a broker, and the real client (kafka-python) is imported lazily —
absent in this container, present in a deployment.
"""

from __future__ import annotations

from collections.abc import Callable

# A committer takes (topic, {partition -> offset}) and durably commits
# those offsets for its consumer group.
Committer = Callable[[str, dict[int, int]], None]


def kafka_python_committer(bootstrap_servers: str, group_id: str) -> Committer:
    """Real-broker committer built on kafka-python (lazy import — the
    library is optional). Mirrors the reference's ``_set_offsets``:
    one blocking commit carrying every partition's target offset."""
    from kafka import KafkaConsumer, OffsetAndMetadata, TopicPartition

    def make_oam(offset: int) -> "OffsetAndMetadata":
        # kafka-python >= 2.1 widened OffsetAndMetadata to a 3-field
        # namedtuple (offset, metadata, leader_epoch) WITHOUT defaults;
        # older releases take (offset, metadata). Construct
        # version-tolerantly, preferring '' over None for metadata
        # (None round-trips as a null string in the commit protocol).
        try:
            return OffsetAndMetadata(int(offset), "", -1)
        except TypeError:
            return OffsetAndMetadata(int(offset), "")

    def commit(topic: str, offsets: dict[int, int]) -> None:
        consumer = KafkaConsumer(
            bootstrap_servers=bootstrap_servers,
            group_id=group_id,
            enable_auto_commit=False,
        )
        try:
            consumer.commit(
                {
                    TopicPartition(topic, int(p)): make_oam(o)
                    for p, o in offsets.items()
                }
            )
        finally:
            consumer.close()

    return commit


def fetch_end_offsets(bootstrap_servers: str, topic: str) -> dict[int, int]:
    """Current end offset per partition from a live broker (reference
    ``_get_offsets`` end side, kafka_client.py:122-142). Driver-side
    metadata call via kafka-python (lazy import)."""
    from kafka import KafkaConsumer, TopicPartition

    consumer = KafkaConsumer(bootstrap_servers=bootstrap_servers)
    try:
        parts = consumer.partitions_for_topic(topic)
        if not parts:
            raise RuntimeError(f"can not find partitions for topic {topic!r}")
        tps = [TopicPartition(topic, p) for p in sorted(parts)]
        ends = consumer.end_offsets(tps)
        return {tp.partition: int(off) for tp, off in ends.items()}
    finally:
        consumer.close()


def reset_group_to_state(
    state: dict | None, topic: str, committer: Committer
) -> dict[int, int]:
    """Commit the state record's offsets for a consumer group — the B3
    hot-reload contract: after this, group consumers resume at the
    snapshot taken BEFORE the replay produced, i.e. they will read
    exactly the replayed data. Raises when the state carries no usable
    offsets (reference 'Can not find offsets', kafka_client.py:137) —
    committing nothing silently would strand the group wherever it
    was. Returns the committed map (int keys)."""
    if not state or not state.get("offsets"):
        raise ValueError(
            f"state record for topic {topic!r} has no offsets to seek to"
        )
    offsets = {int(p): int(o) for p, o in state["offsets"].items()}
    committer(topic, offsets)
    return offsets
