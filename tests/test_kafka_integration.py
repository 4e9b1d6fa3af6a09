"""Opt-in live-broker integration tests (`pytest -m kafka`).

Needs the compose harness (`docker compose up -d`) and kafka-python;
auto-skips otherwise. This suite is where ``sources/kafka.py``'s option
builders and the B3 committer meet a real broker: reference
test_kafka_client.py:7-14 + CircleCI harness (.circleci/config.yml:8-24)
parity.

ENVIRONMENTAL BLOCKER, verified 2026-08-13 (round 5), re-verified
2026-08-16 (rounds 14 and 15: `which dockerd` empty, no
/var/run/docker.sock): the build container ships only a
docker CLI shim — there is NO dockerd binary, no /var/run/docker.sock,
no systemd to start one, no compose plugin, and package installs are
disallowed, so the compose harness cannot run here at all. Nor is kafka-python installed. CI in this container
therefore exercises the broker-less twins instead
(test_group_offsets.py, test_dump_reload.py: same planner/committer
code against an injected fake); run THIS suite on any host with a real
docker daemon via the checked-in docker-compose.yaml.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")


def _broker_reachable() -> bool:
    host, _, port = BOOTSTRAP.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=1):
            return True
    except OSError:
        return False


try:
    import kafka  # noqa: F401

    _HAVE_CLIENT = True
except ImportError:
    _HAVE_CLIENT = False

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(
        not (_HAVE_CLIENT and _broker_reachable()),
        reason=f"no kafka-python or no broker at {BOOTSTRAP}",
    ),
]


@pytest.fixture()
def topic():
    return f"ktds-it-{uuid.uuid4().hex[:8]}"


def test_produce_fetch_offsets_plan_and_group_reset(topic):
    """End-to-end metadata-plane parity against a real broker: produce
    the reference generator's messages, fetch end offsets, plan a
    tail-N dump from them, commit the plan's snapshot to a consumer
    group (B3), and read the committed offsets back."""
    from kafka import KafkaConsumer, TopicPartition

    from kafka_topic_dumper_spark.plans.offsets import plan_tail_dump
    from kafka_topic_dumper_spark.sources.kafka import produce_test_messages
    from kafka_topic_dumper_spark.streaming.group_offsets import (
        fetch_end_offsets,
        kafka_python_committer,
        reset_group_to_state,
    )

    n = int(os.environ.get("KTDS_IT_MESSAGES", "3000"))
    assert produce_test_messages(BOOTSTRAP, topic, n) == n

    end = fetch_end_offsets(BOOTSTRAP, topic)
    assert sum(end.values()) == n

    beginning = {p: 0 for p in end}
    plan = plan_tail_dump(topic, beginning, end, 100)
    assert plan.available_messages == min(100, n)

    group = f"{topic}-group"
    state = {
        "dump_id": "it",
        "topic_name": topic,
        "offsets": {str(p): int(o) for p, o in end.items()},
        "dump_date": 1,
        "transformer_id": "Identity",
    }
    committed = reset_group_to_state(
        state, topic, kafka_python_committer(BOOTSTRAP, group)
    )

    consumer = KafkaConsumer(bootstrap_servers=BOOTSTRAP, group_id=group)
    try:
        for p, off in committed.items():
            got = consumer.committed(TopicPartition(topic, p))
            assert got == off
    finally:
        consumer.close()


def test_bounded_read_options_match_broker_metadata(topic):
    """The Spark Kafka source options built from a plan must reference
    exactly the partitions the broker reports."""
    import json

    from kafka_topic_dumper_spark.plans.offsets import plan_tail_dump
    from kafka_topic_dumper_spark.sources.kafka import (
        bounded_read_options,
        produce_test_messages,
    )
    from kafka_topic_dumper_spark.streaming.group_offsets import fetch_end_offsets

    produce_test_messages(BOOTSTRAP, topic, 500)
    end = fetch_end_offsets(BOOTSTRAP, topic)
    plan = plan_tail_dump(topic, {p: 0 for p in end}, end, 200)
    opts = bounded_read_options(BOOTSTRAP, plan)
    starting = json.loads(opts["startingOffsets"])
    ending = json.loads(opts["endingOffsets"])
    assert set(starting[topic]) == {str(p) for p in end}
    assert {int(p): o for p, o in ending[topic].items()} == end
