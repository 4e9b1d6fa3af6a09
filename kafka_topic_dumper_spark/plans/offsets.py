"""Tail-N offset planning — the dump's read plan.

Pure functions (no Spark, no Kafka) mirroring the reference's offset
arithmetic so it is unit-testable to the integer:

- reference `_calculate_offsets` (kafka_client.py:144-156):
  ``perfect_displacement = ceil(N / num_partitions)``;
  per-partition ``start = max(beginning, end - perfect_displacement)``;
  ``available = sum(end - start)``.
- reference `_get_offsets` (kafka_client.py:122-142) supplies the
  (beginning, committed, end) maps; in this engine those come from the
  Spark Kafka source / admin client.

The planner's output feeds Spark's Kafka source as ``startingOffsets``
/ ``endingOffsets`` JSON (idiomatic replacement for the reference's
consumer-group commit+seek, kafka_client.py:158-166) — the driver only
plans; executors read their partition ranges in parallel.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from math import ceil


@dataclass(frozen=True)
class DumpPlan:
    """Per-partition start offsets plus the number of messages the plan
    will actually deliver (post-clamp)."""

    topic: str
    start_offsets: dict[int, int]
    end_offsets: dict[int, int]

    @property
    def available_messages(self) -> int:
        return sum(
            self.end_offsets[p] - self.start_offsets[p] for p in self.start_offsets
        )

    def starting_offsets_json(self) -> str:
        """Kafka-source ``startingOffsets`` JSON."""
        return json.dumps(
            {self.topic: {str(p): o for p, o in sorted(self.start_offsets.items())}}
        )

    def ending_offsets_json(self) -> str:
        """Kafka-source ``endingOffsets`` JSON (bounded batch read)."""
        return json.dumps(
            {self.topic: {str(p): o for p, o in sorted(self.end_offsets.items())}}
        )


def plan_tail_dump(
    topic: str,
    beginning_offsets: dict[int, int],
    end_offsets: dict[int, int],
    num_messages: int,
) -> DumpPlan:
    """Compute the tail-N read plan.

    Exact reference semantics (kafka_client.py:144-156): displacement
    is ``ceil(N / P)`` — balanced across partitions, so a skewed topic
    yields fewer than N messages rather than over-reading one
    partition — and each start is clamped at the partition's beginning
    offset.
    """
    if set(beginning_offsets) != set(end_offsets):
        raise ValueError(
            f"partition sets differ: {sorted(beginning_offsets)} vs {sorted(end_offsets)}"
        )
    if not beginning_offsets:
        raise ValueError(f"topic {topic!r} has no partitions")
    if num_messages < 0:
        raise ValueError("num_messages must be >= 0")
    displacement = ceil(num_messages / len(end_offsets)) if num_messages else 0
    starts = {
        p: max(beginning_offsets[p], end_offsets[p] - displacement)
        for p in end_offsets
    }
    return DumpPlan(topic=topic, start_offsets=starts, end_offsets=dict(end_offsets))


def offsets_from_json(payload: str, topic: str) -> dict[int, int]:
    """Parse a startingOffsets/endingOffsets JSON back to a partition
    map. Inverse of DumpPlan.*_json; also reads the reference's state
    record ``offsets`` field, whose keys became strings after the JSON
    round-trip (kafka_client.py:310,366 — asymmetry fixed here by
    always normalizing to int)."""
    data = json.loads(payload)
    offsets = data[topic] if topic in data else data
    return {int(p): int(o) for p, o in offsets.items()}
