"""Unit tests for the tail-N offset planner — the arithmetic must match
the reference (_calculate_offsets, kafka_client.py:144-156) exactly:
displacement = ceil(N/P), start = max(beginning, end - displacement)."""

from __future__ import annotations

import json
from math import ceil

import pytest
from hypothesis import given
from hypothesis import strategies as st

from kafka_topic_dumper_spark.plans.offsets import (
    DumpPlan,
    offsets_from_json,
    plan_tail_dump,
)


def test_balanced_tail():
    plan = plan_tail_dump("t", {0: 0, 1: 0, 2: 0}, {0: 100, 1: 100, 2: 100}, 30)
    assert plan.start_offsets == {0: 90, 1: 90, 2: 90}
    assert plan.available_messages == 30


def test_ceil_displacement():
    # N=10 over 3 partitions → displacement ceil(10/3)=4 → 12 available
    plan = plan_tail_dump("t", {0: 0, 1: 0, 2: 0}, {0: 100, 1: 100, 2: 100}, 10)
    assert all(o == 96 for o in plan.start_offsets.values())
    assert plan.available_messages == 12


def test_clamp_at_beginning():
    # partition 1 only has 3 messages (beginning=97) — clamp, don't underflow
    plan = plan_tail_dump("t", {0: 0, 1: 97}, {0: 100, 1: 100}, 40)
    assert plan.start_offsets == {0: 80, 1: 97}
    assert plan.available_messages == 23


def test_zero_messages():
    plan = plan_tail_dump("t", {0: 5}, {0: 50}, 0)
    assert plan.start_offsets == {0: 50}
    assert plan.available_messages == 0


def test_partition_set_mismatch():
    with pytest.raises(ValueError):
        plan_tail_dump("t", {0: 0}, {0: 10, 1: 10}, 5)


def test_empty_partitions():
    with pytest.raises(ValueError):
        plan_tail_dump("t", {}, {}, 5)


def test_offsets_json_roundtrip():
    plan = plan_tail_dump("t", {0: 0, 1: 10}, {0: 100, 1: 60}, 20)
    start = json.loads(plan.starting_offsets_json())
    assert start == {"t": {"0": 90, "1": 50}}
    assert offsets_from_json(plan.starting_offsets_json(), "t") == plan.start_offsets
    # bare (state-record style) offsets map also parses, with int keys
    assert offsets_from_json('{"0": 7, "1": 9}', "t") == {0: 7, 1: 9}


@given(
    parts=st.dictionaries(
        st.integers(0, 32),
        st.tuples(st.integers(0, 10**6), st.integers(0, 10**6)),
        min_size=1,
        max_size=16,
    ),
    n=st.integers(0, 10**6),
)
def test_planner_invariants(parts, n):
    beginning = {p: min(b, e) for p, (b, e) in parts.items()}
    end = {p: max(b, e) for p, (b, e) in parts.items()}
    plan = plan_tail_dump("t", beginning, end, n)
    disp = ceil(n / len(parts)) if n else 0
    for p in parts:
        # reference formula, verbatim
        assert plan.start_offsets[p] == max(beginning[p], end[p] - disp)
        # never outside [beginning, end]
        assert beginning[p] <= plan.start_offsets[p] <= end[p]
    # bounded by what exists, and by the ceil-overshoot cap disp*P
    assert 0 <= plan.available_messages <= sum(end[p] - beginning[p] for p in parts)
    assert plan.available_messages <= disp * len(parts)
