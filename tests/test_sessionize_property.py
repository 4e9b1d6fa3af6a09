"""Property-based differential test for conversion-terminated
sessionization: the Spark window-plan implementation must agree with a
direct pure-Python fold of the spec on arbitrary event streams.

The generator intentionally produces colliding timestamps, boundary
gaps (exactly the 1800 s threshold), single-event users, and
interleaved purchases — the cases a window off-by-one would break.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_topic_dumper_spark.operators.analytics import sessionize

GAP = 1800
BASE = datetime(2026, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # user_id — few users → long per-user chains
        st.integers(0, 40),  # ts offset in half-gap units (collisions likely)
        st.sampled_from(["view", "purchase", "click"]),
        st.integers(0, 100),  # value as integral double (exact fp)
    ),
    min_size=1,
    max_size=40,
)


def python_sessionize(rows):
    """The spec, folded directly: new session when first event, gap
    > 1800 s from the previous event, or the previous event was a
    purchase. Returns {(user_id, session_id): (start, end, n, sum,
    converted)}."""
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    out = {}
    for uid, evs in by_user.items():
        sid = 0
        cur = None  # (start, end, n, total, converted)
        prev = None
        for e in evs:
            is_new = (
                prev is None
                or (e["ts"] - prev["ts"]).total_seconds() > GAP
                or prev["event_type"] == "purchase"
            )
            if is_new:
                if cur is not None:
                    out[(uid, sid)] = cur
                sid += 1
                cur = (e["ts"], e["ts"], 0, 0.0, 0)
            start, _, n, total, conv = cur
            cur = (
                start,
                e["ts"],
                n + 1,
                total + e["value"],
                1 if e["event_type"] == "purchase" else conv,
            )
            prev = e
        out[(uid, sid)] = cur
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=events_strategy)
def test_sessionize_matches_python_fold(spark, raw):
    rows = [
        {
            "event_id": i,
            "user_id": uid,
            "ts": BASE + timedelta(seconds=off * (GAP // 2)),
            "event_type": etype,
            "value": float(val),
            "props": "{}",
        }
        for i, (uid, off, etype, val) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows,
        schema="event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    got = {
        (r.user_id, r.session_id): (
            r.session_start,
            r.session_end,
            r.n_events,
            r.sum_value,
            r.converted,
        )
        for r in sessionize(df).collect()
    }
    expected = {
        k: (s, e, n, round(t, 2), c)
        for k, (s, e, n, t, c) in python_sessionize(rows).items()
    }
    assert got == expected
