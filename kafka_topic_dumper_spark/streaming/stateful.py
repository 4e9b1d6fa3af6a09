"""Custom stateful streaming operator: conversion-terminated
sessionization via ``applyInPandasWithState``.

The stock ``session_window`` can only close a session on an inactivity
gap; this operator ALSO closes it eagerly on a purchase event — the
semantics of ``operators/analytics.py::sessionize`` (its batch twin,
which carries the DuckDB oracle). Differential testing: streaming
emits exactly the batch result minus each user's still-open trailing
session (tests/test_stateful_streaming.py).

Scale shape: state is one fixed-size tuple per user — O(keys), not
O(events); rows stream through Arrow batches; the single shuffle is
the groupBy on user_id that Structured Streaming already needs for
state partitioning. The tuple persists after a user's sessions close
(n_events == 0 is the "no open session" sentinel) because it carries
the MONOTONE session counter: removing it, as the first
implementation did, restarted session_id at 1 on the user's next
micro-batch — duplicate (user_id, session_id) keys across batches and
a silent divergence from the batch twin's numbering (code-review r6
finding; the single-batch availableNow tests could never see it).

The worker function is self-contained (closes over plain ints only) so
cloudpickle ships it by value and executors never import this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("converted", T.IntegerType()),
    ]
)

# timestamps kept as epoch-microsecond longs in state: fixed-width,
# timezone-proof, cheap to serialize per micro-batch
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("converted", T.IntegerType()),
    ]
)


ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("v_c", T.LongType()),
        T.StructField("n_window", T.LongType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [T.StructField("vals", T.ArrayType(T.LongType()))]
)


def rolling_anomaly_stream(
    events: DataFrame,
    lookback: int = 20,
    min_window: int = 8,
    z: int = 3,
) -> DataFrame:
    """The STATEFUL STREAMING twin of
    ``operators/analytics.rolling_anomaly``: per-user rolling z-score
    anomaly flags over a live event stream via
    ``applyInPandasWithState``. State is the user's last ≤``lookback``
    floor-quantized values — a fixed-size ring per key, O(keys·20)
    total, never O(events). Because the test is the batch twin's
    exact cross-multiplied INTEGER comparison on the exact same
    preceding-window contents, a full replay in per-user time order
    (ts-range micro-batches) reproduces the batch operator row for
    row — the batch SQL IS the oracle, which is what makes an online
    anomaly detector differentially checkable at all.

    The worker function closes over plain ints only, so cloudpickle
    ships it by value and executors never import this package (the
    verify-skill gotcha)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    zz = z * z
    lb = lookback
    mw = min_window

    def fold(key, pdfs, state):
        import math

        import pandas as pd

        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        buf = list(state.get[0]) if state.exists else []
        ev_out, vc_out, n_out, flag_out = [], [], [], []
        for event_id, value in zip(rows["event_id"], rows["value"]):
            vc = math.floor(float(value) * 100)
            n = len(buf)
            if n >= mw:
                s = sum(buf)
                q = sum(b * b for b in buf)
                lhs = vc * n - s
                ev_out.append(int(event_id))
                vc_out.append(vc)
                n_out.append(n)
                flag_out.append(lhs * lhs > zz * (q * n - s * s))
            buf.append(vc)
            if len(buf) > lb:
                buf = buf[-lb:]
        state.update((buf,))
        if ev_out:
            yield pd.DataFrame(
                {
                    "event_id": ev_out,
                    "user_id": [user_id] * len(ev_out),
                    "v_c": vc_out,
                    "n_window": n_out,
                    "is_anomaly": flag_out,
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    flush_timeout: bool = False,
    watermark: str = "0 seconds",
) -> DataFrame:
    """events stream → closed-session rows (append). A session closes
    when a later event of the same user arrives past the gap, or
    eagerly on a purchase. With ``flush_timeout=True`` an event-time
    timer also closes the trailing open session once the watermark
    passes ``last_event + gap`` — no session waits forever for a key
    that went quiet; otherwise it stays in state.

    Out-of-order arrivals across micro-batches (possible whenever no
    watermark filters late rows): a late event that still belongs to
    the open session must not REWIND the session clock — ``last_us``
    advances with max() (the batch twin's session_end is max(ts)) and
    ``start_us`` retreats with min(), so cross-batch stragglers fold
    in instead of corrupting the next gap test (code-review r6).

    Session-timezone caveat (flush_timeout only): the kernel sees
    session-local wall-clock values while the engine's watermark lives
    in the instant domain, so under a non-UTC session the flush timer
    fires offset-late (sessions still flush, just on a shifted
    horizon; output VALUES are unaffected — the wall-time round trip
    cancels). Run flush-horizon-sensitive comparisons under UTC (the
    registry/driver default) or derive the timeout from
    ``state.getCurrentWatermarkMs()`` if exact non-UTC horizons ever
    matter."""
    # cast unconditionally: a string ts from a JSON-decoded source
    # must become a timestamp BEFORE sort/arith, watermark or not
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if flush_timeout:
        events = events.withWatermark("ts", watermark)

    def fold(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        out = []

        def _df(rows_out):
            return pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows_out],
                    "session_id": [r[1] for r in rows_out],
                    "session_start": pd.to_datetime(
                        [r[2] for r in rows_out], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [r[3] for r in rows_out], unit="us"
                    ),
                    "n_events": [r[4] for r in rows_out],
                    "sum_value": [round(r[5], 2) for r in rows_out],
                    "converted": [r[6] for r in rows_out],
                }
            )

        if flush_timeout and state.hasTimedOut:
            sid, start_us, last_us, n, sv, conv = state.get
            if n > 0:
                out.append((user_id, sid, start_us, last_us, n, sv, conv))
            # keep the sentinel row: it carries the session counter
            state.update((sid, 0, 0, 0, 0.0, 0))
            if out:
                yield _df(out)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            sid, start_us, last_us, n, sv, conv = state.get
            has_open = n > 0
        else:
            sid, start_us, last_us, n, sv, conv = 0, 0, 0, 0, 0.0, 0
            has_open = False

        def emit():
            out.append((user_id, sid, start_us, last_us, n, sv, conv))

        for ts, event_id, etype, value in zip(
            rows["ts"], rows["event_id"], rows["event_type"], rows["value"]
        ):
            ts_us = ts.value // 1000  # pandas ns → µs
            # gap measured in TRUNCATED whole seconds, exactly the
            # batch twin's timestampdiff(SECOND, ...) arithmetic — a
            # µs-exact test here disagreed with the batch (and the
            # oracle's floor(epoch)) for fractional near-boundary gaps
            if has_open and (
                ts_us // 1_000_000 - last_us // 1_000_000 > gap_seconds
            ):
                emit()
                has_open = False
            if not has_open:
                sid += 1
                start_us, last_us, n, sv, conv = ts_us, ts_us, 0, 0.0, 0
                has_open = True
            else:
                start_us = min(start_us, ts_us)
                last_us = max(last_us, ts_us)
            n += 1
            sv += float(value)
            if etype == "purchase":
                conv = 1
                emit()
                has_open = False
        if has_open:
            state.update((sid, start_us, last_us, n, sv, conv))
            if flush_timeout:
                state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        else:
            # no open session, but the counter must survive the batch
            state.update((sid, 0, 0, 0, 0.0, 0))
        if out:
            yield _df(out)

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if flush_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
