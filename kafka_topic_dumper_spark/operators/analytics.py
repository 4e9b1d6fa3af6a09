"""Analytic operator coverage beyond the reference (SURVEY §2.9 lists
these as explicitly absent there): as-of join, grouping
sets (rollup/cube), set operations, general window functions, and
semi/anti joins. All stock DataFrame ops — Catalyst plans them; each
query documents its 100 TB shape.

The as-of join deliberately avoids a range self-join: the scalable plan
is a single shuffle on the key + one in-partition sort, propagating the
most recent right-side row with an IGNORE NULLS running last() — the
same sort-merge shape DuckDB's native ASOF JOIN executes, but expressed
with stock window functions so it also runs as a streaming
applyInPandasWithState variant.

Broadcast HINT policy (r5): explicit ``F.broadcast`` only on
relations whose size is independent of scale factor (nation, 1-row /
bounded aggregates like window bounds and cohort sizes). part,
customer, and filtered-fact derivations (the "big orders" set) grow
with SF and carry no hint — the planner broadcasts them from size
stats at bench SF, and falls back to a shuffled join at 100× instead
of OOMing. Docstrings describing "X broadcasts" document the plan
observed at bench SF, not a forced hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_topic_dumper_spark.functions.exact_money import cents, pct_units
from kafka_topic_dumper_spark.operators.relational import salted_join
from kafka_topic_dumper_spark.sources.tables import load_table


def asof_last_purchase(events: DataFrame) -> DataFrame:
    """For every event: the user's most recent purchase event at-or-
    before it (by (ts, event_id) order). One shuffle on user_id, one
    in-partition sort, running last() with ignorenulls — no range join,
    no row explosion; state is O(1) per key so the same plan streams."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_purchase = F.col("event_type") == "purchase"
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.last(F.when(is_purchase, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("last_purchase_event_id"),
        F.last(F.when(is_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_purchase_ts"),
    )


ASOF_TOLERANCE_MIN = 45


def asof_last_purchase_tolerance(
    events: DataFrame, tolerance_min: int = ASOF_TOLERANCE_MIN
) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas merge_asof's ``tolerance=``,
    QuestDB/kdb's staleness bound): the user's most recent purchase
    at-or-before each event, but only if it happened within the last
    ``tolerance_min`` minutes — an older match is as good as none (the
    attribution-window shape: a purchase three days before a click
    doesn't explain it). Same single-shuffle running-last plan as
    :func:`asof_last_purchase`; the bound is one post-window filter
    expression, not a range join."""
    base = asof_last_purchase(events)
    within = F.col("last_purchase_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {tolerance_min} MINUTES"
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("last_purchase_event_id")).alias(
            "last_purchase_event_id"
        ),
        F.when(within, F.col("last_purchase_ts")).alias("last_purchase_ts"),
    )


ANOMALY_LOOKBACK = 20
ANOMALY_MIN_WINDOW = 8
ANOMALY_Z = 3


def rolling_anomaly(
    events: DataFrame,
    lookback: int = ANOMALY_LOOKBACK,
    min_window: int = ANOMALY_MIN_WINDOW,
    z: int = ANOMALY_Z,
) -> DataFrame:
    """Per-user rolling z-score anomaly flags — the streaming-shaped
    outlier detector: each event's value is compared against the mean
    and variance of the SAME user's preceding ``lookback`` events, and
    flagged when it sits more than ``z`` standard deviations out.

    Exactness: values are floor-quantized to integer cents, and the
    z-test is evaluated as the cross-multiplied INTEGER comparison
    (v·n − S)² > z²·(Q·n − S²)  (S = Σv, Q = Σv² over the frame), so
    no engine-dependent float summation order can flip a boundary flag
    — the same libm-free discipline as the log-free TF-IDF row.
    Magnitudes: |v| ≤ ~1e6 cents, n ≤ 20 → Q·n ≤ ~4e14, squares ≤
    ~4e14 — all inside int64.

    Scale shape: one shuffle on user_id, one in-partition sort, two
    running integer sums over a bounded frame — O(1) state per row,
    the plan a 1000-executor cluster runs as a single stage after the
    exchange."""
    vc = F.floor(F.col("value") * 100).cast("bigint")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-lookback, -1)
    )
    base = events.select(
        "event_id",
        "user_id",
        "ts",
        vc.alias("v_c"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "v_c",
        F.count("v_c").over(frame).alias("n_window"),
        F.sum("v_c").over(frame).alias("s_win"),
        F.sum(F.col("v_c") * F.col("v_c")).over(frame).alias("q_win"),
    )
    rhs = F.lit(z * z) * (
        F.col("q_win") * F.col("n_window") - F.col("s_win") * F.col("s_win")
    )
    return (
        base.filter(F.col("n_window") >= min_window)
        .select(
            "event_id",
            "user_id",
            "v_c",
            F.col("n_window").cast("bigint").alias("n_window"),
            (
                (F.col("v_c") * F.col("n_window") - F.col("s_win"))
                * (F.col("v_c") * F.col("n_window") - F.col("s_win"))
                > rhs
            ).alias("is_anomaly"),
        )
    )


def rolling_anomaly_oracle_sql(
    lookback: int = ANOMALY_LOOKBACK,
    min_window: int = ANOMALY_MIN_WINDOW,
    z: int = ANOMALY_Z,
) -> str:
    return f"""
        WITH q AS (
            SELECT event_id, user_id,
                   CAST(floor(value * 100) AS BIGINT) AS v_c,
                   count(*) OVER w AS n_window,
                   sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS s_win,
                   sum(CAST(floor(value * 100) AS BIGINT)
                       * CAST(floor(value * 100) AS BIGINT)) OVER w AS q_win
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {lookback} PRECEDING
                         AND 1 PRECEDING)
        )
        SELECT event_id, user_id, v_c,
               CAST(n_window AS BIGINT) AS n_window,
               (v_c * n_window - s_win) * (v_c * n_window - s_win)
                   > {z * z} * (q_win * n_window - s_win * s_win)
                   AS is_anomaly
        FROM q
        WHERE n_window >= {min_window}
    """


# Tuned to the events.value scale (σ ≈ 4900 cents): the classic
# κ = σ/2, h = 4σ operating point, in integer cents.
CUSUM_SLACK_C = 2500   # per-step drift allowance κ
CUSUM_H_C = 20000      # decision threshold h


def cusum_changepoints(
    events: DataFrame,
    slack_c: int = CUSUM_SLACK_C,
    h_c: int = CUSUM_H_C,
) -> DataFrame:
    """Per-user CUSUM drift detection (Page 1954) — the sequential
    changepoint statistic, distributed WITHOUT its sequential
    recursion: the textbook form C⁺_t = max(0, C⁺_{t-1} + x_t − μ₀ − κ)
    is a running-reset recursion no SQL window expresses directly, but
    it has a closed window-algebra identity —
    C⁺_t = P_t − min_{j≤t} P_j over the prefix sum P of (x − μ₀ − κ)
    (and symmetrically C⁻_t = max_{j≤t} P'_j − P'_t over x + κ's
    prefix) — so the whole statistic is two running aggregates on one
    (user, time) sort. μ₀ is the global mean in floor-quantized cents
    (one metadata-sized aggregate, broadcast); everything downstream
    is INTEGER, so both engines agree bit-for-bit and the drift flag
    cannot float-flip.

    Scale shape: one shuffle on user_id, one in-partition sort, four
    running integer window aggregates — O(1) state per row, the same
    single-stage profile as the as-of joins."""
    vc = F.floor(F.col("value") * 100).cast("bigint")
    base = events.select("event_id", "user_id", "ts", vc.alias("v_c"))
    mu0 = base.agg(
        F.floor(F.avg("v_c")).cast("bigint").alias("mu0")
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = base.join(F.broadcast(mu0)).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("v_c") - F.col("mu0") - F.lit(slack_c)).alias("up_step"),
        (F.col("v_c") - F.col("mu0") + F.lit(slack_c)).alias("dn_step"),
    )
    p = stepped.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("up_step").over(run).alias("p_up"),
        F.sum("dn_step").over(run).alias("p_dn"),
    )
    # the running extremum must include the EMPTY prefix (S₀ = 0) —
    # the reset-at-zero baseline of the recursion — hence least/greatest
    return p.select(
        "event_id",
        "user_id",
        (
            F.col("p_up") - F.least(F.lit(0), F.min("p_up").over(run))
        ).alias("cusum_pos"),
        (
            F.greatest(F.lit(0), F.max("p_dn").over(run)) - F.col("p_dn")
        ).alias("cusum_neg"),
    ).select(
        "event_id",
        "user_id",
        "cusum_pos",
        "cusum_neg",
        (
            (F.col("cusum_pos") > h_c) | (F.col("cusum_neg") > h_c)
        ).alias("drift_flag"),
    )


def cusum_oracle_sql(
    slack_c: int = CUSUM_SLACK_C, h_c: int = CUSUM_H_C
) -> str:
    return f"""
        WITH base AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 100) AS BIGINT) AS v_c
            FROM events
        ), m AS (
            SELECT CAST(floor(avg(v_c)) AS BIGINT) AS mu0 FROM base
        ), p AS (
            SELECT event_id, user_id, ts,
                   sum(v_c - mu0 - {slack_c}) OVER w AS p_up,
                   sum(v_c - mu0 + {slack_c}) OVER w AS p_dn
            FROM base, m
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ), c AS (
            SELECT event_id, user_id,
                   p_up - least(0, min(p_up) OVER w) AS cusum_pos,
                   greatest(0, max(p_dn) OVER w) - p_dn AS cusum_neg
            FROM p
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT event_id, user_id,
               CAST(cusum_pos AS BIGINT) AS cusum_pos,
               CAST(cusum_neg AS BIGINT) AS cusum_neg,
               (cusum_pos > {h_c} OR cusum_neg > {h_c}) AS drift_flag
        FROM c
    """


# Truncated binary EWMA: half-life = one event (α = 1/2), window depth
# D. Weights 2^(D-i) for lag i ∈ 1..D keep every term — and both
# running sums — exact 64-bit integers, so the smoothed level is the
# exact rational ewma_num / ewma_den on BOTH engines (a float-α EWMA's
# sequential recursion is neither distributable nor cross-engine
# stable; the truncated dyadic form is both, and after D=24 steps the
# dropped tail weight is 2^-24 of the level — far below cent
# resolution). The level deliberately EXCLUDES the current row: a
# spike detector that folds v_t into the baseline with weight > 1/2
# can never fire (v·den > 2·num would need v > 2·(something ≥ v/2) —
# unsatisfiable for v ≥ 0; advisor round-10 finding). Lags 1..D make
# the flag "current value vs the level BEFORE it arrived", which is
# the monitoring semantics every EWMA control chart uses.
EWMA_DEPTH = 24
EWMA_SPIKE_MULT = 2  # flag when v > MULT × prior smoothed level


def ewma_smoothing(
    events: DataFrame,
    depth: int = EWMA_DEPTH,
    spike_mult: int = EWMA_SPIKE_MULT,
) -> DataFrame:
    """Per-user exponentially weighted moving average of the event
    value, distributed WITHOUT the sequential recursion: the α = 1/2
    EWMA truncated at ``depth`` lags is a fixed dyadic-weighted sum
    Σ v_{t-i}·2^(depth-i) / Σ 2^(depth-i) over the available PRIOR
    lags i = 1..depth (the current row is excluded — see the module
    comment above: including it makes the spike flag algebraically
    unsatisfiable), i.e. ``depth`` LAG expressions inside ONE window
    node (Catalyst fuses same-frame window functions; one user_id
    shuffle + one in-partition sort, O(depth) state per row — the same
    single-stage profile as the CUSUM identity above). All-integer
    numerator and denominator make the spike predicate
    v·den > mult·num bit-exact cross-engine; each user's first event
    has den = 0 and never flags.

    Reference parity: the dumper has no smoothing at all — this is the
    monitoring statistic its ops dashboards would compute downstream
    of kafka_client.py's per-partition message counts."""
    vc = F.floor(F.col("value") * 100).cast("bigint")
    base = events.select("event_id", "user_id", "ts", vc.alias("v_c"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for i in range(1, depth + 1):
        lag_i = F.lag("v_c", i).over(w)
        weight = F.lit(1 << (depth - i)).cast("bigint")
        num = num + F.when(lag_i.isNotNull(), lag_i * weight).otherwise(
            F.lit(0)
        )
        den = den + F.when(lag_i.isNotNull(), weight).otherwise(F.lit(0))
    return base.select(
        "event_id",
        "user_id",
        "v_c",
        num.alias("ewma_num"),
        den.alias("ewma_den"),
        (
            F.col("v_c") * den > F.lit(spike_mult) * num
        ).alias("spike_flag"),
    )


def ewma_oracle_sql(
    depth: int = EWMA_DEPTH, spike_mult: int = EWMA_SPIKE_MULT
) -> str:
    num_terms = " + ".join(
        f"CASE WHEN lag(v_c, {i}) OVER w IS NOT NULL"
        f" THEN lag(v_c, {i}) OVER w * {1 << (depth - i)}"
        f" ELSE 0 END"
        for i in range(1, depth + 1)
    )
    den_terms = " + ".join(
        f"CASE WHEN lag(v_c, {i}) OVER w IS NOT NULL"
        f" THEN {1 << (depth - i)} ELSE 0 END"
        for i in range(1, depth + 1)
    )
    return f"""
        WITH base AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 100) AS BIGINT) AS v_c
            FROM events
        ), e AS (
            SELECT event_id, user_id, v_c,
                   CAST({num_terms} AS BIGINT) AS ewma_num,
                   CAST({den_terms} AS BIGINT) AS ewma_den
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id, v_c, ewma_num, ewma_den,
               (v_c * ewma_den > {spike_mult} * ewma_num) AS spike_flag
        FROM e
    """


def benford_profile(orders: DataFrame) -> DataFrame:
    """First-digit (Benford) profile of order totals — the classic
    fabricated-data / unit-mixing tripwire a data-quality suite runs
    over any money column: organic multiplicative amounts follow
    P(d) = log10(1 + 1/d); synthetic or clipped data does not. Emits
    per digit the observed count, observed share, the Benford
    expectation, and the absolute deviation. The digit comes from the
    integer floor's decimal string (exact cross-engine); shares are
    single IEEE divisions of exact counts; log10(1+1/d) is 9 constant
    libm calls under the same round(6) guard as the LM rows.

    Plan: one projection + one 9-group aggregation with map-side
    combine — nothing SF-proportional survives the shuffle."""
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("integer")
    counts = (
        orders.where(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    share = F.col("n") / F.col("total")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(share, 6).alias("share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(F.abs(share - benford), 6).alias("abs_dev"),
        )
    )


def benford_oracle_sql() -> str:
    return """
        WITH counts AS (
            SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit,
                   count(*) AS n
            FROM orders
            WHERE o_totalprice >= 1
            GROUP BY 1
        ), t AS (SELECT sum(n) AS total FROM counts)
        SELECT digit,
               CAST(n AS BIGINT) AS n,
               round(n / total, 6) AS share,
               round(log10(CAST(1 AS DOUBLE)
                           + CAST(1 AS DOUBLE) / digit), 6)
                   AS benford_share,
               round(abs(n / total
                         - log10(CAST(1 AS DOUBLE)
                                 + CAST(1 AS DOUBLE) / digit)), 6)
                   AS abs_dev
        FROM counts, t
        """


def mad_by_type(events: DataFrame) -> DataFrame:
    """Median absolute deviation per event type — the robust
    dispersion statistic an outlier-heavy metric needs where stddev
    saturates (one 500× spike barely moves MAD, doubles σ). Exactness:
    values floor-quantize to integer cents, so the first median's
    0.5-fraction interpolation lands on half-integers and the second
    (over |v − median|, half-integer-valued) on quarter-integers —
    every term an exact binary double on BOTH engines, the same
    dyadic-fraction argument as stats_exact_percentiles (arbitrary
    doubles would NOT be cross-engine-stable: Spark and DuckDB
    interpolate with different expression trees).

    Plan: two group-sorted aggregates with a broadcast median join
    between them — exact medians are full-sort-per-group, fine for
    bounded type cardinality (the documented trade of the exact-
    percentile row; unbounded keys → approx_percentile)."""
    vc = F.floor(F.col("value") * 100).cast("bigint")
    base = events.select("event_type", vc.alias("v_c"))
    med = base.groupBy("event_type").agg(
        F.expr("percentile(v_c, 0.5D)").alias("median_c"),
        F.count("*").alias("n"),
    )
    dev = (
        base.join(F.broadcast(med), "event_type")
        .select(
            "event_type", F.abs(F.col("v_c") - F.col("median_c")).alias("d")
        )
        .groupBy("event_type")
        .agg(F.expr("percentile(d, 0.5D)").alias("mad_c"))
    )
    return med.join(dev, "event_type").select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "median_c",
        "mad_c",
    )


def mad_oracle_sql() -> str:
    return """
        WITH base AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS v_c
            FROM events
        ), med AS (
            SELECT event_type,
                   quantile_cont(v_c, 0.5) AS median_c,
                   count(*) AS n
            FROM base GROUP BY event_type
        ), dev AS (
            SELECT b.event_type,
                   quantile_cont(abs(b.v_c - m.median_c), 0.5) AS mad_c
            FROM base b JOIN med m ON b.event_type = m.event_type
            GROUP BY b.event_type
        )
        SELECT m.event_type, CAST(m.n AS BIGINT) AS n, m.median_c, d.mad_c
        FROM med m JOIN dev d ON m.event_type = d.event_type
        """


def rollup_revenue(orders: DataFrame) -> DataFrame:
    """ROLLUP over (priority, year): per-group, per-priority subtotal,
    and grand total in one pass — partial-aggregatable, one shuffle.
    Subtotal-level NULL keys are coalesced to sentinels ('ALL' / -1) so
    downstream order-insensitive comparators never sort mixed
    NULL/non-NULL keys (the source keys are non-null, so the sentinel is
    unambiguous)."""
    return (
        orders.rollup("o_orderpriority", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "n_orders",
            "total_price",
        )
    )


def cube_event_activity(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, weekday): all 4 grouping combinations in
    one shuffle (weekday: 0=Monday, ISO; subtotal NULLs → sentinels as
    in rollup_revenue)."""
    return (
        events.cube("event_type", F.weekday("ts").alias("dow"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("dow", F.lit(-1)).alias("dow"),
            "n_events",
            "sum_value",
        )
    )


def customer_cohorts(orders: DataFrame) -> DataFrame:
    """Set-operation cohorts: customers ordering in both 1996 and 1997
    (INTERSECT), only 1996 (EXCEPT), only 1997 (EXCEPT) — tagged union.
    Distinct set ops hash-shuffle on the full row; here the row is just
    the key, so each op is one exchange on o_custkey."""
    from kafka_topic_dumper_spark.functions.caching import tracked_persist

    # each year-set feeds two set ops (intersect + subtract); persist or
    # the orders fact is scanned six times (code-review r6)
    y96 = tracked_persist(
        orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    )
    y97 = tracked_persist(
        orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    )
    retained = y96.intersect(y97).withColumn("cohort", F.lit("retained"))
    churned = y96.subtract(y97).withColumn("cohort", F.lit("churned"))
    acquired = y97.subtract(y96).withColumn("cohort", F.lit("acquired"))
    return retained.unionAll(churned).unionAll(acquired)


def window_event_metrics(events: DataFrame) -> DataFrame:
    """General window-function surface over the event stream: lag/lead,
    running (integer-exact) purchase count, rank, ntile — all in ONE
    window spec ⇒ one shuffle on user_id + one sort serves every
    column."""
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wv = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(wo).alias("prev_event_type"),
        F.lead("event_id").over(wo).alias("next_event_id"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(run)
        .cast("bigint")
        .alias("purchases_so_far"),
        F.rank().over(wv).cast("integer").alias("value_rank"),
        F.ntile(4).over(wv).cast("integer").alias("value_quartile"),
    )


def large_volume_orders(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame, min_qty: float = 250.0
) -> DataFrame:
    """TPC-H Q18 shape: aggregate the fact table first (partial agg +
    HAVING prunes before any join), then join the small survivor set —
    broadcast — against orders/customer."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


def customer_order_existence(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Semi/anti join surface: customers with no orders at all (anti)
    and customers with ≥1 1995 order (semi), tagged. Both plan as
    broadcast/shuffled hash joins with early-out probing — no row
    multiplication."""
    o95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    no_orders = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("no_orders").alias("tag"))
    buyers95 = customer.join(
        o95, customer.c_custkey == o95.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("buyer_1995").alias("tag"))
    return no_orders.unionAll(buyers95)


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Conversion-terminated sessionization: a session ends after
    ``gap_seconds`` of inactivity OR immediately after a purchase —
    richer semantics than the stock ``session_window`` (gap-only).
    Batch form: boundary detection with lag() + running sum gives each
    event a session_id, then one aggregate per session. Two window
    passes over ONE shuffle on user_id (same window spec), then a
    partial-aggregatable groupBy. The streaming twin
    (streaming/stateful.py) keeps O(1) state per open session.

    The gap test uses second differences computed directly on the NTZ
    wall time (timestampdiff from the NTZ epoch) — fully timezone-
    independent. (unix_timestamp over a session-zone cast is NOT: its
    differences shift by an hour for pairs straddling a DST
    transition.)"""
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    secs = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    prev_secs = F.lag(secs).over(wo)
    prev_type = F.lag("event_type").over(wo)
    is_new = (
        prev_secs.isNull()
        | ((secs - prev_secs) > gap_seconds)
        | (prev_type == "purchase")
    ).cast("int")
    tagged = events.withColumn(
        "session_id", F.sum(is_new).over(run).cast("bigint")
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("int")
        .alias("converted"),
    )


def asof_next_purchase(events: DataFrame) -> DataFrame:
    """Forward as-of: for every event, the same user's NEXT purchase
    at-or-after it — the attribution/label-lookahead direction (e.g.
    "did a purchase follow within the session"). Same single-shuffle
    window plan as the backward form, with a forward frame and
    first(ignorenulls)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_purchase = F.col("event_type") == "purchase"
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.first(F.when(is_purchase, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("next_purchase_event_id"),
        F.first(F.when(is_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("next_purchase_ts"),
    )


def asof_nearest_purchase(events: DataFrame) -> DataFrame:
    """NEAREST-match as-of join — the remaining direction after
    backward, forward, and tolerance: each event pairs with the same
    user's temporally closest purchase on EITHER side (backward wins
    exact-distance ties, so a purchase row matches itself at gap 0).
    Both direction frames share one (user, time) sort — still a
    single shuffle; distances compare in exact integer microseconds
    (timestampdiff), never float seconds."""
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_purchase = F.col("event_type") == "purchase"
    base = events.select(
        "event_id",
        "user_id",
        "ts",
        F.last(F.when(is_purchase, F.col("event_id")), ignorenulls=True)
        .over(wb)
        .alias("lpe"),
        F.last(F.when(is_purchase, F.col("ts")), ignorenulls=True)
        .over(wb)
        .alias("lpt"),
        F.first(F.when(is_purchase, F.col("event_id")), ignorenulls=True)
        .over(wf)
        .alias("npe"),
        F.first(F.when(is_purchase, F.col("ts")), ignorenulls=True)
        .over(wf)
        .alias("npt"),
    )
    d_back = F.expr("timestampdiff(MICROSECOND, lpt, ts)")
    d_fwd = F.expr("timestampdiff(MICROSECOND, ts, npt)")
    take_back = F.col("lpt").isNotNull() & (
        F.col("npt").isNull() | (d_back <= d_fwd)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(take_back, F.col("lpe"))
        .otherwise(F.col("npe"))
        .alias("nearest_purchase_event_id"),
        F.when(take_back, F.col("lpt"))
        .otherwise(F.col("npt"))
        .alias("nearest_purchase_ts"),
        F.when(take_back, d_back)
        .otherwise(F.when(F.col("npt").isNotNull(), d_fwd))
        .cast("bigint")
        .alias("gap_us"),
    )


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Hypertable-style gap filling: a dense hourly spine per
    event_type between the corpus's first and last hour, observed
    hourly aggregates joined on, gaps carrying the last seen value
    forward. The spine is |event_types| × hours — metadata-sized next
    to the fact table, so it broadcasts; the only fact-side work is
    the hourly pre-aggregate (one shuffle, partial map-side combine).
    Forward fill is last_value(IGNORE NULLS) over the SPINE (small),
    never over raw events.

    The fact table is scanned ONCE: the hourly pre-aggregate is
    persisted and the spine's bounds and event-type set both derive
    from it (min/max of truncated hours == truncated min/max ts;
    every event_type present has ≥1 hourly row) — not from extra
    passes over raw events."""
    from kafka_topic_dumper_spark.functions.caching import tracked_persist

    from kafka_topic_dumper_spark.functions.ntz_time import trunc_hour_ntz

    hourly = tracked_persist(
        events.groupBy(trunc_hour_ntz("ts").alias("hour"), "event_type").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    bounds = hourly.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("carried_sum_value"),
            F.col("n_events").isNull().cast("int").alias("is_gap"),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each (cohort week, weeks since), the count of
    cohort members active that week and the retention fraction.
    Shuffle budget: the per-user min (one partial-agg shuffle on
    user_id), the distinct (user, week) pairs (same key — AQE reuses
    the layout), a user-keyed join of two user-cardinality sides
    (co-partitioned at scale), then a tiny (cohort, week) aggregate.
    Week arithmetic is integer day-diffs div 7 on NTZ wall time —
    timezone-independent and exact.

    One fact scan: the distinct (user, week) activity set is persisted
    and the cohort anchor derives from it (date_trunc is monotone, so
    trunc(min ts) == min(trunc ts))."""
    from kafka_topic_dumper_spark.functions.caching import tracked_persist

    from kafka_topic_dumper_spark.functions.ntz_time import trunc_week_ntz

    active = tracked_persist(
        events.select("user_id", trunc_week_ntz("ts").alias("week")).distinct()
    )
    cohorts = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        active.join(cohorts, "user_id")
        .withColumn(
            "week_number",
            F.expr("timestampdiff(DAY, cohort_week, week) div 7").cast("int"),
        )
        .groupBy("cohort_week", "week_number")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_number",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention_frac"
            ),
        )
    )


EQUIDEPTH_K = 16


def equidepth_histogram(orders: DataFrame, k: int = EQUIDEPTH_K) -> DataFrame:
    """EXACT equal-frequency (equi-depth) histogram over order value —
    the ANALYZE-style statistic an optimizer wants — WITHOUT the
    single-partition ntile()/row_number() window that bottlenecks a
    global ranking at scale: the global row number comes from the
    two-phase distributed prefix sum (packing.ordered_prefix_sum keyed
    on integer cents, o_orderkey tie), i.e. range-bucketed parallel
    cumsums + metadata-plane bases. Bucket of a row with exclusive
    rank s is ``(s·k) div N`` — identical to NTILE's fill rule up to
    remainder placement, and the DuckDB oracle replays this exact
    integer formula over row_number(), so the distributed ranking is
    proven equal to the serial one. All arithmetic integer; bucket
    edges are exact cents."""
    from kafka_topic_dumper_spark.functions.exact_money import cents
    from kafka_topic_dumper_spark.operators.packing import ordered_prefix_sum

    vals = orders.select(
        cents(F.col("o_totalprice")).alias("price_cents"),
        "o_orderkey",
        F.lit(1).alias("one"),
    )
    n = vals.count()
    ps = ordered_prefix_sum(vals, "price_cents", "one", tie="o_orderkey")
    if ps is None:
        return orders.sparkSession.createDataFrame(
            [], "bucket int, n_rows long, lo_cents long, hi_cents long"
        )
    return (
        ps.withColumn("bucket", F.expr(f"CAST((s * {k}) div {n} AS INT)"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("price_cents").cast("bigint").alias("lo_cents"),
            F.max("price_cents").cast("bigint").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


def groupwise_ols(events: DataFrame) -> DataFrame:
    """Per-event-type ordinary least squares of value (integer cents)
    on hour-of-day — closed-form slope/intercept from the four
    classic sums, which are plain map-side-combinable integer
    aggregates: NO iterative solver, no per-group collect, one
    shuffle. slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), intercept =
    (Σy − slope·Σx)/n.

    Exactness: every sum is int64 (value in cents, hour ≤ 23), so
    aggregation order cannot wobble; the final int64→double
    conversions and the two divisions are single IEEE operations with
    identical operand values in both engines — bit-identical results
    without any rounding step. int64 headroom: n·Σxy per group tops
    out around 10^17 at a few 10^4 rows/group here; at 10^8+ rows per
    group move the sums to DECIMAL (same switch rationale as
    functions/exact_money.py)."""
    from kafka_topic_dumper_spark.functions.exact_money import cents

    xy = events.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        cents(F.col("value")).alias("y"),
    )
    agg = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_rows"),
        slope.alias("slope_cents_per_hour"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept_cents"),
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types PER USER (ordered by (ts, event_id) — the deterministic
    total order every sequence operator here uses): the
    next-action-prediction / funnel-structure statistic. One window
    shuffle keyed by user_id (lag is computed inside each user's
    partition — no global ordering anywhere), then a
    map-side-combinable count rollup over at most |types|² groups.
    The row share is the floor integer percent of the source type's
    outgoing transitions — bit-exact cross-engine."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    counts = steps.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n_transitions"))
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_out")
    )
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.expr("CAST((100 * n_transitions) div n_out AS INT)").alias(
            "share_pct"
        ),
    )


def hourly_autocorrelation(events: DataFrame) -> DataFrame:
    """Lag-1 Pearson autocorrelation of the hourly event-count series
    per event type — the burstiness/periodicity diagnostic. Adjacent
    hours pair by an EQUI-JOIN on ``h+1`` (hours with a gap simply
    contribute no pair) instead of a lag window over a globally
    ordered series — no single-partition global sort anywhere, the
    same discipline as the prefix-sum family.

    Exactness: counts are integers, so all five sums are exact int64;
    the final ``(nΣxy−ΣxΣy)/√((nΣxx−Σx²)(nΣyy−Σy²))`` is four IEEE
    operations (two int64→double conversions per operand group, one
    multiply, one CORRECTLY-ROUNDED sqrt — sqrt is an IEEE 754 basic
    operation, bit-identical everywhere — one divide) over identical
    operand values in both engines. Constant series (zero variance)
    are filtered out rather than emitting NaN (NaN never compares
    equal, in any engine)."""
    from kafka_topic_dumper_spark.functions.ntz_time import trunc_hour_ntz

    hc = events.groupBy(
        "event_type", trunc_hour_ntz("ts").alias("h")
    ).agg(F.count("*").alias("c"))
    nxt = hc.select(
        "event_type",
        F.expr("h + INTERVAL 1 HOUR").alias("h"),
        F.col("c").alias("y"),
    )
    pairs = hc.select("event_type", "h", F.col("c").alias("x")).join(
        nxt, ["event_type", "h"]
    )
    agg = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return (
        agg.filter(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_pairs"),
            (
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / F.sqrt(
                    (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    .cast("double")
                    * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                    .cast("double")
                )
            ).alias("lag1_autocorr"),
        )
    )


def gini_by_segment(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Gini coefficient of order value per market segment — the
    inequality/concentration diagnostic (is revenue dominated by a few
    whale orders?): ``G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)`` over the
    ascending-sorted values. Ranks come from a row_number PARTITIONED
    by segment (a bounded-cardinality dimension — this is a per-group
    sort, never a single-partition global window), values are exact
    integer cents with an o_orderkey tie-break, so both Σ terms are
    exact int64 and the single final division is the only IEEE
    operation — bit-exact cross-engine. int64 headroom: Σ i·x tops out
    ~10^16 here; at ~10^9 rows per segment move the sums to DECIMAL
    (functions/exact_money.py rationale)."""
    from kafka_topic_dumper_spark.functions.exact_money import cents

    # no broadcast hint: customer is SF-PROPORTIONAL (the r4/r5 policy
    # the plan lint enforces — this exact line reintroduced one and the
    # lint caught it); AQE still broadcasts from runtime stats while
    # the dimension fits
    vals = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        cents(F.col("o_totalprice")).alias("x"),
        "o_orderkey",
    )
    w = Window.partitionBy("segment").orderBy("x", "o_orderkey")
    ranked = vals.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return agg.select(
        "segment",
        F.col("n").cast("bigint").alias("n_orders"),
        (
            (
                2 * F.col("six") - (F.col("n") + 1) * F.col("sx")
            ).cast("double")
            / (F.col("n") * F.col("sx")).cast("double")
        ).alias("gini"),
    )


def hourly_ohlc(events: DataFrame) -> DataFrame:
    """OHLC (open-high-low-close) bars per (event_type, hour) — the
    time-series downsampling primitive: open/close are the first/last
    value under the deterministic (ts, event_id) total order,
    high/low plain min/max. Both row_number windows share ONE
    (event_type, hour) exchange (two sort orders over the same
    partitioning); values are exact integer cents, so every output is
    integer — nothing float anywhere. Hour truncation rides the
    timezone-independent NTZ arithmetic (functions/ntz_time.py)."""
    from kafka_topic_dumper_spark.functions.exact_money import cents
    from kafka_topic_dumper_spark.functions.ntz_time import trunc_hour_ntz

    base = events.select(
        "event_type",
        trunc_hour_ntz("ts").alias("window_start"),
        cents(F.col("value")).alias("v"),
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "window_start").orderBy(
        "ts", "event_id"
    )
    wd = Window.partitionBy("event_type", "window_start").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.withColumn("ra", F.row_number().over(wa))
        .withColumn("rd", F.row_number().over(wd))
        .groupBy("event_type", "window_start")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max(F.when(F.col("ra") == 1, F.col("v")))
            .cast("bigint")
            .alias("open_cents"),
            F.max("v").cast("bigint").alias("high_cents"),
            F.min("v").cast("bigint").alias("low_cents"),
            F.max(F.when(F.col("rd") == 1, F.col("v")))
            .cast("bigint")
            .alias("close_cents"),
        )
    )


def interarrival_quartiles(events: DataFrame) -> DataFrame:
    """Quartiles of the PER-USER inter-arrival gap (seconds) by event
    type — the activity-cadence diagnostic. Gaps come from a lag
    window PARTITIONED by (user_id, event_type) under the
    deterministic (ts, event_id) order (never a global sort); gaps are
    exact INTEGER MICROSECONDS — the native precision, so there is no
    truncate-vs-boundary-count ambiguity (Spark's
    timestampdiff(SECOND) truncates while DuckDB's
    date_diff('second') counts crossings: off by one whenever
    timestamps carry sub-second parts — found by this row's first
    differential) — and the quarter-fraction percentile interpolation
    is bit-exact cross-engine (the stats_exact_percentiles
    discipline)."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gaps = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            F.expr(
                "CAST(timestampdiff(MICROSECOND, prev_ts, ts) AS BIGINT)"
            ).alias("gap_us"),
        )
    )
    pct = F.expr("percentile(gap_us, array(0.25D, 0.50D, 0.75D))")
    return gaps.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        pct.getItem(0).alias("p25_gap_us"),
        pct.getItem(1).alias("p50_gap_us"),
        pct.getItem(2).alias("p75_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


def register(reg) -> None:
    @reg(
        "stats_interarrival_quartiles",
        """
        WITH gaps AS (
            SELECT event_type,
                   CAST(date_diff('microsecond',
                        lag(ts) OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id),
                        ts) AS BIGINT) AS gap_us
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               quantile_cont(gap_us, 0.25) AS p25_gap_us,
               quantile_cont(gap_us, 0.50) AS p50_gap_us,
               quantile_cont(gap_us, 0.75) AS p75_gap_us,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us
        FROM gaps WHERE gap_us IS NOT NULL
        GROUP BY 1
        """,
    )
    def stats_interarrival_quartiles(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-type quartiles of the per-user event inter-arrival gap
        (round 8): integer microseconds, quarter-fraction
        interpolation — bit-exact cross-engine."""
        return interarrival_quartiles(load_table(spark, sf_dir, "events"))

    @reg(
        "stats_hourly_ohlc",
        """
        WITH base AS (
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   CAST(round(value * 100, 0) AS BIGINT) AS v,
                   ts, event_id
            FROM events
        ), ranked AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY event_type, window_start
                       ORDER BY ts, event_id
                   ) AS ra,
                   row_number() OVER (
                       PARTITION BY event_type, window_start
                       ORDER BY ts DESC, event_id DESC
                   ) AS rd
            FROM base
        )
        SELECT event_type, window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(CASE WHEN ra = 1 THEN v END) AS BIGINT)
                   AS open_cents,
               CAST(max(v) AS BIGINT) AS high_cents,
               CAST(min(v) AS BIGINT) AS low_cents,
               CAST(max(CASE WHEN rd = 1 THEN v END) AS BIGINT)
                   AS close_cents
        FROM ranked GROUP BY 1, 2
        """,
    )
    def stats_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Hourly OHLC bars per event type (round 8): first/last by the
        deterministic (ts, event_id) order, all-integer outputs."""
        return hourly_ohlc(load_table(spark, sf_dir, "events"))

    @reg(
        "stats_gini_by_segment",
        """
        WITH vals AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS x,
                   o.o_orderkey
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), ranked AS (
            SELECT segment, x,
                   row_number() OVER (
                       PARTITION BY segment ORDER BY x, o_orderkey
                   ) AS i
            FROM vals
        ), agg AS (
            SELECT segment, count(*) AS n, sum(x) AS sx, sum(i * x) AS six
            FROM ranked GROUP BY 1
        )
        SELECT segment,
               CAST(n AS BIGINT) AS n_orders,
               CAST(2 * six - (n + 1) * sx AS DOUBLE)
                   / CAST(n * sx AS DOUBLE) AS gini
        FROM agg
        """,
    )
    def stats_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-segment Gini of order value (round 8): exact integer
        ranks and sums, one IEEE division — bit-identical doubles."""
        return gini_by_segment(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )

    @reg(
        "stats_hourly_autocorrelation",
        """
        WITH hc AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        ), pairs AS (
            SELECT a.event_type, a.c AS x, b.c AS y
            FROM hc a JOIN hc b
              ON a.event_type = b.event_type
             AND b.h = a.h + INTERVAL 1 HOUR
        ), agg AS (
            SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
            FROM pairs GROUP BY 1
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_pairs,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   AS lag1_autocorr
        FROM agg
        WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        """,
    )
    def stats_hourly_autocorrelation(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-type lag-1 autocorrelation of hourly event counts
        (round 8): adjacency by equi-join, exact integer sums, one
        correctly-rounded sqrt — bit-identical doubles cross-engine."""
        return hourly_autocorrelation(load_table(spark, sf_dir, "events"))

    @reg(
        "stats_event_transitions",
        """
        WITH steps AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ), counts AS (
            SELECT from_type, to_type, count(*) AS n_transitions
            FROM steps WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type,
               CAST(n_transitions AS BIGINT) AS n_transitions,
               CAST((100 * n_transitions)
                    // sum(n_transitions) OVER (PARTITION BY from_type)
                    AS INTEGER) AS share_pct
        FROM counts
        """,
    )
    def stats_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user consecutive event-type transition matrix with
        integer row shares (round 8) — one user-keyed window shuffle,
        |types|²-bounded output."""
        return event_transition_matrix(load_table(spark, sf_dir, "events"))

    @reg(
        "asof_join_last_purchase",
        """
        SELECT event_id, user_id, ts,
               last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_purchase_event_id,
               last_value(CASE WHEN event_type = 'purchase' THEN ts END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_purchase_ts
        FROM events
        """,
    )
    def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
        """As-of join: each event ↔ the same user's most recent purchase
        (sort-merge window form; equivalent to DuckDB ASOF JOIN)."""
        return asof_last_purchase(load_table(spark, sf_dir, "events"))

    @reg("stats_mad_by_type", mad_oracle_sql())
    def stats_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Median absolute deviation per event type (round 9) —
        robust dispersion, bit-exact via dyadic-fraction medians over
        quantized cents."""
        return mad_by_type(load_table(spark, sf_dir, "events"))

    @reg("stats_benford_profile", benford_oracle_sql())
    def stats_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """First-digit Benford profile of order totals (round 9) —
        the fabricated-data / unit-mixing data-quality tripwire."""
        return benford_profile(load_table(spark, sf_dir, "orders"))

    @reg("stats_cusum_changepoints", cusum_oracle_sql())
    def stats_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user CUSUM drift statistics (Page 1954) distributed via
        the prefix-sum/running-extremum identity — the sequential
        reset recursion as pure window algebra, all integer."""
        return cusum_changepoints(load_table(spark, sf_dir, "events"))

    @reg("stats_ewma_smoothing", ewma_oracle_sql())
    def stats_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user truncated binary EWMA (round 10) — the sequential
        α=1/2 smoothing recursion as one fused window of dyadic-
        weighted lags; integer-exact level and spike flag."""
        return ewma_smoothing(load_table(spark, sf_dir, "events"))

    @reg("stats_rolling_anomaly", rolling_anomaly_oracle_sql())
    def stats_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user rolling z-score anomaly flags over the preceding
        20 events (min window 8, z = 3) — integer-exact cross-
        multiplied variance test, one shuffle, bounded frame."""
        return rolling_anomaly(load_table(spark, sf_dir, "events"))

    @reg(
        "asof_join_tolerance",
        f"""
        WITH base AS (
            SELECT event_id, user_id, ts,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS lpe,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS lpt
            FROM events
        )
        SELECT event_id, user_id, ts,
               CASE WHEN lpt >= ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTES
                    THEN lpe END AS last_purchase_event_id,
               CASE WHEN lpt >= ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTES
                    THEN lpt END AS last_purchase_ts
        FROM base
        """,
    )
    def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
        """As-of join with a staleness tolerance: matches older than
        45 minutes are discarded (attribution-window semantics) —
        same one-shuffle window plan, bound applied post-window."""
        return asof_last_purchase_tolerance(load_table(spark, sf_dir, "events"))

    @reg(
        "asof_join_next_purchase",
        """
        SELECT event_id, user_id, ts,
               first_value(CASE WHEN event_type = 'purchase' THEN event_id END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_purchase_event_id,
               first_value(CASE WHEN event_type = 'purchase' THEN ts END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_purchase_ts
        FROM events
        """,
    )
    def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Forward as-of join: each event ↔ the user's next purchase
        (lookahead labeling direction)."""
        return asof_next_purchase(load_table(spark, sf_dir, "events"))

    @reg(
        "asof_join_nearest",
        """
        WITH base AS (
            SELECT event_id, user_id, ts,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS lpe,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS lpt,
                   first_value(CASE WHEN event_type = 'purchase'
                                    THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS npe,
                   first_value(CASE WHEN event_type = 'purchase'
                                    THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS npt
            FROM events
        ), chosen AS (
            SELECT *,
                   (lpt IS NOT NULL AND (npt IS NULL OR
                       date_diff('microseconds', lpt, ts)
                       <= date_diff('microseconds', ts, npt)))
                       AS take_back
            FROM base
        )
        SELECT event_id, user_id, ts,
               CASE WHEN take_back THEN lpe ELSE npe END
                   AS nearest_purchase_event_id,
               CASE WHEN take_back THEN lpt ELSE npt END
                   AS nearest_purchase_ts,
               CAST(CASE WHEN take_back
                         THEN date_diff('microseconds', lpt, ts)
                         WHEN npt IS NOT NULL
                         THEN date_diff('microseconds', ts, npt)
                    END AS BIGINT) AS gap_us
        FROM chosen
        """,
    )
    def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Nearest-match as-of join: temporally closest purchase on
        either side, backward wins ties, exact-µs gaps — one shuffle,
        both direction frames on one sort."""
        return asof_nearest_purchase(load_table(spark, sf_dir, "events"))

    @reg(
        "rollup_order_revenue",
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               coalesce(CAST(year(o_orderdate) AS INTEGER), -1) AS o_year,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY ROLLUP(o_orderpriority, CAST(year(o_orderdate) AS INTEGER))
        """,
    )
    def rollup_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ROLLUP (priority, year) revenue: group + subtotal + grand
        total in one shuffle."""
        return rollup_revenue(load_table(spark, sf_dir, "orders"))

    @reg(
        "cube_event_activity",
        """
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(isodow(ts) - 1 AS INTEGER), -1) AS dow,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY CUBE(event_type, CAST(isodow(ts) - 1 AS INTEGER))
        """,
    )
    def cube_event_activity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """CUBE (event_type, weekday) activity matrix."""
        return cube_event_activity(load_table(spark, sf_dir, "events"))

    @reg(
        "setops_customer_cohorts",
        """
        SELECT o_custkey, 'retained' AS cohort FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        UNION ALL
        SELECT o_custkey, 'churned' FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
            EXCEPT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        UNION ALL
        SELECT o_custkey, 'acquired' FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
            EXCEPT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        """,
    )
    def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
        """INTERSECT / EXCEPT / UNION customer-cohort analysis."""
        return customer_cohorts(load_table(spark, sf_dir, "orders"))

    @reg(
        "window_event_metrics",
        """
        SELECT event_id, user_id,
               lag(event_type) OVER wo AS prev_event_type,
               lead(event_id) OVER wo AS next_event_id,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS purchases_so_far,
               CAST(rank() OVER wv AS INTEGER) AS value_rank,
               CAST(ntile(4) OVER wv AS INTEGER) AS value_quartile
        FROM events
        WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
               wv AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        """,
    )
    def window_event_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """lag/lead/running-count/rank/ntile over the event stream."""
        return window_event_metrics(load_table(spark, sf_dir, "events"))

    @reg(
        "q18_large_volume_orders",
        """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM orders
        JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 250.0) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        """,
    )
    def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q18 shape: aggregate-then-join with HAVING pushdown."""
        return large_volume_orders(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "customer"),
        )

    @reg(
        "join_semi_anti_customers",
        """
        SELECT c_custkey, 'no_orders' AS tag FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, 'buyer_1995' FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
        """,
    )
    def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Anti join (customers with no orders) + semi join (1995
        buyers), tagged."""
        return customer_order_existence(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )

    @reg(
        "sessionize_events",
        """
        WITH tagged AS (
            SELECT user_id, ts, event_id, value, event_type,
                   CAST(sum(CASE WHEN prev_secs IS NULL
                                 OR floor(epoch(ts)) - prev_secs > 1800
                                 OR prev_type = 'purchase'
                            THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_id
            FROM (SELECT *,
                         lag(floor(epoch(ts))) OVER wo AS prev_secs,
                         lag(event_type) OVER wo AS prev_type
                  FROM events
                  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id))
        )
        SELECT user_id, session_id,
               min(ts) AS session_start,
               max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS sum_value,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS INTEGER) AS converted
        FROM tagged
        GROUP BY user_id, session_id
        """,
    )
    def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Conversion-terminated sessionization (30 min gap OR ends on
        purchase); batch twin of streaming/stateful.py."""
        return sessionize(load_table(spark, sf_dir, "events"))

    @reg(
        "timeseries_gap_fill",
        """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT date_trunc('hour', min(ts)) AS h0,
                   date_trunc('hour', max(ts)) AS h1
            FROM events
        ), spine AS (
            SELECT et.event_type, g.hour
            FROM (SELECT DISTINCT event_type FROM events) et
            CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                        AS hour FROM bounds) g
        )
        SELECT s.event_type, s.hour,
               CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
               last_value(h.sum_value IGNORE NULLS)
                   OVER (PARTITION BY s.event_type ORDER BY s.hour
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS carried_sum_value,
               CAST(CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END AS INTEGER)
                   AS is_gap
        FROM spine s
        LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
        """,
    )
    def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Dense hourly spine per event_type with forward-filled
        values — the hypertable gap-fill shape."""
        return gap_fill_hourly(load_table(spark, sf_dir, "events"))

    @reg(
        "cohort_retention",
        """
        WITH cohorts AS (
            -- DuckDB date_trunc('week') yields DATE; cast back to
            -- TIMESTAMP to match Spark's timestamp week column
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ), active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
            FROM events
        ), sizes AS (
            SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT)
                       AS cohort_size
            FROM cohorts GROUP BY cohort_week
        ), grid AS (
            SELECT c.cohort_week,
                   CAST(date_diff('day', c.cohort_week, a.week) // 7
                        AS INTEGER) AS week_number,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
            FROM active a JOIN cohorts c ON a.user_id = c.user_id
            GROUP BY 1, 2
        )
        SELECT g.cohort_week, g.week_number, g.n_active,
               round(g.n_active / s.cohort_size, 4) AS retention_frac
        FROM grid g JOIN sizes s ON g.cohort_week = s.cohort_week
        """,
    )
    def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Weekly signup-cohort retention matrix with fractions."""
        return cohort_retention(load_table(spark, sf_dir, "events"))

    @reg(
        "q17_small_quantity_revenue",
        """
        WITH threshold AS (
            SELECT l_partkey, 0.2 * avg(l_quantity) AS small_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0
                   AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN threshold ON threshold.l_partkey = lineitem.l_partkey
        WHERE p_brand LIKE 'Brand#1%' AND l_quantity < small_qty
        """,
    )
    def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q17 shape: correlated scalar subquery (per-part average
        quantity threshold), expressed in its decorrelated join form —
        the rewrite Catalyst itself applies. The quantity sums are
        integral-valued doubles, so the 0.2·avg threshold is exact in
        both engines. Per-part agg shuffles once; the part filter
        broadcasts."""
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_brand").startswith("Brand#1")
        )
        thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
            (F.avg("l_quantity") * 0.2).alias("small_qty")
        )
        ep_cents = cents(F.col("l_extendedprice"))
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .join(thr, li.l_partkey == thr.t_partkey)
            .filter(F.col("l_quantity") < F.col("small_qty"))
            .agg((F.sum(ep_cents) / 100.0 / 7.0).alias("avg_yearly"))
        )

    @reg(
        "q16_supplier_diversity",
        """
        SELECT p_type,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
               CAST(count(*) AS BIGINT) AS n_lineitems
        FROM part JOIN lineitem ON l_partkey = p_partkey
        GROUP BY p_type
        """,
    )
    def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q16 shape: COUNT(DISTINCT) per group after a fact⋈dim
        join — Spark plans the distinct as a two-phase expand+agg; the
        dim side broadcasts."""
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part")
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_type")
            .agg(
                F.countDistinct("l_suppkey").alias("n_suppliers"),
                F.count("*").alias("n_lineitems"),
            )
        )

    @reg(
        "window_rolling_hour",
        """
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_events_prev_hour,
               round(sum(value) OVER w, 2) AS sum_value_prev_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
    )
    def window_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Event-time RANGE window: per user, the rolling count/sum over
        the trailing hour — the range-interval frame the reference's
        offset-count windows can't express. One shuffle on user_id;
        the frame is evaluated with a sliding pointer over the sorted
        partition, not a self-join."""
        ev = load_table(spark, sf_dir, "events")
        # unique view name, dropped immediately: spark.sql resolves the
        # view at analysis time, so the returned (lazy) DataFrame stays
        # valid — and a notebook user's own "events_v" is never
        # clobbered (code-review r6)
        import uuid

        view = f"events_v_{uuid.uuid4().hex}"
        ev.createOrReplaceTempView(view)
        try:
            return spark.sql(
                f"""
                SELECT event_id, user_id, ts,
                       CAST(count(*) OVER w AS BIGINT) AS n_events_prev_hour,
                       round(sum(value) OVER w, 2) AS sum_value_prev_hour
                FROM {view}
                WINDOW w AS (PARTITION BY user_id ORDER BY ts
                             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                   AND CURRENT ROW)
                """
            )
        finally:
            spark.catalog.dropTempView(view)

    @reg(
        "embedding_corpus_stats",
        """
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), n AS (
            SELECT vec_id, len(v) AS dim,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
                   list_sum(v) / len(v) AS mean_c
            FROM v
        )
        SELECT CAST(dim AS INTEGER) AS dim,
               CAST(count(*) AS BIGINT) AS n_vectors,
               round(avg(nrm), 4) AS avg_norm,
               round(min(nrm), 4) AS min_norm,
               round(max(nrm), 4) AS max_norm,
               round(avg(mean_c), 6) AS avg_component_mean
        FROM n GROUP BY dim
        """,
    )
    def embedding_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Embedding-column hygiene stats (dimension, norm distribution,
        component mean) — the validation pass a pipeline runs before
        building an ANN index. Single scan, JVM lambda expressions, one
        tiny aggregate."""
        emb = load_table(spark, sf_dir, "embeddings")
        v = F.transform("embedding", lambda x: x.cast("double"))
        dsum = lambda arr: F.aggregate(  # noqa: E731
            arr, F.lit(0.0).cast("double"), lambda a, x: a + x
        )
        per = emb.select(
            F.size(v).alias("dim"),
            F.sqrt(dsum(F.transform(v, lambda x: x * x))).alias("nrm"),
            (dsum(v) / F.size(v)).alias("mean_c"),
        )
        return per.groupBy("dim").agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
            F.round(F.avg("mean_c"), 6).alias("avg_component_mean"),
        )

    @reg(
        "q4_order_priority_check",
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """,
    )
    def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join
        (probe-side early-out, no row multiplication) + small agg.
        (The testdata lineitem has no commit/receipt dates, so the
        correlated predicate is 'has a returned line' instead of
        'late delivery' — same plan shape.)"""
        orders = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        )
        late = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_returnflag") == "R"
        )
        return (
            orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
        )

    @reg(
        "q10_returned_items",
        """
        SELECT c_custkey, c_name,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT))
                   / 10000.0 AS revenue,
               n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
    )
    def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q10 shape: returned-item revenue per customer, top 20.
        Fact-side filters push to the scans; customer/nation
        broadcast; TakeOrdered caps the result without a global sort.

        Revenue is summed in integer cents×basis-points (prices and
        discounts are 2-decimal): an integer sum is partition-order
        independent, so the top-20 cutoff can't flip with the shuffle
        layout — float sums near a rounding boundary did exactly that
        under a different partition count. The exact integer is then
        divided by 10^4 WITHOUT rounding: an integer/constant division
        is correctly-rounded IEEE in every engine, whereas round(x, 2)
        on a ...595 boundary differs between Spark (BigDecimal of the
        shortest decimal repr, HALF_UP → .60) and DuckDB (binary
        value rounds → .59)."""
        cust = load_table(spark, sf_dir, "customer")
        nation = load_table(spark, sf_dir, "nation")
        orders = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
        ep_cents = cents(F.col("l_extendedprice"))
        bps = pct_units(1 - F.col("l_discount"))
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg((F.sum(ep_cents * bps) / 10000.0).alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20)
        )

    @reg(
        "q12_lines_priority",
        """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
        """,
    )
    def q12_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q12 shape: conditional-count aggregation after a
        filtered fact join (shipdate predicate pushes to the scan;
        returnflag stands in for shipmode, which the testdata
        lacks)."""
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            )
        )

    @reg(
        "q14_promo_revenue",
        """
        SELECT 100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(round((1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END)
               / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l_discount) * 100) AS BIGINT))
                   AS promo_revenue_pct
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        """,
    )
    def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q14 shape: conditional revenue ratio over a
        broadcast dim join — one global aggregate, no shuffle beyond
        the final combine."""
        part = load_table(spark, sf_dir, "part")
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        units = cents(F.col("l_extendedprice")) * pct_units(1 - F.col("l_discount"))
        promo = F.when(F.col("p_type").like("PROMO%"), units).otherwise(F.lit(0))
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .agg(
                (F.lit(100.0) * F.sum(promo) / F.sum(units)).alias(
                    "promo_revenue_pct"
                )
            )
        )

    @reg(
        "q6_forecast_revenue",
        """
        SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0
                   AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
    )
    def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q6 shape: pure filter + global aggregate — every
        predicate pushes to the parquet scan (row-group stats prune
        whole chunks); integer-exact revenue sum."""
        li = load_table(spark, sf_dir, "lineitem")
        ep_cents = cents(F.col("l_extendedprice"))
        d_bps = pct_units(F.col("l_discount"))
        return (
            li.filter(
                (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("l_discount") >= 0.05)
                & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24)
            )
            .agg((F.sum(ep_cents * d_bps) / 10000.0).alias("revenue"))
        )

    @reg(
        "q19_disjunctive_predicates",
        """
        SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0
                   AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30))
        """,
    )
    def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q19 shape: OR-of-ANDs across both join sides.
        Catalyst extracts the common single-side conjuncts from the
        disjunction and pushes them below the join (p_brand IN (...),
        l_quantity range) so both scans prune before the broadcast
        join; the full disjunction evaluates as the join residual."""
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part")
        joined = li.join(part, li.l_partkey == part.p_partkey)
        arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )
        ep_cents = cents(F.col("l_extendedprice"))
        bps = pct_units(1 - F.col("l_discount"))
        return (
            joined.filter(
                arm("Brand#12", 15, 1, 11)
                | arm("Brand#23", 25, 10, 20)
                | arm("Brand#34", 35, 20, 30)
            )
            .agg(
                (F.sum(ep_cents * bps) / 10000.0).alias("revenue"),
                F.count("*").alias("n_lines"),
            )
        )

    @reg(
        "window_distribution_metrics",
        """
        SELECT event_id, user_id,
               round(percent_rank() OVER wv, 6) AS value_pct_rank,
               round(cume_dist() OVER wv, 6) AS value_cume_dist,
               first_value(event_id) OVER wo AS first_event_id,
               nth_value(event_id, 2) OVER wo AS second_event_id
        FROM events
        WINDOW wv AS (PARTITION BY user_id ORDER BY value, event_id),
               wo AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
    )
    def window_distribution_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Distribution window functions: percent_rank/cume_dist (exact
        integer-ratio doubles — identical across engines) plus
        first/nth value over the event-time order."""
        ev = load_table(spark, sf_dir, "events")
        wv = Window.partitionBy("user_id").orderBy("value", "event_id")
        wo = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return ev.select(
            "event_id",
            "user_id",
            F.round(F.percent_rank().over(wv), 6).alias("value_pct_rank"),
            F.round(F.cume_dist().over(wv), 6).alias("value_cume_dist"),
            F.first("event_id").over(wo).alias("first_event_id"),
            F.nth_value("event_id", 2).over(wo).alias("second_event_id"),
        )

    @reg(
        "q2_cheapest_supplier",
        """
        SELECT l_partkey,
               min(l_extendedprice) AS min_price,
               arg_min(l_suppkey,
                       CAST(round(l_extendedprice * 100) AS BIGINT) * 1048576
                       + l_suppkey) AS cheapest_suppkey
        FROM lineitem
        GROUP BY l_partkey
        """,
    )
    def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q2 shape: argmin per group (cheapest supplier per
        part) via min_by — partial-aggregatable, one shuffle; no
        join-back or window needed. The deterministic tie-break packs
        (price_cents, suppkey) into one BIGINT (suppkey < 2^20 at
        these scales; DuckDB's arg_min cannot order by struct)."""
        li = load_table(spark, sf_dir, "lineitem")
        packed = cents(F.col("l_extendedprice")) * F.lit(1048576) + F.col("l_suppkey")
        return li.groupBy("l_partkey").agg(
            F.min("l_extendedprice").alias("min_price"),
            F.min_by("l_suppkey", packed).alias("cheapest_suppkey"),
        )

    @reg(
        "funnel_conversion",
        """
        WITH stage1 AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), stage2 AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN stage1 s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.t_view
            GROUP BY e.user_id
        ), stage3 AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN stage2 s ON e.user_id = s.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= s.t_click
            GROUP BY e.user_id
        )
        SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
               CAST(CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS converted
        FROM stage1 s1
        LEFT JOIN stage2 s2 ON s2.user_id = s1.user_id
        LEFT JOIN stage3 s3 ON s3.user_id = s1.user_id
        """,
    )
    def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Ordered funnel (view → click → purchase): each stage's first
        event must follow the previous stage's.

        One fact scan, one shuffle (r3 rewrite — the r2 form ran three
        filtered aggregate+join stages, i.e. three event scans): the
        stage times are CHAINED window minima over a single user_id
        partitioning — t_view = min(view ts), then t_click = min(click
        ts ≥ t_view), then t_purchase = min(purchase ts ≥ t_click).
        Each conditional min is a separate select, so the three
        WindowExec nodes stack on ONE exchange, and the final per-user
        collapse is a partial-agg groupBy on the same partitioning (no
        new shuffle). A comparison against a NULL prior stage yields
        NULL, which the conditional min ignores — exactly the oracle's
        join-on-prior-stage semantics."""
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("view", "click", "purchase"))
            .select("user_id", "event_type", "ts")
        )
        w = Window.partitionBy("user_id")

        def stage_min(etype: str, after) -> Column:
            cond = F.col("event_type") == etype
            if after is not None:
                cond = cond & (F.col("ts") >= F.col(after))
            return F.min(F.when(cond, F.col("ts"))).over(w)

        staged = (
            ev.withColumn("t_view", stage_min("view", None))
            .withColumn("t_click", stage_min("click", "t_view"))
            .withColumn("t_purchase", stage_min("purchase", "t_click"))
        )
        return (
            staged.groupBy("user_id")
            .agg(
                F.min("t_view").alias("t_view"),
                F.min("t_click").alias("t_click"),
                F.min("t_purchase").alias("t_purchase"),
            )
            .filter(F.col("t_view").isNotNull())
            .withColumn(
                "converted", F.col("t_purchase").isNotNull().cast("int")
            )
        )

    @reg(
        "pivot_user_event_matrix",
        """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS view
        FROM events GROUP BY user_id
        """,
    )
    def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """PIVOT: per-user event-type count matrix. The explicit value
        list keeps the output schema static (no extra pass to discover
        pivot values) — at scale pivot compiles to exactly the CASE-sum
        aggregate the oracle spells out, one shuffle."""
        ev = load_table(spark, sf_dir, "events")
        piv = (
            ev.groupBy("user_id")
            .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
            .count()
        )
        return piv.select(
            "user_id",
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in ["click", "error", "purchase", "signup", "view"]
            ],
        )

    @reg(
        "stats_key_skew_profile",
        """
        WITH counts AS (
            SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        ), tot AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(cnt) AS BIGINT) AS max_cnt
            FROM counts
        )
        SELECT key, cnt,
               round(cnt * 1.0 / total, 6) AS pct_of_total,
               round(max_cnt * 1.0 * n_keys / total, 4) AS skew_factor
        FROM counts CROSS JOIN tot
        ORDER BY cnt DESC, key
        LIMIT 10
        """,
    )
    def stats_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Join-key skew diagnostics: the top-10 heaviest keys with
        their share of rows, plus the corpus skew factor
        (max-key-count / mean-key-count). This is the profile you run
        BEFORE a big join to decide between plain shuffle, broadcast,
        salting, or AQE skew handling; one partial-agg shuffle on the
        key, a 1-row global aggregate broadcast back, top-10 via
        TakeOrdered — never a full sort."""
        li = load_table(spark, sf_dir, "lineitem")
        counts = li.groupBy(F.col("l_partkey").alias("key")).agg(
            F.count("*").alias("cnt")
        )
        tot = counts.agg(
            F.sum("cnt").alias("total"),
            F.count("*").alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
        )
        return (
            counts.join(F.broadcast(tot))
            .select(
                "key",
                "cnt",
                F.round(F.col("cnt") * 1.0 / F.col("total"), 6).alias("pct_of_total"),
                F.round(
                    F.col("max_cnt") * 1.0 * F.col("n_keys") / F.col("total"), 4
                ).alias("skew_factor"),
            )
            .orderBy(F.col("cnt").desc(), "key")
            .limit(10)
        )

    @reg(
        "stats_value_histogram",
        """
        WITH b AS (
            SELECT min(value) AS lo, max(value) AS hi FROM events
        )
        SELECT CAST(least(floor((value - lo) / (hi - lo) * 20), 19)
                    AS INTEGER) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               round(min(value), 4) AS bucket_min,
               round(max(value), 4) AS bucket_max
        FROM events CROSS JOIN b
        GROUP BY 1
        """,
    )
    def stats_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Equal-width 20-bucket histogram of events.value. The bounds
        are a 1-row aggregate broadcast into the bucketing scan; the
        bucket arithmetic is the same IEEE expression on both engines
        so assignments match exactly. One shuffle (the 20-row group)."""
        ev = load_table(spark, sf_dir, "events")
        b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        return (
            ev.join(F.broadcast(b))
            .groupBy(
                F.least(
                    F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 20),
                    F.lit(19),
                )
                .cast("int")
                .alias("bucket")
            )
            .agg(
                F.count("*").alias("n"),
                F.round(F.min("value"), 4).alias("bucket_min"),
                F.round(F.max("value"), 4).alias("bucket_max"),
            )
        )

    @reg(
        "stats_numeric_profile",
        """
        SELECT event_type,
               round(stddev_samp(value), 4) AS value_stddev,
               round(var_samp(value), 4) AS value_var,
               round(corr(value, CAST(json_extract_string(props, '$.k')
                                      AS BIGINT)), 4) AS corr_value_k,
               round(covar_samp(value, CAST(json_extract_string(props, '$.k')
                                            AS BIGINT)), 4) AS covar_value_k
        FROM events GROUP BY event_type
        """,
    )
    def stats_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Statistical aggregate surface: sample stddev/variance,
        correlation, covariance per group — single-pass (Welford-style
        merge) partial aggregation, one shuffle."""
        ev = load_table(spark, sf_dir, "events")
        k = F.get_json_object("props", "$.k").cast("bigint")
        return ev.groupBy("event_type").agg(
            F.round(F.stddev_samp("value"), 4).alias("value_stddev"),
            F.round(F.var_samp("value"), 4).alias("value_var"),
            F.round(F.corr(F.col("value"), k), 4).alias("corr_value_k"),
            F.round(F.covar_samp(F.col("value"), k), 4).alias("covar_value_k"),
        )

    @reg(
        "join_range_interval",
        """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(count(e.event_id) AS BIGINT) AS n_events_week_after
        FROM orders o
        LEFT JOIN events e
          ON e.user_id = o.o_custkey
         AND e.ts >= o.o_orderdate
         AND e.ts < o.o_orderdate + INTERVAL 7 DAY
        WHERE o.o_custkey < 150
        GROUP BY o_orderkey, o_custkey, o_orderdate
        """,
    )
    def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Interval/range join: events landing in the week after each
        order by the same customer. The equi-key (user = custkey)
        carries the shuffle; the interval predicate evaluates inside
        the hash-join probe, so this is NOT a cross product — the plan
        is an ordinary shuffled/broadcast hash join with a residual
        range filter."""
        orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150)
        ev = load_table(spark, sf_dir, "events")
        cond = (
            (ev.user_id == orders.o_custkey)
            & (ev.ts >= orders.o_orderdate)
            & (ev.ts < orders.o_orderdate + F.expr("INTERVAL 7 DAYS"))
        )
        return (
            orders.join(ev, cond, "left")
            .groupBy("o_orderkey", "o_custkey", "o_orderdate")
            .agg(F.count(ev.event_id).alias("n_events_week_after"))
        )

    @reg(
        "join_full_outer_reconcile",
        """
        SELECT coalesce(c.c_custkey, e.user_id) AS entity_id,
               CASE WHEN c.c_custkey IS NULL THEN 'activity_only'
                    WHEN e.user_id IS NULL THEN 'customer_only'
                    ELSE 'both' END AS presence,
               c.c_name,
               e.n_events
        FROM customer c
        FULL OUTER JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
                         FROM events GROUP BY user_id) e
          ON c.c_custkey = e.user_id
        """,
    )
    def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """FULL OUTER reconciliation: customer master vs event activity,
        tagging rows present on only one side — the data-quality join
        every ingestion pipeline runs. Aggregate-then-join keeps the
        outer join at one row per entity."""
        cust = load_table(spark, sf_dir, "customer")
        ev = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
        )
        joined = cust.join(ev, cust.c_custkey == ev.user_id, "full_outer")
        return joined.select(
            F.coalesce(cust.c_custkey, ev.user_id).alias("entity_id"),
            F.when(cust.c_custkey.isNull(), "activity_only")
            .when(ev.user_id.isNull(), "customer_only")
            .otherwise("both")
            .alias("presence"),
            cust.c_name,
            ev.n_events,
        )

    @reg(
        "approx_aggregates",
        """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
               true AS hll_within_5pct,
               round(quantile_cont(value, 0.5), 2) AS p50_exact,
               true AS p50_within_5pct
        FROM events GROUP BY event_type
        """,
    )
    def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sketch-based aggregates — the 100 TB path where exact
        distinct/percentile is too expensive. Sketches differ across
        engines, so the differential contract is the ERROR BOUND: the
        query outputs exact values (oracle-matched) plus booleans
        asserting the HLL estimate and approx-percentile land within
        5% — the oracle emits literal true, so a sketch drifting out
        of tolerance fails the hash check."""
        ev = load_table(spark, sf_dir, "events")
        agg = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_hll"),
            F.expr("percentile(value, 0.5)").alias("p50e"),
            F.expr("approx_percentile(value, 0.5, 10000)").alias("p50a"),
        )
        # multiplication form, not division: exact == 0 demands approx
        # == 0 instead of NULL, and a negative exact can't make the
        # check vacuously true (code-review r6)
        ok = lambda a, e: F.abs(F.col(a) - F.col(e)) <= 0.05 * F.abs(F.col(e))  # noqa: E731
        return agg.select(
            "event_type",
            "n_users_exact",
            ok("n_users_hll", "n_users_exact").alias("hll_within_5pct"),
            F.round("p50e", 2).alias("p50_exact"),
            ok("p50a", "p50e").alias("p50_within_5pct"),
        )

    @reg(
        "join_salted_skew",
        """
        SELECT o_orderkey, o_totalprice, c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
        """,
    )
    def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Salted skew join: orders⋈customer with an 8-way salt. The
        oracle is the PLAIN join — proving the salting transformation
        is semantics-preserving while spreading any hot key over 8
        reducers."""
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        return salted_join(orders, cust, "o_custkey", "c_custkey").select(
            "o_orderkey", "o_totalprice", "c_name"
        )

    @reg(
        "stats_equidepth_histogram",
        f"""
        WITH v AS (
            SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       AS price_cents,
                   o_orderkey
            FROM orders
        ), r AS (
            SELECT price_cents,
                   row_number() OVER (ORDER BY price_cents, o_orderkey) - 1
                       AS s,
                   count(*) OVER () AS n
            FROM v
        )
        SELECT CAST((s * {EQUIDEPTH_K}) // n AS INTEGER) AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(price_cents) AS BIGINT) AS lo_cents,
               CAST(max(price_cents) AS BIGINT) AS hi_cents
        FROM r GROUP BY 1
        """,
    )
    def stats_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact 16-bucket equi-depth histogram of order value via the
        distributed prefix-sum ranking (round 8); the oracle replays
        the identical integer fill rule over a serial row_number."""
        return equidepth_histogram(load_table(spark, sf_dir, "orders"))

    @reg(
        "stats_groupwise_ols",
        """
        WITH xy AS (
            SELECT event_type,
                   CAST(hour(ts) AS BIGINT) AS x,
                   CAST(round(value * 100, 0) AS BIGINT) AS y
            FROM events
        ), agg AS (
            SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM xy GROUP BY 1
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_rows,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)
                   AS slope_cents_per_hour,
               (CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                  * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept_cents
        FROM agg
        """,
    )
    def stats_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Closed-form per-group OLS of value-cents on hour-of-day
        (round 8): four integer sums, one shuffle, bit-identical
        doubles from single IEEE operations."""
        return groupwise_ols(load_table(spark, sf_dir, "events"))

    @reg(
        "stats_exact_percentiles",
        """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25_qty,
               quantile_cont(l_quantity, 0.50) AS p50_qty,
               quantile_cont(l_quantity, 0.75) AS p75_qty,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
        """,
    )
    def stats_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
        """EXACT quartiles per group (complement of approx_aggregates'
        sketch percentiles). Spark's percentile() and DuckDB's
        quantile_cont() both linearly interpolate at position
        f·(n−1); with integral-valued quantities and quarter
        fractions (2^-2), every interpolation term is an exact binary
        double, so the engines agree bit-for-bit — arbitrary fractions
        over non-integral data would NOT be cross-engine-stable.
        Exact percentile is a full-sort-per-group aggregate: fine for
        bounded group counts; at 100 TB over high-cardinality groups
        use approx_percentile (the approx_aggregates query) instead."""
        li = load_table(spark, sf_dir, "lineitem")
        pct = F.expr("percentile(l_quantity, array(0.25D, 0.50D, 0.75D))")
        return (
            li.groupBy("l_returnflag")
            .agg(
                pct.alias("pcts"),
                F.min("l_quantity").alias("min_qty"),
                F.max("l_quantity").alias("max_qty"),
                F.count("*").alias("n_rows"),
            )
            .select(
                "l_returnflag",
                F.col("pcts")[0].alias("p25_qty"),
                F.col("pcts")[1].alias("p50_qty"),
                F.col("pcts")[2].alias("p75_qty"),
                "min_qty",
                "max_qty",
                "n_rows",
            )
        )

    @reg(
        "merge_upsert_customers",
        """
        WITH base AS (
            SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
        ), upd AS (
            SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal
            FROM customer WHERE c_custkey % 97 = 0
        )
        SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
               coalesce(u.c_name, b.c_name) AS c_name,
               coalesce(u.c_nationkey, b.c_nationkey) AS c_nationkey,
               round(coalesce(u.c_acctbal, b.c_acctbal), 2) AS c_acctbal
        FROM base b FULL OUTER JOIN upd u ON u.c_custkey = b.c_custkey
        """,
    )
    def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MERGE INTO semantics as a relational op: a deterministic
        update set (every 10th customer re-balanced, every 97th
        re-keyed as an insert) merged into the customer base — updates
        replace, inserts append, untouched rows survive."""
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal"
        )
        updates = (
            cust.where(F.col("c_custkey") % 10 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 100)
            .unionByName(
                cust.where(F.col("c_custkey") % 97 == 0).withColumn(
                    "c_custkey", F.col("c_custkey") + 1000000
                )
            )
        )
        return merge_upsert(cust, updates, "c_custkey").withColumn(
            "c_acctbal", F.round("c_acctbal", 2)
        )

    @reg(
        "scd2_user_event_history",
        """
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS INTEGER) AS is_current,
               event_type
        FROM events
        """,
    )
    def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SCD type-2 validity intervals over each user's event stream
        — lead() per key with a (ts, event_id) total order."""
        return scd2_intervals(
            load_table(spark, sf_dir, "events"),
            "user_id",
            ["ts", "event_id"],
            "ts",
            ["event_type"],
        )

    @reg(
        "grouping_sets_order_matrix",
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                    AS INTEGER) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                   AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
        """,
    )
    def grouping_sets_order_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Arbitrary GROUPING SETS (completing the grouping surface
        beyond rollup/cube): the two single-key marginals plus the
        full cross — one Expand + one shuffle, same as rollup; the
        grouping() bitvector disambiguates subtotal rows from real
        'ALL' values. total_price follows the repo's integer-cents
        discipline (exact_money.py): a float sum over the ~3000-row
        marginal groups accumulates enough ulp error (~n·eps·sum) to
        flip a round(…, 2) boundary under a different partition
        layout, so the sum is an exact bigint divided once."""
        orders = load_table(spark, sf_dir, "orders")
        import uuid

        view = f"orders_gs_v_{uuid.uuid4().hex}"
        orders.createOrReplaceTempView(view)
        try:
            return spark.sql(
                f"""
                SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                       CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                            AS INT) AS gid,
                       count(*) AS n_orders,
                       -- 100.0D: Spark SQL parses a bare 100.0 as DECIMAL,
                       -- which would make the division DECIMAL, not DOUBLE
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0D
                           AS total_price
                FROM {view}
                GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                        (o_orderpriority), (o_orderstatus))
                """
            )
        finally:
            spark.catalog.dropTempView(view)


def merge_upsert(base, updates, key: str):
    """Keyed MERGE (upsert): rows from ``updates`` replace same-key
    rows in ``base``; unmatched base rows survive, unmatched update
    rows insert. The warehouse write-side primitive (Delta/Iceberg
    MERGE INTO) expressed as its read-side relational equivalent —
    a full-outer coalesce on the key.

    Scale shape: one hash-shuffle join on the key; at 100 TB the base
    side is the big one and the join is shuffle-hash or sort-merge by
    stats (no broadcast hint by repo policy — updates are often small
    but not BOUNDED; the planner broadcasts when stats allow)."""
    b = base.alias("b")
    u = updates.alias("u")
    cols = base.columns
    # row presence (the update KEY) decides which side wins, not a
    # per-column coalesce: MERGE must be able to apply an update whose
    # non-key column is NULL (coalesce would silently resurrect the
    # base value — code-review r6). NULL-key update rows match nothing
    # and insert, the same as SQL MERGE's unmatched-source branch.
    matched = F.col(f"u.{key}").isNotNull()
    return b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer").select(
        *[
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
            for c in cols
        ]
    )


def scd2_intervals(
    events, key: str, order_cols: list[str], ts_col: str, attrs: list[str]
):
    """Slowly-changing-dimension type-2 history: each key's change
    stream becomes validity intervals [valid_from, valid_to) with
    valid_to = the next change's timestamp (NULL for the current row)
    — one lead() window per key, the classic SCD2 build. ``order_cols``
    must be a total order (include a unique tiebreaker) or lead() is
    nondeterministic.

    Scale shape: one shuffle on the key; each window is bounded by a
    key's history length, never the corpus."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    return events.select(
        key,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        (F.lead(ts_col).over(w).isNull()).cast("integer").alias("is_current"),
        *attrs,
    )
