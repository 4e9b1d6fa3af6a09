"""Bucketing: pre-shuffling a table on its join key at write time so
subsequent joins need NO exchange — the co-located-join strategy for
repeatedly-joined 100 TB fact tables. The test asserts the physical
plan property itself: a bucketed⋈bucketed join on the bucket key plans
with zero shuffle exchanges on the bucketed sides."""

from __future__ import annotations

import pytest

from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the session's warehouse dir (static conf);
    # DROP TABLE below removes the data again
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        load_table(spark, SF, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        load_table(spark, SF, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_eliminates_shuffle(spark, bucketed_tables):
    # disable broadcast so the join would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        orders = spark.table("orders_bucketed")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not introduce a shuffle: the only
        # allowed exchange is the one for the final groupBy
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in join_section, join_section
        # and the result is still correct
        li_plain = load_table(spark, SF, "lineitem")
        orders_plain = load_table(spark, SF, "orders")
        expected = li_plain.join(
            orders_plain, li_plain.l_orderkey == orders_plain.o_orderkey
        ).count()
        assert joined.agg({"count": "sum"}).collect()[0][0] == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
