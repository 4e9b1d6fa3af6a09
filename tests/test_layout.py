"""Layout sink: partition pruning and file-count discipline are the
write-side 100 TB requirements — asserted on the reader's physical
plan and the produced file tree."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kafka_topic_dumper_spark.sinks.layout import read_layout, write_layout
from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partition_pruning_and_file_counts(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_layout(docs, path, ["lang"], sort_cols=["doc_id"])

    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    # one directory per lang, one file per partition value (no
    # tasks×partitions small-file explosion)
    for lang in langs:
        files = glob.glob(os.path.join(path, f"lang={lang}", "*.parquet"))
        assert len(files) == 1, f"lang={lang}: {len(files)} files"

    back = read_layout(spark, path)
    assert back.count() == docs.count()

    # a lang filter must prune at the DIRECTORY level: the scan's
    # partition filters carry it, and the data filters do not re-check
    plan = (
        back.filter(F.col("lang") == langs[0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    import re

    section = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert re.search(rf"\(lang#\d+ = {langs[0]}\)", section), section

    # row values survive the round trip
    a = sorted(
        map(tuple, docs.filter(F.col("lang") == langs[0]).select("doc_id", "text").collect())
    )
    b = sorted(
        map(tuple, back.filter(F.col("lang") == langs[0]).select("doc_id", "text").collect())
    )
    assert a == b


def test_sorted_within_files_for_rowgroup_skipping(spark, tmp_path):
    import pyarrow.parquet as pq

    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_type")
    write_layout(events, path, ["event_type"], sort_cols=["user_id"])
    f = glob.glob(os.path.join(path, "event_type=*", "*.parquet"))[0]
    col = pq.read_table(f, columns=["user_id"])["user_id"].to_pylist()
    assert col == sorted(col)  # min/max stats are selective iff sorted


def _file_envelopes(path_glob: str, user_col: str = "user_id", ts_col: str = "ts"):
    """Per-file (min,max) envelopes for the two z-order dimensions,
    straight from parquet footer stats — what a scan planner prunes on."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        iu, it = names.index(user_col), names.index(ts_col)
        umin = umax = tmin = tmax = None
        for rg in range(md.num_row_groups):
            su = md.row_group(rg).column(iu).statistics
            st = md.row_group(rg).column(it).statistics
            umin = su.min if umin is None else min(umin, su.min)
            umax = su.max if umax is None else max(umax, su.max)
            tmin = st.min if tmin is None else min(tmin, st.min)
            tmax = st.max if tmax is None else max(tmax, st.max)
        out.append((umin, umax, tmin, tmax))
    return out


def test_zorder_write_prunes_2d_predicates(spark, tmp_path):
    """The point of the Morton layout, MEASURED: for a user-range
    predicate, a time-sorted layout leaves every file a candidate
    (each file spans the full user range) while the z-ordered layout's
    file envelopes exclude most files — and the data is identical."""
    from kafka_topic_dumper_spark.operators.layout import write_zordered

    # sf0.01: 150 distinct users — enough dimension cardinality for the
    # file envelopes to resolve (sf0.001's 15 users quantize too coarsely)
    events = load_table(spark, "/root/testdata/sf0.01", "events")
    zpath = str(tmp_path / "events_z")
    tpath = str(tmp_path / "events_t")
    # repartitionByRange picks boundaries from a SAMPLE whose seed
    # varies with session history (RDD id), so boundary luck — not the
    # layout — can cost a few files and flake the threshold when the
    # full suite runs first. Sampling 10k rows/partition covers the
    # 10k-row table: boundaries become exact quantiles, and the test
    # measures the LAYOUT, deterministically.
    prev = spark.conf.get("spark.sql.execution.rangeExchange.sampleSizePerPartition", None)
    spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", "10000")
    try:
        write_zordered(events, zpath, n_files=16)
        (
            events.repartitionByRange(16, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(tpath)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.rangeExchange.sampleSizePerPartition")
        else:
            spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", prev)

    # identical contents either way
    za = spark.read.parquet(zpath)
    assert za.count() == events.count()
    assert (
        sorted(r.event_id for r in za.select("event_id").collect())
        == sorted(r.event_id for r in events.select("event_id").collect())
    )

    lo, hi = 10, 20  # selective: 11 of the ~150 sf0.01 users
    z_env = _file_envelopes(os.path.join(zpath, "*.parquet"))
    t_env = _file_envelopes(os.path.join(tpath, "*.parquet"))
    z_hit = sum(1 for (umin, umax, _, _) in z_env if not (umax < lo or umin > hi))
    t_hit = sum(1 for (umin, umax, _, _) in t_env if not (umax < lo or umin > hi))
    assert t_hit == len(t_env), "time layout: every file spans the user range"
    # normalized 16-bit dims: users 10..20 (of ~150) pin the top
    # three x bits to 0, excluding ~3/4+ of the 16 z-range files
    # (sampling of the range boundaries costs a file or two)
    assert z_hit < t_hit / 2, (z_hit, t_hit)


def test_zorder_key_matches_reference_bit_interleave(spark):
    """The straight-line SQL interleave equals a python-computed Morton
    key on a sample (pure integer semantics, engine-independent)."""
    from kafka_topic_dumper_spark.operators.layout import zorder_key

    # deterministic subset: an unordered limit(64) may pick different
    # rows on each of the two evaluations below (zorder_key + join)
    events = load_table(spark, SF, "events").filter("event_id < 64")
    rows = zorder_key(events).join(events.select("event_id", "ts"), "event_id").collect()
    import calendar

    hours = {r.event_id: calendar.timegm(r.ts.timetuple()) // 3600 for r in rows}
    xmin, xmax = min(r.user_id for r in rows), max(r.user_id for r in rows)
    ymin, ymax = min(hours.values()), max(hours.values())
    for r in rows:
        x = (r.user_id - xmin) * 0xFFFF // max(xmax - xmin, 1)
        y = (hours[r.event_id] - ymin) * 0xFFFF // max(ymax - ymin, 1)
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        assert r.zval == z, (r.event_id, r.zval, z)


def test_compact_small_files_preserves_rows(spark, tmp_path):
    """Many tiny files in, byte-sized files out, identical rows, no
    leftover swap dirs."""
    import os

    from kafka_topic_dumper_spark.sinks.layout import _parquet_files, compact

    path = str(tmp_path / "small_files")
    ev = load_table(spark, SF, "events")
    # simulate micro-batch output: 32 splits of 1000 rows
    ev.repartition(32).write.mode("overwrite").parquet(path)

    total = sum(os.path.getsize(f) for f in _parquet_files(path))
    before, after = compact(spark, path, target_bytes_per_file=total // 2 + 1)
    assert before >= 32
    assert after == 2
    back = spark.read.parquet(path)
    assert sorted(r.event_id for r in back.collect()) == sorted(
        r.event_id for r in ev.collect()
    )
    assert not os.path.exists(path + "._compacting")
    assert not os.path.exists(path + "._old")


def test_compact_preserves_partitioned_layout_under_later_writes(spark, tmp_path):
    """The review-r6 failure case, now pinned: compacting a
    hive-partitioned table (the per-batch ingest dirs) must re-emit the
    SAME partition layout, so rows stay visible when a writer adds the
    next key=value dir afterwards."""
    import glob
    import os

    from pyspark.sql import functions as F

    from kafka_topic_dumper_spark.sinks.layout import compact

    path = str(tmp_path / "batched")
    ev = load_table(spark, SF, "events").withColumn(
        "ingest_batch", (F.col("event_id") % 3).cast("int")
    )
    # 3 partition dirs x several files each
    ev.repartition(8).write.mode("overwrite").partitionBy("ingest_batch").parquet(path)

    before, after = compact(spark, path)
    assert after < before
    # layout preserved: still key=value dirs, no flat files at the root
    assert glob.glob(os.path.join(path, "ingest_batch=*"))
    assert not glob.glob(os.path.join(path, "*.parquet"))

    # a later micro-batch adds a NEW partition dir — every compacted
    # row must remain visible to partition discovery
    extra = load_table(spark, SF, "events").limit(10).withColumn(
        "ingest_batch", F.lit(99).cast("int")
    )
    extra.write.mode("overwrite").parquet(os.path.join(path, "ingest_batch=99"))
    assert spark.read.parquet(path).count() == 1000 + 10


def test_zorder_key_survives_snowflake_scale_id_domain(spark, duck):
    """Wide id domains (range > ~1.4e14) used to overflow the bigint
    (value - min) * 65535 multiply — ANSI Spark raised, a narrower
    oracle silently wrapped (ADVICE r6). The 128-bit widening
    (DECIMAL(38,0) div / HUGEINT //) must agree cross-engine at the
    extremes of the bigint domain."""
    from kafka_topic_dumper_spark.operators.layout import zorder_key

    rows = [
        (1, -9_000_000_000_000_000_000, "2024-01-01 00:00:00"),
        (2, -1_234_567, "2024-03-01 07:30:00"),
        (3, 42, "2024-06-15 12:00:00"),
        (4, 5_000_000_000_000_000_000, "2024-09-30 23:59:59"),
        (5, 9_000_000_000_000_000_000, "2024-12-31 18:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {r.event_id: r.zval for r in zorder_key(df).collect()}

    from kafka_topic_dumper_spark.operators.layout import zorder_oracle_sql

    duck.sql("CREATE OR REPLACE TEMP VIEW wide_events AS SELECT * FROM (VALUES "
             + ", ".join(f"({e}, {u}, TIMESTAMP '{t}')" for e, u, t in rows)
             + ") AS t(event_id, user_id, ts)")
    sql = zorder_oracle_sql().replace("FROM events", "FROM wide_events")
    want = {e: z for e, _, z in duck.sql(sql).fetchall()}
    assert got == want
    assert len(set(got.values())) == len(got)


def test_compact_aborts_on_concurrent_writer_and_keeps_table(spark, tmp_path):
    """The publish gate (ADVICE r6): a file committed between compact's
    read and its swap must abort the compaction with the table
    untouched — not vanish in the rename swap."""
    import pytest

    from kafka_topic_dumper_spark import sinks
    from kafka_topic_dumper_spark.sinks import layout as sink_layout

    path = str(tmp_path / "tbl")
    spark.range(100).withColumn("v", F.col("id") * 2).repartition(4).write.parquet(path)
    files0 = sorted(sink_layout._parquet_files(path))

    # simulate a writer racing the rewrite: drop a new commit into the
    # table right after compact's initial listing, by intercepting the
    # first re-listing through a patched _parquet_files
    real = sink_layout._parquet_files
    state = {"injected": False}

    def racing(p):
        out = real(p)
        if not state["injected"] and p == path:
            state["injected"] = True
            spark.range(5).withColumn("v", F.col("id")).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        return out

    sink_layout._parquet_files = racing
    try:
        with pytest.raises(RuntimeError, match="concurrent writer"):
            sink_layout.compact(spark, path)
    finally:
        sink_layout._parquet_files = real

    # table intact: original files still present, no half-published tmp
    import os

    assert set(files0) <= set(sorted(sink_layout._parquet_files(path)))
    assert not os.path.exists(path + "._compacting")
    assert spark.read.parquet(path).count() == 105


def test_hilbert_key_matches_classic_walk_and_beats_zorder_seams(spark):
    """(a) The unrolled branch-free Spark expression chain equals the
    classic iterative xy2d walk, replayed in pure Python on the same
    min/max-normalized coordinates, row for row. (b) The curve
    property that justifies the operator: consecutive Hilbert keys are
    always grid-adjacent, while Morton keys jump at power-of-two
    seams."""
    import datetime as dt

    from kafka_topic_dumper_spark.operators.layout import (
        Z_BITS,
        _Z_MAX,
        hilbert_key,
        xy2d_hilbert,
    )

    events = load_table(spark, SF, "events")
    got = {r.event_id: r.hval for r in hilbert_key(events).collect()}

    rows = [
        (r.event_id, r.user_id, r.ts)
        for r in events.select("event_id", "user_id", "ts").collect()
    ]
    epoch = dt.datetime(1970, 1, 1)
    yh = {e: int((ts - epoch).total_seconds() // 3600) for e, _, ts in rows}
    xs = [u for _, u, _ in rows]
    ys = list(yh.values())
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)
    for e, u, ts in rows:
        hx = (u - xmin) * _Z_MAX // max(xmax - xmin, 1)
        hy = (yh[e] - ymin) * _Z_MAX // max(ymax - ymin, 1)
        assert got[e] == xy2d_hilbert(hx, hy, Z_BITS), e

    # the locality claim, exhaustively on a 6-bit grid
    n = 64
    cells = {xy2d_hilbert(x, y, 6): (x, y) for x in range(n) for y in range(n)}
    assert sorted(cells) == list(range(n * n))
    assert all(
        abs(cells[d][0] - cells[d + 1][0]) + abs(cells[d][1] - cells[d + 1][1]) == 1
        for d in range(n * n - 1)
    )
