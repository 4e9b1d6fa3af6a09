"""Sequence packing + domain mixing: invariants, distributed-prefix-sum
correctness (bucket-count invariance), and the no-serial-window plan
property."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_topic_dumper_spark.operators.packing import (
    MIX_WEIGHTS,
    pack_sequences,
    sample_domain_mixture,
    token_counts,
)
from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
L = 128


def test_pack_covers_every_token_exactly_once(spark):
    docs = load_table(spark, SF, "documents")
    out = pack_sequences(docs, seq_len=L, buckets=4)
    total_tokens = token_counts(docs).agg(F.sum("n_tok")).first()[0]
    per_seq = (
        out.groupBy("seq_id").agg(F.sum("n_tok_in_seq").alias("filled")).collect()
    )
    n_seqs = max(r.seq_id for r in per_seq) + 1
    # every sequence is exactly full except possibly the last
    for r in per_seq:
        if r.seq_id < n_seqs - 1:
            assert r.filled == L, f"seq {r.seq_id} has {r.filled} tokens"
        else:
            assert 0 < r.filled <= L
    # no token lost or duplicated across the whole corpus
    assert sum(r.filled for r in per_seq) == total_tokens
    # every doc's slices reassemble to its token count
    per_doc = {
        r.doc_id: r.s
        for r in out.groupBy("doc_id").agg(F.sum("n_tok_in_seq").alias("s")).collect()
    }
    for r in token_counts(docs).collect():
        assert per_doc[r.doc_id] == r.n_tok
    # slice bounds live inside the sequence
    bad = out.filter(
        (F.col("start_in_seq") < 0)
        | (F.col("start_in_seq") + F.col("n_tok_in_seq") > L)
        | (F.col("n_tok_in_seq") <= 0)
    ).count()
    assert bad == 0


def test_pack_is_bucket_count_invariant(spark):
    """The two-phase prefix sum must yield identical global offsets for
    ANY bucketing — 1 bucket (serial) vs many (parallel)."""
    docs = load_table(spark, SF, "documents")
    one = sorted(map(tuple, pack_sequences(docs, seq_len=L, buckets=1).collect()))
    many = sorted(map(tuple, pack_sequences(docs, seq_len=L, buckets=16).collect()))
    assert one == many


def test_pack_plan_has_no_serial_window(spark):
    """The scale property: no single-partition exchange anywhere — the
    global cumsum must NOT be a Window.orderBy over one task."""
    docs = load_table(spark, SF, "documents")
    plan = (
        pack_sequences(docs, seq_len=L, buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan  # the per-bucket cumsum is still a window


def test_pack_matches_python_reference(spark):
    """Property: packing equals an independent serial Python
    implementation on random corpora — docs far larger than seq_len,
    single-token docs, sparse/duplicate-free random ids."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    seq_len = 16

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(st.integers(0, 10_000), st.integers(1, 100)),
            min_size=1,
            max_size=30,
            unique_by=lambda t: t[0],
        )
    )
    def run(corpus):
        # serial reference: concat in doc_id order, cut every seq_len
        expected = []
        pos = 0
        for doc_id, n in sorted(corpus):
            start = pos
            while pos < start + n:
                seq = pos // seq_len
                take = min((seq + 1) * seq_len, start + n) - pos
                expected.append((doc_id, seq, pos - seq * seq_len, take))
                pos += take
        docs = spark.createDataFrame(
            [(doc_id, " ".join(["w"] * n)) for doc_id, n in corpus],
            "doc_id long, text string",
        )
        got = sorted(
            map(tuple, pack_sequences(docs, seq_len=seq_len, buckets=5).collect())
        )
        assert got == sorted(expected)

    run()


def test_incremental_dedup_all_joins_broadcast(spark):
    """The corpus side must never be shuffled for a join — every join
    in the plan broadcasts (batch fingerprints / matched set)."""
    from kafka_topic_dumper_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, SF, "documents")
    plan = (
        incremental_dedup(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_mixture_hits_target_proportions(spark):
    """Achieved token mix tracks the target weights to within doc
    granularity, and no source exceeds its available tokens."""
    docs = load_table(spark, SF, "documents")
    kept = sample_domain_mixture(docs)
    toks = {
        r.source: r.t
        for r in kept.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    assert set(toks) <= set(MIX_WEIGHTS)
    total = sum(toks.values())
    for s, w in MIX_WEIGHTS.items():
        # hash sampling at ~25-doc sources: generous tolerance, the
        # exactness claim lives in the DuckDB oracle not in this bound
        assert abs(toks.get(s, 0) / total - w) < 0.2


def test_tokenize_pack_ids_cell_invariants(spark):
    """Structural invariants of the training-shard cells: exactly one
    cell per corpus token, contiguous dense coverage (every sequence
    but the last is full), ids within the closed vocab + unk."""
    import re

    from pyspark.sql import functions as F

    from kafka_topic_dumper_spark.operators.packing import tokenize_pack_ids
    from kafka_topic_dumper_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    L = 128
    cells = tokenize_pack_ids(docs, seq_len=L, buckets=4).collect()

    n_tokens = sum(
        len(re.split(r"\s+", r.text.lower())) for r in docs.select("text").collect()
    )
    assert len(cells) == n_tokens
    assert len({(c.seq_id, c.pos_in_seq) for c in cells}) == n_tokens
    assert all(0 <= c.pos_in_seq < L for c in cells)
    assert all(0 <= c.token_id <= 1024 for c in cells)
    per_seq = {}
    for c in cells:
        per_seq[c.seq_id] = per_seq.get(c.seq_id, 0) + 1
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # no gaps in seq ids
    for sid, n in per_seq.items():
        assert n == L or sid == last, (sid, n)
    # some real vocabulary hits, and unk exists only if the corpus has
    # more distinct tokens than the vocab (it doesn't at sf0.001)
    assert any(c.token_id > 0 for c in cells)


def test_ordered_prefix_sum_property(spark):
    """Property: the generic two-phase prefix sum equals a serial
    Python cumsum under the (key, tie) order for random key
    distributions — duplicate keys (forced same-bucket), negative
    keys, skewed ranges, bucket counts from 1 to many."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_topic_dumper_spark.operators.packing import ordered_prefix_sum

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(-1_000_000, 1_000_000),  # key (dup allowed)
                st.integers(0, 50),                  # val
            ),
            min_size=1,
            max_size=40,
        ),
        st.integers(1, 8),  # buckets
    )
    def run(rows, buckets):
        data = [(i, k, v) for i, (k, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "tie bigint, k bigint, v bigint")
        got = {
            r.tie: r.s
            for r in ordered_prefix_sum(
                df, "k", "v", tie="tie", buckets=buckets
            ).collect()
        }
        expected, acc = {}, 0
        for i, k, v in sorted(data, key=lambda t: (t[1], t[0])):
            expected[i] = acc
            acc += v
        assert got == expected

    run()


def test_ordered_prefix_sum_guards(spark):
    """NULL keys and reserved column names are rejected loudly."""
    import pytest as _pytest

    from kafka_topic_dumper_spark.operators.packing import ordered_prefix_sum

    with_null = spark.createDataFrame(
        [(1, 1), (None, 2)], "k bigint, v bigint"
    )
    with _pytest.raises(ValueError, match="NULL"):
        ordered_prefix_sum(with_null, "k", "v")
    reserved = spark.createDataFrame([(1, 2, 3)], "k bigint, v bigint, s bigint")
    with _pytest.raises(ValueError, match="reserves"):
        ordered_prefix_sum(reserved, "k", "v")


def test_ordered_prefix_max_property(spark):
    """Property: the two-phase exclusive prefix MAX equals a serial
    Python running max under the (key, tie) order — duplicate keys are
    exercised only through the tie column (the documented contract:
    equal keys without a tie have no defined row order)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_topic_dumper_spark.operators.packing import ordered_prefix_max

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.integers(-1_000_000, 1_000_000),  # keys (dups allowed)
            min_size=1,
            max_size=40,
        ),
        st.integers(1, 8),  # buckets
    )
    def run(keys, buckets):
        rows = [
            (k, i, (k * 7 + i * 13) % 101) for i, k in enumerate(keys)
        ]  # (key, tie, val) — val deterministic from inputs
        df = spark.createDataFrame(rows, "k bigint, t bigint, v bigint")
        out = ordered_prefix_max(df, "k", "v", tie="t", buckets=buckets)
        got = {(r.k, r.t): r.m for r in out.collect()}
        expected, acc = {}, None
        for k, t, v in sorted(rows, key=lambda r: (r[0], r[1])):
            expected[(k, t)] = acc
            if acc is None or v > acc:
                acc = v
        assert got == expected

    run()


def test_ordered_prefix_max_guards(spark):
    """NULL keys and reserved column names are rejected loudly."""
    import pytest as _pytest

    from kafka_topic_dumper_spark.operators.packing import ordered_prefix_max

    with_null = spark.createDataFrame(
        [(1, 1), (None, 2)], "k bigint, v bigint"
    )
    with _pytest.raises(ValueError, match="NULL"):
        ordered_prefix_max(with_null, "k", "v")
    reserved = spark.createDataFrame([(1, 2, 3)], "k bigint, v bigint, m bigint")
    with _pytest.raises(ValueError, match="reserves"):
        ordered_prefix_max(reserved, "k", "v")


def test_priority_sample_matches_python_replay(spark):
    """Priority sampling (DLT): sample membership, τ, and the
    max(w, τ) estimator recomputed independently in pure Python; the
    top-(k+1) must come from TakeOrderedAndProject (no corpus sort)."""
    import hashlib

    from kafka_topic_dumper_spark.operators.packing import priority_sample

    docs = load_table(spark, SF, "documents")
    k = 20
    out = priority_sample(docs, k=k)
    got = sorted(
        (r.doc_id, r.weight, round(r.priority, 6), round(r.est_weight, 6))
        for r in out.collect()
    )

    pr = []
    for d, w in [
        (r.doc_id, r.n_chars)
        for r in docs.select("doc_id", "n_chars").collect()
    ]:
        h = int(hashlib.md5(str(d).encode()).hexdigest()[:12], 16)
        pr.append((float(w) * float(1 << 48) / float(h + 1), d, w))
    pr.sort(key=lambda t: (-t[0], t[1]))
    tau = pr[k][0]
    expect = sorted(
        (d, w, round(p, 6), round(max(float(w), tau), 6))
        for p, d, w in pr[:k]
    )
    assert got == expect
    # scale shape: global top-k is a TakeOrdered, not a full sort+limit
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
