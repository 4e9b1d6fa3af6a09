"""Property-based differential tests for the two round-11 operators
whose correctness arguments are structural rather than per-row:

- ``editdist_join_pairs``: the q-gram count lemma + length-band
  pruning must be LOSSLESS — every pair within the distance bound
  survives to the DP stage, on arbitrary corpora, including the
  short-doc regime where the lemma bound is vacuous and the explicit
  short-pair enumeration is the only path.
- ``pagerank_fixed_point(redistribute_dangling=True)``: the integer
  recurrence with the per-sweep dangling-mass term must match a
  pure-Python replay on arbitrary directed graphs (sinks, sources,
  self-contained cycles, disconnected pieces).

Both generators deliberately hug the boundaries (doc lengths around
the short-cut threshold; node ids that collide across src/dst) —
the fixed-corpus differential at sf0.01 cannot reach those regimes.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_topic_dumper_spark.operators.dedup import (
    editdist_join_pairs,
    editdist_pairs_from_prefix_index,
    editdist_prefix_index,
)
from kafka_topic_dumper_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixed_point,
)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


# D=2 is used (not the registry's D=30) so the short-doc cutoff
# (q-1 + q*D = 8 for q=3) sits INSIDE the generated length range
# 0..14: docs above it must survive via the q-gram lemma join, docs
# at or below it only via the explicit short-pair enumeration — one
# corpus exercises both paths and their seam. Small alphabet → heavy
# gram collisions.
docs_strategy = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=14),
    min_size=2,
    max_size=14,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_editdist_join_lossless_on_random_corpora(spark, texts):
    max_dist = 2
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in editdist_join_pairs(df, max_dist=max_dist).collect()
    }
    expected = {
        (i, j): _levenshtein(texts[i], texts[j])
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if _levenshtein(texts[i], texts[j]) <= max_dist
    }
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_editdist_prefix_filter_lossless_on_random_corpora(spark, texts):
    # Twin of the gram-count-lemma test for the ED-Join PREFIX path
    # (round 13): the 91-rarest-token prefix principle (here qD+1 = 7
    # at D=2) must also be lossless on arbitrary corpora, including
    # the heavy-gram-collision regime where every doc's "rarest"
    # grams coincide and the short-doc seam where the count bound is
    # vacuous.
    max_dist = 2
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = editdist_prefix_index(df, max_dist=max_dist)
    got = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in editdist_pairs_from_prefix_index(
            df, idx, max_dist=max_dist
        ).collect()
    }
    expected = {
        (i, j): _levenshtein(texts[i], texts[j])
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if _levenshtein(texts[i], texts[j]) <= max_dist
    }
    assert got == expected


edges_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)),
    min_size=1,
    max_size=15,
).filter(lambda es: any(u != v for u, v in es))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=edges_strategy)
def test_pagerank_dangling_matches_replay_on_random_graphs(spark, raw):
    # drop self-loops, dedup — the callers pass DISTINCT edge lists
    edges = sorted({(u, v) for u, v in raw if u != v})
    df = spark.createDataFrame(edges, "src long, dst long")
    iters = 3
    got = {
        r.node: r.r
        for r in pagerank_fixed_point(
            df, iters=iters, redistribute_dangling=True
        ).collect()
    }

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    sinks = [n for n in nodes if n not in deg]
    n = len(nodes)
    teleport = PR_SCALE * 15 // 100
    r = {x: PR_SCALE for x in nodes}
    for _ in range(iters):
        s: dict[int, int] = {}
        for u, v in edges:
            s[v] = s.get(v, 0) + r[u] // deg[u]
        dm = sum(r[x] for x in sinks)
        r = {
            x: teleport + (85 * (s.get(x, 0) + dm // n)) // 100
            for x in nodes
        }
    assert got == r
