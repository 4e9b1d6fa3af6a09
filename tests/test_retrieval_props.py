"""Pure-Python replications of the second-wave operators — the same
from-scratch-reimplementation discipline as tests/test_bpe.py: BM25,
the temperature sampler, and the hashed classifier are recomputed
independently (hashlib/math, no Spark, no SQL) and compared exactly
(integers) or to 1e-9 (float scores)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [
        (r.doc_id, r.source, r.text)
        for r in load_table(spark, SF, "documents").select("doc_id", "source", "text").collect()
    ]


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.lower())


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_bm25_matches_python(spark):
    from kafka_topic_dumper_spark.operators.text import BM25_QUERY, bm25_topk

    docs = _docs(spark)
    dls = {d: len(_toks(t)) for d, _, t in docs}
    n_docs = len(docs)
    avgdl = sum(dls.values()) / n_docs
    tf = {(d, w): Counter(_toks(t))[w] for d, _, t in docs for w in BM25_QUERY}
    df = {w: sum(1 for d, _, t in docs if tf[(d, w)] > 0) for w in BM25_QUERY}

    def score(d):
        s = 0.0
        for w in BM25_QUERY:
            f = tf[(d, w)]
            if f == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dls[d] / avgdl)))
        return s

    scored = sorted(
        ((d, score(d)) for d, _, t in docs if any(tf[(d, w)] for w in BM25_QUERY)),
        key=lambda x: (-x[1], x[0]),
    )[:20]
    got = bm25_topk(load_table(spark, SF, "documents")).collect()
    assert [r.doc_id for r in got] == [d for d, _ in scored]
    assert [r.rank for r in got] == list(range(1, len(scored) + 1))
    for r, (_, s) in zip(got, scored):
        assert abs(r.bm25 - round(s, 4)) < 1e-9, (r.doc_id, r.bm25, s)


def test_temperature_sample_matches_python(spark):
    from kafka_topic_dumper_spark.operators.packing import (
        _MIX_RES,
        _TEMP_BETA,
        _TEMP_QUANT,
        temperature_sample,
    )

    docs = _docs(spark)
    n_tok = {d: len(_toks(t)) for d, _, t in docs}
    src_of = {d: s for d, s, _ in docs}
    totals = Counter()
    for d, s, _ in docs:
        totals[s] += n_tok[d]
    q = {s: math.floor(math.sqrt(float(v)) * _TEMP_QUANT) for s, v in totals.items()}
    qq, tot = sum(q.values()), sum(totals.values())
    thr = {
        s: math.floor(
            min(1.0, _TEMP_BETA * float(tot) * float(q[s]) / (float(qq) * float(v)))
            * _MIX_RES
        )
        for s, v in totals.items()
    }
    want = {
        d for d, s, _ in docs if _h32(str(d)) % _MIX_RES < thr[s]
    }
    got = {r.doc_id for r in temperature_sample(load_table(spark, SF, "documents")).collect()}
    assert got == want
    # every source keeps at least one doc at these thresholds, and no
    # source is copied wholesale unless its rate saturated at 1.0
    for s in totals:
        kept = sum(1 for d in want if src_of[d] == s)
        assert kept > 0, s


def test_quality_classifier_matches_python(spark):
    from kafka_topic_dumper_spark.operators.text import (
        QC_BUCKETS,
        _qc_weights,
        quality_classifier,
    )

    w = _qc_weights()
    docs = _docs(spark)
    want = {}
    for d, _, t in docs:
        toks = _toks(t)
        logit = sum(w[_h32(tok) % QC_BUCKETS] for tok in toks)
        want[d] = (len(toks), logit, logit >= 0)
    got = quality_classifier(load_table(spark, SF, "documents")).collect()
    assert len(got) == len(want)
    for r in got:
        n, logit, keep = want[r.doc_id]
        assert (r.n_tokens, r.logit_centisum, r.keep) == (n, logit, keep)
        z = logit / (n * 100.0)
        assert abs(r.prob - round(1.0 / (1.0 + math.exp(-z)), 4)) < 1e-9


def test_pca_projection_partition_invariant_and_variance_ordered(spark):
    """The PCA claim under test: EXACT integer Gram/projection makes
    the output a pure function of the data — byte-identical under
    hostile repartitioning — and the components actually order the
    variance (var(pc1) >= var(pc2), both > 0; components near-
    orthogonal by the Gram-deflation construction)."""
    import numpy as np

    from kafka_topic_dumper_spark.operators.similarity import pca_project
    from kafka_topic_dumper_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    base = sorted(tuple(r) for r in pca_project(emb).collect())
    hostile = sorted(
        tuple(r) for r in pca_project(emb.repartition(7, "vec_id")).collect()
    )
    assert base == hostile  # bit-identical, not approximately

    P = np.array([(p1, p2) for _, p1, p2 in base])
    v1, v2 = P[:, 0].var(), P[:, 1].var()
    assert v1 >= v2 > 0
    # centered projections: the mean folds out by construction
    assert abs(P[:, 0].mean()) < 1e-6 and abs(P[:, 1].mean()) < 1e-6
