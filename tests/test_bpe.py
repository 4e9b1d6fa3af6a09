"""BPE merge learning: the distributed learner must equal a
from-scratch pure-Python BPE on the same corpus — exact merges, exact
counts, same tie-break."""

from __future__ import annotations

import re
from collections import Counter

from kafka_topic_dumper_spark.operators.bpe import learn_bpe_merges, word_freqs
from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _python_bpe(word_freq: dict[str, int], n_merges: int):
    seg = {w: list(w) for w in word_freq}
    out = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in seg.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # (count DESC, left ASC, right ASC) — the learner's tie-break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((step, l, r, c))
        for w, syms in seg.items():
            j, merged = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    merged.append(l + r)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            seg[w] = merged
    return out


def _corpus_word_freq(spark) -> dict[str, int]:
    docs = load_table(spark, SF, "documents")
    freq: Counter = Counter()
    for row in docs.select("text").collect():
        for w in re.split(r"\s+", row.text.lower()):
            if len(w) >= 2:
                freq[w] += 1
    return dict(freq)


def test_word_freqs_match_python(spark):
    docs = load_table(spark, SF, "documents")
    got = {r.word: r.freq for r in word_freqs(docs).collect()}
    assert got == _corpus_word_freq(spark)


def test_learned_merges_match_python_replay(spark):
    docs = load_table(spark, SF, "documents")
    got = [(r.step, r.left, r.right, r.pair_count) for r in learn_bpe_merges(docs).collect()]
    want = _python_bpe(_corpus_word_freq(spark), 8)
    assert got == want


def test_merge_fold_is_leftmost_greedy(spark):
    """'aaaa' under merge (a,a) → [aa, aa]; 'aaa' → [aa, a] — the
    classic replacement-order cases, via the JVM fold itself."""
    from pyspark.sql import functions as F

    from kafka_topic_dumper_spark.operators.bpe import _merge_expr

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["b", "a", "a", "b"],)],
        "syms array<string>",
    )
    got = [r.m for r in df.select(_merge_expr("a", "a").alias("m")).collect()]
    assert got == [["aa", "aa"], ["aa", "a"], ["b", "aa", "b"]]


def test_encode_matches_python_replay(spark):
    """Train→apply cycle: per-doc piece counts equal a pure-Python BPE
    encode with the replayed merges."""
    from kafka_topic_dumper_spark.operators.bpe import train_and_encode

    docs = load_table(spark, SF, "documents")
    wf = _corpus_word_freq(spark)
    merges = [(l, r) for _, l, r, _ in _python_bpe(wf, 8)]

    def encode_word(w: str) -> int:
        syms = list(w)
        for l, r in merges:
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return len(syms)

    piece_len = {w: encode_word(w) for w in wf}
    want = {}
    for row in load_table(spark, SF, "documents").select("doc_id", "text").collect():
        ws = [w for w in re.split(r"\s+", row.text.lower()) if len(w) >= 2]
        if ws:
            want[row.doc_id] = (len(ws), sum(piece_len[w] for w in ws))

    got = {r.doc_id: (r.n_words, r.n_pieces) for r in train_and_encode(docs).collect()}
    assert got == want


def test_apply_bpe_with_pretrained_merges_matches_train_and_encode(spark):
    """The pre-trained path: applying an externally supplied merge
    list must equal the composed train→apply cycle when the list is
    the one the learner would produce."""
    from kafka_topic_dumper_spark.operators.bpe import apply_bpe, train_and_encode

    docs = load_table(spark, SF, "documents")
    merges = [(l, r) for _, l, r, _ in _python_bpe(_corpus_word_freq(spark), 8)]
    got = sorted(
        (r.doc_id, r.n_words, r.n_pieces, r.pieces_per_word)
        for r in apply_bpe(docs, merges).collect()
    )
    want = sorted(
        (r.doc_id, r.n_words, r.n_pieces, r.pieces_per_word)
        for r in train_and_encode(docs).collect()
    )
    assert got == want
