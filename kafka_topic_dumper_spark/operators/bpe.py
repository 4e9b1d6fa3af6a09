"""Distributed BPE (byte-pair-encoding) vocabulary training.

Tokenizer training is the first model-side step of an LLM data
pipeline, and its heavy phase is corpus statistics: BPE learns merges
from the frequency of adjacent symbol pairs over the corpus. The
Spark-first decomposition:

1. ONE corpus-scale pass: whitespace words → (word, freq). This is the
   only shuffle that touches corpus-sized data; everything after runs
   on the VOCABULARY (distinct words), which is sublinear in corpus
   size (Heaps' law) and model-plane in the same sense as the
   reference's offset bookkeeping (kafka_client.py:149-154).
2. Per merge step: pair counts are a vocabulary-sized explode +
   aggregate; the argmax pair is a 1-row driver fetch
   (metadata-plane); the merge itself is a pure JVM ``aggregate`` HOF
   fold over each word's symbol array — no Python in the row path.
   The segmented vocabulary is persisted per step so step N+1 doesn't
   recompute the whole lineage (N steps ⇒ O(N) passes, not O(N²)).

Tie-break is total and deterministic: (count DESC, left ASC, right
ASC) — the property tests replay the exact algorithm in pure Python.

The first-sweep pair counts are ALSO exposed as an oracle-gated
query (``text_bpe_pair_counts``): adjacent single-char pairs are
plain ``substr(word, i, 2)`` substrings, identical in any SQL engine.
The iterative learner (``text_bpe_merges``) is genuinely iterative —
registered rows-only, verified instead by the pure-Python replay in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_topic_dumper_spark.functions import trained_oracles
from kafka_topic_dumper_spark.functions.caching import tracked_persist

N_MERGES = 8
TOP_PAIRS = 30


def word_stream(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """The BPE word derivation (lowercase whitespace tokens, length ≥ 2)
    — ONE definition shared by training and application so the apply
    side's inner join can never silently drop words a divergent copy
    of the tokenizer produced."""
    return docs.select(
        *extra_cols, F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.length("word") >= 2)


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) over whitespace-lowercase tokens — the single
    corpus-scale shuffle of BPE training (map-side combine applies)."""
    return word_stream(docs).groupBy("word").agg(F.count("*").alias("freq"))


def pair_counts_first_sweep(docs: DataFrame, top: int = TOP_PAIRS) -> DataFrame:
    """Top adjacent character-pair counts (BPE sweep 1). Pairs are
    2-char substrings — no array machinery, identical cross-engine."""
    words = word_freqs(docs)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        # UTF-8 binary tie-break: matches DuckDB's binary collation by
        # code point where Spark's string order is UTF-16 code units
        .orderBy(F.col("pair_count").desc(), F.encode("pair", "UTF-8"))
        .limit(top)
    )


def pair_counts_oracle_sql(top: int = TOP_PAIRS) -> str:
    """DuckDB twin of :func:`pair_counts_first_sweep`."""
    return rf"""
        WITH words AS (
            SELECT word, count(*) AS freq FROM (
                SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
                FROM documents
            ) WHERE length(word) >= 2
            GROUP BY word
        ), pairs AS (
            SELECT unnest(list_transform(range(1, length(word)),
                          i -> substr(word, i, 2))) AS pair,
                   freq
            FROM words
        )
        SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        FROM pairs GROUP BY pair
        ORDER BY pair_count DESC, pair
        LIMIT {top}
        """


def _merge_expr(left: str, right: str):
    """JVM fold applying one merge (leftmost-first, the classic BPE
    replacement order) to the ``syms`` array column."""
    merged = F.lit(left + right)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _step_pair_counts(seg: DataFrame) -> DataFrame:
    return (
        seg.filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS l,"
                    " element_at(syms, i + 1) AS r))"
                )
            ).alias("p"),
            "freq",
        )
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq")
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("pair_count"))
    )


def _learn(
    docs: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the merge loop; returns (merge list, FINAL segmentation
    ``(word, syms, freq)`` — still persisted). The segmentation rides
    along so the train→apply cycle never replays the folds."""
    seg = tracked_persist(
        word_freqs(docs).select(
            "word",
            F.expr("filter(split(word, ''), x -> x <> '')").alias("syms"),
            "freq",
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _step_pair_counts(seg)
            # tie-break on the UTF-8 binary, not the string: Spark
            # compares strings by UTF-16 code unit while the Python
            # replay and DuckDB compare by code point — they diverge
            # for supplementary-plane symbols; unsigned byte order of
            # UTF-8 equals code-point order in every engine
            .orderBy(
                F.col("pair_count").desc(),
                F.encode("l", "UTF-8"),
                F.encode("r", "UTF-8"),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, top[0].pair_count
        merges.append((step, l, r, cnt))
        prev = seg
        seg = tracked_persist(
            seg.select("word", _merge_expr(l, r).alias("syms"), "freq")
        )
        # materialize the new segmentation, then drop the superseded
        # one — bounds pinned copies at 2 instead of n_merges+1
        seg.count()
        prev.unpersist()
    return merges, seg


def learn_bpe_merges(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """The learned merge table (step, left, right, pair_count) after
    ``n_merges`` BPE steps. Iterative by nature: each step's argmax
    pair is a single-row driver fetch, each re-segmentation a
    vocabulary-sized JVM fold (see module docstring for why the loop
    never touches corpus-sized data after pass 1)."""
    merges, seg = _learn(docs, n_merges)
    # the final segmentation exists for train_and_encode's benefit;
    # this caller only wants the merge table — release the pin
    seg.unpersist()
    return docs.sparkSession.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint"
    )


def _encode_with_segmentation(docs: DataFrame, seg: DataFrame) -> DataFrame:
    """Per-doc encode stats from a word→segmentation table: the
    corpus word stream joins the vocabulary-sized ``seg`` on ``word``.
    No broadcast hint — the distinct-word table is NOT bounded by
    construction (repo policy: explicit broadcast only on bounded
    relations); AQE broadcasts it when its runtime size fits and
    falls back to a shuffle join when a 100 TB corpus's vocabulary
    doesn't."""
    sizes = seg.select("word", F.size("syms").alias("n_pieces_w"))
    stream = word_stream(docs, "doc_id")
    return (
        stream.join(sizes, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces_w").cast("bigint").alias("n_pieces"),
        )
        .withColumn(
            "pieces_per_word",
            F.round(F.col("n_pieces") / F.col("n_words"), 4),
        )
    )


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize the corpus with an EXTERNALLY-provided merge list —
    the apply side of BPE for a pre-trained tokenizer. Per-doc output
    (doc_id, n_words, n_pieces, pieces_per_word): the compression
    ratio a tokenizer run actually reports.

    Plan shape: segmentation is computed once per DISTINCT word (the
    vocabulary — sublinear in corpus size, Heaps' law), then joined
    back to the corpus word stream; the merge replay is a chain of JVM
    folds over the vocabulary only. The merge list itself is metadata,
    closed over as literals — the same derive-then-apply shape as the
    reference's offset plans (kafka_client.py:149-176)."""
    words = word_freqs(docs).select(
        "word", F.expr("filter(split(word, ''), x -> x <> '')").alias("syms")
    )
    for left, right in merges:
        words = words.select("word", _merge_expr(left, right).alias("syms"))
    return _encode_with_segmentation(docs, words)


def train_and_encode(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Learn ``n_merges`` merges from the corpus, then encode the
    corpus with them — the full tokenizer-train→apply cycle as one
    call. The learner's FINAL persisted segmentation is reused
    directly, so the apply side replays nothing (review r6: the first
    version re-segmented the whole vocabulary a second time).
    Iterative (driver-held merge state) ⇒ registered rows-only; the
    pure-Python replay in tests/test_bpe.py checks the composed
    result exactly."""
    _, seg = _learn(docs, n_merges)
    return _encode_with_segmentation(docs, seg)


def register(reg) -> None:
    from kafka_topic_dumper_spark.sources.tables import load_table

    @reg("text_bpe_pair_counts", pair_counts_oracle_sql())
    def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Top-30 adjacent character-pair counts over the word-frequency
        table — BPE training sweep 1, oracle-exact."""
        return pair_counts_first_sweep(load_table(spark, sf_dir, "documents"))

    # Literal-injected oracles (r6 verdict item 2): the merge LOOP is
    # iterative (driver-held argmax state), but its output is an
    # independent pure-Python replay away (functions/trained_oracles.py
    # — same learner restated from scratch over a DuckDB word-frequency
    # read). The merges row checks the distributed learner's full
    # output; the encode row injects only the vocabulary-sized final
    # segmentation lengths and runs the whole corpus-side encode path
    # (word stream, vocabulary join, per-doc aggregation) in DuckDB.
    @reg("text_bpe_merges", trained_oracles.bpe_merges_oracle_sql)
    def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
        """8 learned BPE merges (deterministic count/lexicographic
        tie-break); pure-Python replay asserts exact equality."""
        return learn_bpe_merges(load_table(spark, sf_dir, "documents"))

    @reg("text_bpe_encode", trained_oracles.bpe_encode_oracle_sql)
    def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Train 8 merges, then encode the corpus with them: per-doc
        piece counts and compression ratio (pure-Python replay in
        tests/test_bpe.py checks the composed result exactly)."""
        return train_and_encode(load_table(spark, sf_dir, "documents"))
