"""Training-sequence packing and domain mixing (SURVEY §2.10 — the
steps between a cleaned corpus and a training run).

``pack_sequences`` is the concat-and-chunk layout step of LLM
pretraining: documents are laid out in a deterministic global order,
token streams concatenated, and cut into fixed-length sequences; the
output says, for every document, which training sequence(s) it lands
in and at which offsets. The core primitive is a GLOBAL prefix sum of
per-document token counts — the textbook serial trap in Spark (a
``Window.orderBy`` with no partitionBy collapses to ONE task). Here it
is the classic two-phase distributed prefix sum instead:

1. bucket documents by deterministic doc_id ranges (NOT
   ``repartitionByRange``: its sampled boundaries can differ if a
   cached stage is evicted and recomputed, which would silently shift
   every offset — the bucket function must be a pure function of the
   row);
2. local cumulative sums per bucket (parallel windows);
3. per-bucket totals → driver (one row per bucket — metadata-plane,
   like the reference's offset bounds in kafka_client.py:82-110);
   exclusive-prefix them and broadcast the bases back.

Two compact shuffles total, both carrying (doc_id, n_tok, bucket) —
never text. At 100 TB the shuffled projection is ~24 B/doc.

``sample_domain_mixture`` solves the data-mixing equation: given
target corpus proportions per source, the largest feasible corpus is
``T = min_s(tokens_s / w_s)`` and each source is down-sampled at
``rate_s = w_s·T / tokens_s`` — membership decided by the portable
md5 hash of the doc id, so the sample is deterministic, reproducible
across engines, and needs no shuffle at all (the per-source totals are
a tiny broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_topic_dumper_spark.functions.caching import tracked_persist
from kafka_topic_dumper_spark.functions.portable_hash import h32_spark_sql

# NB: Spark SQL string literals are C-escaped — the literal must read
# '\\s+' in the SQL text to mean the regex \s+ (a single backslash
# would split on the regex "s+")
TOKENS_SQL = r"split(lower(text), '\\s+')"

DEFAULT_SEQ_LEN = 2048
MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_MIX_RES = 10000  # rate quantization: integer hash-bucket compare, no float <


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tok) — whitespace token count, the same tokenizer as
    operators/text.py so corpus stats and packing agree."""
    return docs.select(
        "doc_id", F.expr(f"CAST(size({TOKENS_SQL}) AS BIGINT)").alias("n_tok")
    )


def pack_sequences(
    docs: DataFrame, seq_len: int = DEFAULT_SEQ_LEN, buckets: int = 32
) -> DataFrame:
    """Assign every document its slice(s) of the packed training
    stream: (doc_id, seq_id, start_in_seq, n_tok_in_seq), where
    documents crossing a sequence boundary emit one row per sequence
    touched. Layout order is doc_id; all arithmetic is exact int64.

    ``buckets`` bounds the parallelism of the prefix-sum stage — at
    scale set it ≈ the cluster's task slots. Bucketing is by doc_id
    range (pure function of the row; see module docstring for why not
    repartitionByRange), so bucket k holds ids
    [min_id + k·width, min_id + (k+1)·width)."""
    started = doc_start_offsets(docs, buckets)
    if started is None:
        return docs.sparkSession.createDataFrame(
            [], "doc_id bigint, seq_id bigint, start_in_seq bigint, n_tok_in_seq bigint"
        )
    # chunk: doc occupying global tokens [s, s+n_tok) touches sequences
    # floor(s/L) .. floor((s+n_tok-1)/L)
    return (
        started.filter(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "n_tok",
            "s",
            F.explode(
                F.sequence(
                    F.expr(f"s div {seq_len}"),
                    F.expr(f"(s + n_tok - 1) div {seq_len}"),
                )
            ).alias("seq_id"),
        )
        .select(
            "doc_id",
            "seq_id",
            (
                F.greatest(F.col("s"), F.col("seq_id") * seq_len)
                - F.col("seq_id") * seq_len
            ).alias("start_in_seq"),
            (
                F.least(F.col("s") + F.col("n_tok"), (F.col("seq_id") + 1) * seq_len)
                - F.greatest(F.col("s"), F.col("seq_id") * seq_len)
            ).alias("n_tok_in_seq"),
        )
    )


def ordered_prefix_sum(
    vals: DataFrame,
    key: str,
    val: str,
    tie: str | None = None,
    buckets: int = 32,
) -> DataFrame | None:
    """``(input columns…, s)`` — exclusive prefix sum of ``val`` in
    ascending ``(key[, tie])`` order via the two-phase distributed
    scheme (see module docstring): range-bucket on the INTEGER ``key``,
    per-bucket totals → driver-side exclusive prefix (one row per
    bucket, metadata-plane) → broadcast bases + parallel local window
    cumsums. Equal keys always land in one bucket, so the within-bucket
    ``(key, tie)`` window order composes to the exact global order —
    the property that lets any total order with an integer sort key
    (doc_id layout, quality-descending curation) reuse this instead of
    the single-partition global window that would bottleneck at scale.
    Returns None for empty input. ``key`` must be NULL-free (a NULL
    has no place in a total order — the caller decides whether to
    filter or default such rows) and the names ``bucket``/``base``/
    ``local_start``/``s`` are reserved for the internals (code-review
    r7: both were silent hazards for future callers)."""
    reserved = {"bucket", "base", "local_start", "s"} & set(vals.columns)
    if reserved:
        raise ValueError(
            f"ordered_prefix_sum reserves column names {sorted(reserved)}; "
            "rename them in the input"
        )
    vals = tracked_persist(vals)
    lo, hi = vals.agg(F.min(key), F.max(key)).first()
    if lo is None:
        return None
    width = max(1, (hi - lo + buckets) // buckets)
    bucketed = vals.withColumn("bucket", F.expr(f"({key} - {lo}) div {width}"))
    totals = bucketed.groupBy("bucket").agg(F.sum(val).alias("tot")).collect()
    if any(row["bucket"] is None for row in totals):
        # free to detect here (totals is already driver-side); a NULL
        # key has no place in a total order and would otherwise crash
        # the sort below with a TypeError
        raise ValueError(
            f"ordered_prefix_sum key column {key!r} contains NULLs — "
            "filter or default them before ordering"
        )
    bases, acc = [], 0
    for row in sorted(totals, key=lambda r: r["bucket"]):
        bases.append((row["bucket"], acc))
        acc += row["tot"] or 0  # sum() over an all-NULL bucket is NULL
    base_df = vals.sparkSession.createDataFrame(
        bases, "bucket bigint, base bigint"
    )
    order = [key] + ([tie] if tie else [])
    w = (
        Window.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.withColumn(
            "local_start", F.coalesce(F.sum(val).over(w), F.lit(0))
        )
        .join(F.broadcast(base_df), "bucket")
        .withColumn("s", F.col("base") + F.col("local_start"))
        .drop("bucket", "base", "local_start")
    )


def ordered_prefix_max(
    vals: DataFrame,
    key: str,
    val: str,
    tie: str | None = None,
    buckets: int = 32,
) -> DataFrame | None:
    """``(input columns…, m)`` — EXCLUSIVE prefix MAX of ``val`` in
    ascending ``(key[, tie])`` order: the running-extremum sibling of
    :func:`ordered_prefix_sum`, same two-phase distributed scheme
    (range-bucket on the INTEGER key → per-bucket maxima → driver-side
    exclusive running max over the bucket roster, metadata-plane →
    broadcast bases + parallel local window maxima) instead of the
    single-partition global window that bottlenecks at scale. ``m`` is
    NULL for rows with no strictly-preceding row.

    Callers needing strictly-smaller-KEY semantics (a skyline frontier,
    not a row scan) must pre-aggregate to DISTINCT keys first — within
    equal keys the ROWS frame makes "preceding" an arbitrary subset of
    the tie group, exactly as in the sum variant. Same reserved-name
    and NULL-free-key contract as :func:`ordered_prefix_sum`."""
    reserved = {"bucket", "base", "local_m", "m"} & set(vals.columns)
    if reserved:
        raise ValueError(
            f"ordered_prefix_max reserves column names {sorted(reserved)}; "
            "rename them in the input"
        )
    vals = tracked_persist(vals)
    lo, hi = vals.agg(F.min(key), F.max(key)).first()
    if lo is None:
        return None
    width = max(1, (hi - lo + buckets) // buckets)
    bucketed = vals.withColumn("bucket", F.expr(f"({key} - {lo}) div {width}"))
    tops = bucketed.groupBy("bucket").agg(F.max(val).alias("top")).collect()
    if any(row["bucket"] is None for row in tops):
        raise ValueError(
            f"ordered_prefix_max key column {key!r} contains NULLs — "
            "filter or default them before ordering"
        )
    bases, acc = [], None
    for row in sorted(tops, key=lambda r: r["bucket"]):
        bases.append((row["bucket"], acc))
        if row["top"] is not None and (acc is None or row["top"] > acc):
            acc = row["top"]
    base_df = vals.sparkSession.createDataFrame(
        bases, "bucket bigint, base bigint"
    )
    order = [key] + ([tie] if tie else [])
    w = (
        Window.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.withColumn("local_m", F.max(val).over(w))
        .join(F.broadcast(base_df), "bucket")
        # greatest() skips NULLs (both engines), so a missing base or an
        # empty local prefix degrades to the other side; NULL only when
        # nothing precedes at all — the documented sentinel.
        .withColumn("m", F.greatest(F.col("base"), F.col("local_m")))
        .drop("bucket", "base", "local_m")
    )


def doc_start_offsets(docs: DataFrame, buckets: int = 32) -> DataFrame | None:
    """(doc_id, n_tok, s) — every document's global token start offset
    in doc_id layout order (:func:`ordered_prefix_sum` keyed on
    doc_id). Returns None for an empty corpus. Shared by
    :func:`pack_sequences` (doc→sequence slices) and
    :func:`tokenize_pack_ids` (token→sequence cell placement)."""
    ps = ordered_prefix_sum(token_counts(docs), "doc_id", "n_tok", buckets=buckets)
    if ps is None:
        return None
    return ps.select("doc_id", "n_tok", "s")


def pack_oracle_ctes(seq_len: int = DEFAULT_SEQ_LEN, src: str = "documents") -> str:
    """The packing computation as a chain of CTE definitions over
    ``src`` (must expose doc_id, text) — composable into larger
    pipelines; ``pack_sequences_oracle_sql`` wraps it standalone."""
    return rf"""t AS (
            SELECT doc_id,
                   CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
                       AS n_tok
            FROM {src}
        ), c AS (
            SELECT doc_id, n_tok,
                   COALESCE(sum(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS s
            FROM t
        ), x AS (
            SELECT doc_id, n_tok, s,
                   unnest(range(CAST(s // {seq_len} AS BIGINT),
                                CAST((s + n_tok - 1) // {seq_len} + 1 AS BIGINT)))
                       AS seq_id
            FROM c WHERE n_tok > 0
        )"""


def pack_oracle_select(seq_len: int = DEFAULT_SEQ_LEN) -> str:
    """Final SELECT over the ``x`` CTE from :func:`pack_oracle_ctes`."""
    return f"""
        SELECT doc_id, seq_id,
               CAST(greatest(s, seq_id * {seq_len}) - seq_id * {seq_len}
                    AS BIGINT) AS start_in_seq,
               CAST(least(s + n_tok, (seq_id + 1) * {seq_len})
                    - greatest(s, seq_id * {seq_len}) AS BIGINT) AS n_tok_in_seq
        FROM x
        """


def pack_sequences_oracle_sql(seq_len: int = DEFAULT_SEQ_LEN) -> str:
    """DuckDB twin: serial window cumsum (fine at oracle scale) over
    the identical tokenizer and integer chunk arithmetic."""
    return f"WITH {pack_oracle_ctes(seq_len)}{pack_oracle_select(seq_len)}"


def sample_domain_mixture(
    docs: DataFrame, weights: dict[str, float] | None = None
) -> DataFrame:
    """Down-sample sources to hit a target token mix: keep docs whose
    portable id-hash bucket falls under the source's computed rate.
    Returns the kept (doc_id, source, n_tok). The rate computation and
    the threshold quantization (floor(rate·10000)) are identical IEEE
    double expressions on both engines, so membership is exact — no
    float tolerance anywhere. No shuffle touches the corpus: the
    per-source totals are a tiny aggregate broadcast back as a map-side
    filter."""
    weights = weights or MIX_WEIGHTS
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    # persisted: the (doc_id, source, n_tok) projection feeds both the
    # totals pass and the membership pass — one tokenize of the corpus,
    # not two
    tok = tracked_persist(
        docs.filter(F.col("source").isin(*weights))
        .select(
            "doc_id",
            "source",
            F.expr(f"CAST(size({TOKENS_SQL}) AS BIGINT)").alias("n_tok"),
        )
    )
    totals = tok.groupBy("source").agg(F.sum("n_tok").alias("toks_s"))
    feasible = totals.withColumn("w", wmap[F.col("source")]).agg(
        F.min(F.col("toks_s") / F.col("w")).alias("t_total")
    )
    rates = (
        totals.join(F.broadcast(feasible))
        .withColumn("w", wmap[F.col("source")])
        .select(
            "source",
            F.floor(
                F.col("w") * F.col("t_total") / F.col("toks_s") * _MIX_RES
            ).alias("thr"),
        )
    )
    return (
        tok.join(F.broadcast(rates), "source")
        .filter(F.expr(f"{h32_spark_sql('CAST(doc_id AS STRING)')} % {_MIX_RES}") < F.col("thr"))
        .select("doc_id", "source", "n_tok")
    )


def sample_domain_mixture_oracle_sql(weights: dict[str, float] | None = None) -> str:
    """DuckDB twin — same totals, same min-feasibility, same
    floor-quantized thresholds, same portable hash membership."""
    from kafka_topic_dumper_spark.functions.portable_hash import h32_duckdb_sql

    weights = weights or MIX_WEIGHTS
    srcs = ", ".join(f"'{s}'" for s in weights)
    wcase = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in weights.items()
    ) + " END"
    h = h32_duckdb_sql("CAST(doc_id AS VARCHAR)")
    return rf"""
        WITH tok AS (
            SELECT doc_id, source,
                   CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
                       AS n_tok
            FROM documents WHERE source IN ({srcs})
        ), totals AS (
            SELECT source, sum(n_tok) AS toks_s FROM tok GROUP BY source
        ), feasible AS (
            SELECT min(toks_s / ({wcase})) AS t_total FROM totals
        ), rates AS (
            SELECT source,
                   floor(({wcase}) * t_total / toks_s * {_MIX_RES}) AS thr
            FROM totals CROSS JOIN feasible
        )
        SELECT doc_id, tok.source AS source, n_tok
        FROM tok JOIN rates ON tok.source = rates.source
        WHERE ({h} % {_MIX_RES}) < thr
        """


VOCAB_SIZE = 1024


def token_vocab(docs: DataFrame, vocab_size: int = VOCAB_SIZE) -> DataFrame:
    """(tok, token_id) — the closed top-``vocab_size`` frequency
    vocabulary, ids 1..V by (count DESC, UTF-8 token ASC). TakeOrdered
    (parallel partial top-k), then a window over only the V collected
    rows. Exposed separately so the prep CLI can persist the id→token
    mapping a training loader needs."""
    counts = (
        docs.select(F.explode(F.expr(TOKENS_SQL)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
    )
    order = [F.col("tf").desc(), F.encode("tok", "UTF-8")]
    return (
        counts.orderBy(*order)
        .limit(vocab_size)
        .withColumn(
            "token_id", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        )
        .select("tok", "token_id")
    )


def tokenize_pack_ids(
    docs: DataFrame,
    seq_len: int = 512,
    buckets: int = 32,
    vocab_size: int = VOCAB_SIZE,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """The corpus→training-shards capstone: every TOKEN of every
    document mapped to its (sequence, position, vocab-id) cell —
    i.e. the materialized content of the packed training sequences,
    ready to be written as fixed-length id shards.

    Three model-plane/metadata-plane sub-steps around two corpus
    passes:
    1. vocabulary: top-``vocab_size`` tokens by total count, ids
       1..V by (count DESC, UTF-8 token ASC) — TakeOrdered (parallel
       partial top-k, no global sort), then a window over only the V
       collected rows; everything else is OOV id 0 (the closed-vocab
       ``unk`` convention);
    2. placement: the same two-phase distributed prefix sum as
       :func:`pack_sequences` yields each doc's global start offset
       ``s``; token idx within the doc comes from ``posexplode``, so
       cell = ((s+idx) div L, (s+idx) mod L) — exact int64;
    3. lookup: the vocabulary is an explicit broadcast (bounded at
       ``vocab_size`` rows by construction); the doc-offset join rides
       the doc_id shuffle.
    The corpus is scanned twice (vocab counts + placement) — scans
    beat persisting a corpus-token-scale exploded stream."""
    started = doc_start_offsets(docs, buckets)
    if started is None:
        return docs.sparkSession.createDataFrame(
            [], "doc_id bigint, seq_id bigint, pos_in_seq bigint, token_id bigint"
        )
    if vocab is None:
        vocab = token_vocab(docs, vocab_size)
    vocab = vocab.select("tok", "token_id")
    placed = docs.select(
        "doc_id", F.posexplode(F.expr(TOKENS_SQL)).alias("idx", "tok")
    )
    return (
        placed.join(F.broadcast(vocab), "tok", "left")
        .join(started.select("doc_id", "s"), "doc_id")
        .select(
            "doc_id",
            F.expr(f"(s + idx) div {seq_len}").alias("seq_id"),
            F.expr(f"(s + idx) % {seq_len}").alias("pos_in_seq"),
            F.coalesce(F.col("token_id"), F.lit(0).cast("bigint")).alias("token_id"),
        )
    )


def tokenize_pack_ids_oracle_sql(
    seq_len: int = 512, vocab_size: int = VOCAB_SIZE
) -> str:
    """DuckDB twin — same vocabulary order (binary collation = UTF-8
    byte order = the Spark side's encode()), same serial-window stand-in
    for the prefix sum, same int64 cell arithmetic."""
    return rf"""
        WITH {pack_oracle_ctes(seq_len)}, counts AS (
            SELECT tok, count(*) AS tf FROM (
                SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents
            ) GROUP BY tok
        ), vtop AS (
            SELECT tok, tf FROM counts ORDER BY tf DESC, tok LIMIT {vocab_size}
        ), vocab AS (
            SELECT tok,
                   CAST(row_number() OVER (ORDER BY tf DESC, tok) AS BIGINT)
                       AS token_id
            FROM vtop
        ), placed AS (
            SELECT doc_id, i - 1 AS idx, toks[i] AS tok FROM (
                SELECT doc_id, toks,
                       unnest(range(1, len(toks) + 1)) AS i
                FROM (SELECT doc_id,
                             string_split_regex(lower(text), '\s+') AS toks
                      FROM documents)
            )
        )
        SELECT p.doc_id,
               CAST((c.s + p.idx) // {seq_len} AS BIGINT) AS seq_id,
               CAST((c.s + p.idx) % {seq_len} AS BIGINT) AS pos_in_seq,
               coalesce(v.token_id, 0) AS token_id
        FROM placed p
        JOIN c ON p.doc_id = c.doc_id
        LEFT JOIN vocab v ON p.tok = v.tok
        """


# Temperature sampling (mBERT/XLM-R style): sample sources with
# probability ∝ tokens_s^alpha, alpha < 1 flattening the head so
# low-resource domains are up-weighted relative to their natural share.
_TEMP_QUANT = 1000  # sqrt(tokens) quantization → integer sums, no
#                     order-dependent double accumulation across sources
_TEMP_BETA = 0.5  # sampled-corpus token budget as a share of the corpus


def temperature_sample(docs: DataFrame, beta: float = _TEMP_BETA) -> DataFrame:
    """Temperature-scaled (alpha=0.5) domain sampling: target share of
    source ``s`` is ``p_s = q_s / Q`` with ``q_s =
    floor(sqrt(tokens_s)·1000)`` and ``Q = Σ q_s``; the kept-token
    budget is ``beta·total_tokens``, so source ``s`` keeps
    ``rate_s = min(1, beta·total·q_s / (Q·tokens_s))`` of its docs,
    membership decided by the portable md5 id-hash (reproducible,
    engine-independent). Unlike fixed-weight ``sample_domain_mixture``
    the weights are DERIVED from the corpus itself — the standard
    multilingual-pretraining recipe for up-weighting small domains.

    Exactness design: per-source token totals are integer sums;
    ``sqrt`` is correctly-rounded IEEE in every engine and its output
    is floor-quantized to an integer BEFORE the cross-source sum, so no
    double accumulation depends on aggregation order; the single rate
    expression is written with identical association on both engines.

    Plan shape at 100 TB: one tokenize pass (persisted projection
    feeds totals + membership), per-source totals are a model-sized
    aggregate broadcast back as a map-side filter — the corpus itself
    never shuffles."""
    tok = tracked_persist(
        docs.select(
            "doc_id",
            "source",
            F.expr(f"CAST(size({TOKENS_SQL}) AS BIGINT)").alias("n_tok"),
        )
    )
    totals = tok.groupBy("source").agg(F.sum("n_tok").alias("toks_s"))
    q = totals.withColumn(
        "q_s",
        F.floor(F.sqrt(F.col("toks_s").cast("double")) * _TEMP_QUANT).cast("bigint"),
    )
    corpus = q.agg(
        F.sum("q_s").alias("qq"), F.sum("toks_s").alias("tot")
    )
    rate = (
        f"least(1.0, {beta} * CAST(tot AS DOUBLE) * CAST(q_s AS DOUBLE)"
        f" / (CAST(qq AS DOUBLE) * CAST(toks_s AS DOUBLE)))"
    )
    rates = q.join(F.broadcast(corpus)).select(
        "source",
        F.expr(f"CAST(floor(({rate}) * {_MIX_RES}) AS BIGINT)").alias("thr"),
    )
    return (
        tok.join(F.broadcast(rates), "source")
        .filter(
            F.expr(f"{h32_spark_sql('CAST(doc_id AS STRING)')} % {_MIX_RES}")
            < F.col("thr")
        )
        .select("doc_id", "source", "n_tok")
    )


def temperature_sample_oracle_sql(beta: float = _TEMP_BETA) -> str:
    """DuckDB twin of :func:`temperature_sample` — identical integer
    quantization, identical rate expression association, identical
    portable-hash membership."""
    from kafka_topic_dumper_spark.functions.portable_hash import h32_duckdb_sql

    h = h32_duckdb_sql("CAST(doc_id AS VARCHAR)")
    return rf"""
        WITH tok AS (
            SELECT doc_id, source,
                   CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
                       AS n_tok
            FROM documents
        ), totals AS (
            SELECT source, sum(n_tok) AS toks_s FROM tok GROUP BY source
        ), q AS (
            SELECT source, toks_s,
                   CAST(floor(sqrt(CAST(toks_s AS DOUBLE)) * {_TEMP_QUANT})
                        AS BIGINT) AS q_s
            FROM totals
        ), corpus AS (
            SELECT sum(q_s) AS qq, sum(toks_s) AS tot FROM q
        ), rates AS (
            SELECT source,
                   CAST(floor(least(1.0, {beta} * CAST(tot AS DOUBLE)
                        * CAST(q_s AS DOUBLE)
                        / (CAST(qq AS DOUBLE) * CAST(toks_s AS DOUBLE)))
                        * {_MIX_RES}) AS BIGINT) AS thr
            FROM q CROSS JOIN corpus
        )
        SELECT doc_id, tok.source AS source, n_tok
        FROM tok JOIN rates ON tok.source = rates.source
        WHERE ({h} % {_MIX_RES}) < thr
        """


def clean_dedup_pack(
    docs: DataFrame, lang: str = "en", seq_len: int = DEFAULT_SEQ_LEN, buckets: int = 32
) -> DataFrame:
    """End-to-end corpus prep as ONE declarative plan: language filter →
    canonical exact dedup (min-doc_id survivor per normalized-text
    group) → sequence packing. Composition is the point — each stage is
    the same operator exposed individually, and Catalyst fuses the
    filter+dedup projection into the packing scan; nothing materializes
    between stages."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = Window.partitionBy("fp")
    survivors = (
        docs.filter(F.col("lang") == lang)
        .select("doc_id", "text", F.md5(norm).alias("fp"))
        .withColumn("k", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("k"))
        .select("doc_id", "text")
    )
    return pack_sequences(survivors, seq_len=seq_len, buckets=buckets)


def clean_dedup_pack_oracle_sql(lang: str = "en", seq_len: int = DEFAULT_SEQ_LEN) -> str:
    return rf"""
        WITH en AS (
            SELECT doc_id, text FROM documents WHERE lang = '{lang}'
        ), f AS (
            SELECT doc_id, text,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM en
        ), cleaned AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (PARTITION BY fp) AS k
                FROM f
            ) WHERE doc_id = k
        ), {pack_oracle_ctes(seq_len, 'cleaned')}{pack_oracle_select(seq_len)}"""


QUALITY_MAX_BITS = 4.91


def quality_dedup_pack(
    docs: DataFrame,
    max_bits: float = QUALITY_MAX_BITS,
    seq_len: int = DEFAULT_SEQ_LEN,
    buckets: int = 32,
) -> DataFrame:
    """The full training-data prep statement: corpus-trained bigram-LM
    quality filter (keep documents the corpus model finds unsurprising,
    ``bits_per_bigram <= max_bits``) → canonical exact dedup → sequence
    packing, one declarative plan. The LM is trained on the UNFILTERED
    corpus — scoring must not depend on what later stages drop.
    Documents with fewer than two tokens carry no bigram evidence and
    are filtered with the low-quality tail (inner join semantics, same
    as the oracle). Scale: the quality stage adds the bigram model's
    one corpus shuffle (see text.bigram_lm_quality); the score join is
    doc_id-keyed; dedup + packing are unchanged."""
    from kafka_topic_dumper_spark.operators.text import bigram_lm_quality

    keep = (
        bigram_lm_quality(docs)
        .filter(F.col("bits_per_bigram") <= max_bits)
        .select("doc_id")
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = Window.partitionBy("fp")
    survivors = (
        docs.join(keep, "doc_id")
        .select("doc_id", "text", F.md5(norm).alias("fp"))
        .withColumn("k", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("k"))
        .select("doc_id", "text")
    )
    return pack_sequences(survivors, seq_len=seq_len, buckets=buckets)


def quality_dedup_pack_oracle_sql(
    max_bits: float = QUALITY_MAX_BITS, seq_len: int = DEFAULT_SEQ_LEN
) -> str:
    from kafka_topic_dumper_spark.operators.text import bigram_lm_oracle_ctes

    return rf"""
        WITH {bigram_lm_oracle_ctes()}, kept AS (
            SELECT d.doc_id, d.text
            FROM documents d JOIN lmq USING (doc_id)
            WHERE lmq.bits_per_bigram <= {max_bits}
        ), f2 AS (
            SELECT doc_id, text,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM kept
        ), cleaned AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (PARTITION BY fp) AS k
                FROM f2
            ) WHERE doc_id = k
        ), {pack_oracle_ctes(seq_len, 'cleaned')}{pack_oracle_select(seq_len)}"""


def chunk_documents(
    docs: DataFrame, window: int = 64, stride: int = 32
) -> DataFrame:
    """RAG/training-style sliding-window chunking: each document's
    whitespace token stream is cut into ``window``-token chunks every
    ``stride`` tokens (overlapping when stride < window). Output is
    one row per (doc_id, chunk_id) with the chunk text and its true
    token count (the final chunk is short when the document doesn't
    divide evenly); documents with zero tokens yield zero chunks.

    Scale shape: a pure map stage — tokenize, generate the start
    offsets with ``sequence``, ``posexplode``, ``slice`` — all JVM
    expressions inside one WholeStageCodegen span, no shuffle, no
    Python. Chunk rows inherit the input partitioning, so a 100 TB
    corpus chunks at scan parallelism with text read exactly once."""
    toks = docs.select(
        "doc_id",
        F.expr(f"filter({TOKENS_SQL}, t -> t != '')").alias("toks"),
    ).withColumn("n", F.size("toks"))
    # sequence(0, n-1, stride) DESCENDS when n = 0 (start > stop) —
    # guard empty docs to an empty start list (= DuckDB range(0,0,s)).
    starts = F.when(
        F.col("n") > 0,
        F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride)),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    return (
        toks.select("doc_id", "toks", "n", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("integer").alias("chunk_id"),
            F.least(F.lit(window), F.col("n") - F.col("start"))
            .cast("integer")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(window)), " "
            ).alias("chunk_text"),
        )
    )


def chunk_documents_oracle_sql(window: int = 64, stride: int = 32) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t != '') AS toks
            FROM documents
        ), st AS (
            SELECT doc_id, toks, len(toks) AS n,
                   unnest(range(0, len(toks), {stride})) AS start
            FROM toks
        )
        SELECT doc_id,
               CAST(start // {stride} AS INTEGER) AS chunk_id,
               CAST(least({window}, n - start) AS INTEGER) AS n_tokens,
               array_to_string(list_slice(toks, start + 1, start + {window}), ' ')
                   AS chunk_text
        FROM st
    """


def epoch_shuffle(docs: DataFrame, n_epochs: int = 3) -> DataFrame:
    """Deterministic per-epoch global shuffle order — the reproducible
    data-order contract of a training run: epoch e's order is the sort
    of ``md5(e || ':' || doc_id)``, so any engine (and any re-run after
    preemption) derives the identical (epoch, position → doc_id) map
    without a stored permutation table.

    Scale shape: the naive form (``row_number`` over
    ``partitionBy(epoch)``) is the single-task trap — one task per
    epoch sorts the ENTIRE corpus. This is instead the same two-phase
    distributed prefix sum as :func:`pack_sequences`, with a twist that
    removes even that function's range-bucketing step: the sort key is
    a uniform md5 hex string, so its leading two hex digits ARE a
    256-way range bucketing (every key in bucket 0x3a sorts before
    every key in 0x3b) — a pure function of the row, recompute-safe.
    Local ranks come from 256 parallel windows per epoch; the 256 ×
    n_epochs bucket counts are the one metadata-sized driver
    round-trip, exclusive-prefixed into per-bucket position bases and
    broadcast back. The shuffled rows carry (doc_id, 32-byte key) —
    never document payloads."""
    epochs = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    ).withColumn(
        "shuffle_key",
        F.md5(F.concat_ws(":", F.col("epoch"), F.col("doc_id"))),
    ).withColumn(
        "bucket", F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("int")
    )
    epochs = tracked_persist(epochs)
    counts = {
        (r.epoch, r.bucket): r.n
        for r in epochs.groupBy("epoch", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    bases = []
    for e in range(n_epochs):
        acc = 0
        for b in range(256):
            bases.append((e, b, acc))
            acc += counts.get((e, b), 0)
    base_df = docs.sparkSession.createDataFrame(
        bases, "epoch int, bucket int, base long"
    )
    w = Window.partitionBy("epoch", "bucket").orderBy("shuffle_key", "doc_id")
    return (
        epochs.join(F.broadcast(base_df), ["epoch", "bucket"])
        .select(
            F.col("epoch").cast("integer").alias("epoch"),
            # BIGINT: an int32 position silently wraps past ~2.1 B docs
            # per epoch — exactly the scale this prefix-sum form exists
            # for (code-review r6 finding).
            (F.col("base") + F.row_number().over(w)).cast("bigint").alias("position"),
            "doc_id",
        )
    )


def epoch_shuffle_oracle_sql(n_epochs: int = 3) -> str:
    return f"""
        WITH e AS (
            SELECT doc_id, unnest(range(0, {n_epochs})) AS epoch
            FROM documents
        ), keyed AS (
            SELECT doc_id, epoch,
                   md5(CAST(epoch AS VARCHAR) || ':' ||
                       CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM e
        )
        SELECT CAST(epoch AS INTEGER) AS epoch,
               CAST(row_number() OVER (PARTITION BY epoch
                    ORDER BY shuffle_key, doc_id) AS BIGINT) AS position,
               doc_id
        FROM keyed
    """


def stratified_sample(docs: DataFrame, k: int = 5) -> DataFrame:
    """Deterministic stratified sample: the k hash-smallest documents
    per (lang, source) stratum — uniform within the stratum because
    md5(doc_id) order is independent of every document attribute, and
    reproducible because it's a pure function of the ids (the same
    portable-hash membership idea as ``sample_domain_mixture``, but
    producing an exact per-stratum count instead of a rate).

    Scale shape: one shuffle on the stratum key; the rank ≤ k filter
    is the pattern Spark's WindowGroupLimit rule (3.5+) rewrites into
    a partial top-k on the map side, so each task forwards at most k
    rows per stratum and the shuffled volume is O(strata × k), not the
    corpus."""
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("integer"))
        .where(F.col("sample_rank") <= k)
        .select("lang", "source", "sample_rank", "doc_id")
    )


def stratified_sample_oracle_sql(k: int = 5) -> str:
    return f"""
        SELECT lang, source,
               CAST(row_number() OVER (PARTITION BY lang, source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                    AS INTEGER) AS sample_rank,
               doc_id
        FROM documents
        QUALIFY sample_rank <= {k}
    """


_PRIORITY_SAMPLE_K = 100
# 2^48 — the uniform's denominator; 48 md5 bits keep w·2^48/(h+1)
# well inside float64's exact-operation range.
_PRIORITY_SCALE = float(1 << 48)


def priority_sample(docs: DataFrame, k: int = _PRIORITY_SAMPLE_K) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield–Lund–Thorup, JACM 2007): draw u_i uniform from a
    deterministic 48-bit md5 slice of the doc id, give each item
    priority q_i = w_i / u_i (w_i = n_chars — the size proxy), keep
    the k highest priorities, and set each survivor's unbiased weight
    estimator to max(w_i, τ) where τ is the (k+1)-th priority. The sum
    of estimators is an unbiased estimate of total corpus weight —
    THE primitive for weight-proportional corpus subsampling with
    calibrated totals.

    Cross-engine exactness: u and w are integers both engines derive
    identically (md5 hex slice), and priority = w · 2^48 / (h+1) uses
    only IEEE-754 multiply/divide, which are correctly rounded —
    bit-identical in Spark and DuckDB, unlike libm pow/ln (the same
    reasoning as the log-free TF-IDF row).

    Scale shape: priorities are pure JVM-side row expressions; the
    global top-(k+1) is TakeOrderedAndProject — each task forwards at
    most k+1 rows, the driver merges O(tasks·k) — no shuffle of the
    corpus, no full sort. τ is then a 1-row broadcast join."""
    pr = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("double").alias("w"),
        (
            F.col("n_chars").cast("double")
            * F.lit(_PRIORITY_SCALE)
            / (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                    16,
                    10,
                ).cast("bigint")
                + F.lit(1)
            ).cast("double")
        ).alias("priority"),
    )
    top = pr.orderBy(F.desc("priority"), "doc_id").limit(k + 1)
    top = tracked_persist(top)
    tau = top.agg(F.min("priority").alias("tau"))
    return (
        top.orderBy(F.desc("priority"), "doc_id")
        .limit(k)
        .join(F.broadcast(tau))
        .select(
            "doc_id",
            "lang",
            F.col("w").cast("bigint").alias("weight"),
            "priority",
            F.greatest(F.col("w"), F.col("tau")).alias("est_weight"),
        )
    )


def priority_sample_oracle_sql(k: int = _PRIORITY_SAMPLE_K) -> str:
    return f"""
        WITH pr AS (
            SELECT doc_id, lang, n_chars,
                   CAST(n_chars AS DOUBLE) * {_PRIORITY_SCALE!r} /
                   CAST(CAST('0x' || substring(
                            md5(CAST(doc_id AS VARCHAR)), 1, 12)
                        AS BIGINT) + 1 AS DOUBLE) AS priority
            FROM documents
        ), ranked AS (
            SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id)
                   AS rk
            FROM pr
        ), tau AS (
            SELECT min(priority) AS t FROM ranked WHERE rk <= {k + 1}
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, priority,
               greatest(CAST(n_chars AS DOUBLE), t) AS est_weight
        FROM ranked, tau
        WHERE rk <= {k}
    """


def register(reg) -> None:
    from pyspark.sql import SparkSession

    from kafka_topic_dumper_spark.sources.tables import load_table

    @reg("pack_training_sequences", pack_sequences_oracle_sql(512))
    def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Concat-and-chunk packing of the documents corpus into
        512-token training sequences via the distributed prefix sum
        (8 range buckets exercise the multi-bucket path at test SF)."""
        return pack_sequences(
            load_table(spark, sf_dir, "documents"), seq_len=512, buckets=8
        )

    @reg("sample_domain_mixture", sample_domain_mixture_oracle_sql())
    def sample_domain_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Deterministic token-weighted domain mixing over three
        sources (50/30/20 target)."""
        return sample_domain_mixture(load_table(spark, sf_dir, "documents"))

    @reg("sample_weighted_priority", priority_sample_oracle_sql())
    def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Priority sampling (Duffield–Lund–Thorup): size-weighted
        k-sample without replacement with the unbiased max(w, τ)
        estimator attached; top-(k+1) via TakeOrderedAndProject, no
        corpus shuffle, exact cross-engine doubles (IEEE mul/div on
        integer-derived operands only)."""
        return priority_sample(load_table(spark, sf_dir, "documents"))

    @reg("pipeline_tokenize_pack_ids", tokenize_pack_ids_oracle_sql())
    def pipeline_tokenize_pack_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Corpus → packed training cells: every token's (sequence,
        position, vocab-id) under a 1024-token closed vocabulary and
        512-token sequences."""
        return tokenize_pack_ids(
            load_table(spark, sf_dir, "documents"), seq_len=512, buckets=8
        )

    @reg("sample_domain_temperature", temperature_sample_oracle_sql())
    def sample_domain_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Temperature-scaled (alpha=0.5) corpus-derived domain
        sampling — up-weights low-resource sources."""
        return temperature_sample(load_table(spark, sf_dir, "documents"))

    @reg("pipeline_quality_dedup_pack", quality_dedup_pack_oracle_sql(QUALITY_MAX_BITS, 512))
    def pipeline_quality_dedup_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Composed pipeline: bigram-LM quality filter -> canonical
        dedup -> 512-token packing, one declarative plan."""
        return quality_dedup_pack(
            load_table(spark, sf_dir, "documents"),
            QUALITY_MAX_BITS,
            512,
            buckets=8,
        )

    @reg("chunk_documents_sliding", chunk_documents_oracle_sql(64, 32))
    def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sliding-window chunking of the documents corpus (64-token
        windows, 32-token stride) — one map stage, no shuffle."""
        return chunk_documents(load_table(spark, sf_dir, "documents"), 64, 32)

    @reg("epoch_shuffle_order", epoch_shuffle_oracle_sql(3))
    def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Reproducible 3-epoch global shuffle order (hash-keyed
        distributed sort per epoch)."""
        return epoch_shuffle(load_table(spark, sf_dir, "documents"), 3)

    @reg("sample_stratified_per_group", stratified_sample_oracle_sql(5))
    def sample_stratified_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Deterministic 5-per-(lang,source) stratified sample via
        hash-order TopK per stratum."""
        return stratified_sample(load_table(spark, sf_dir, "documents"), 5)

    @reg("pipeline_clean_dedup_pack", clean_dedup_pack_oracle_sql("en", 512))
    def pipeline_clean_dedup_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Composed corpus-prep pipeline: lang='en' filter → canonical
        dedup → 512-token sequence packing, one declarative plan."""
        return clean_dedup_pack(
            load_table(spark, sf_dir, "documents"), "en", 512, buckets=8
        )
