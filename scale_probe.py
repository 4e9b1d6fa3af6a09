"""Scale probe: run the engine's heaviest plans at R× the bench data.

Addresses the standing verdict item (r2 #6): the 100 TB claims are
argued in docstrings and plan tests — this script MEASURES them, as far
as a single 32-core box allows, by replicating the sf0.1 tables R× in-
plan (no files written) and running the most shuffle- and memory-
intensive operators end-to-end. R=10 ≈ sf1, R=100 ≈ sf10 (60M lineitem
rows) under the same 8 GiB driver heap the bench uses — an OOM, a
runaway spill, or super-linear wall-time growth fails loudly here.

Replication is NOT row duplication: every key column is remapped
(``id*R + r``) so join fan-outs and group counts scale the way a real
bigger dataset would, document text gets a per-replica suffix (10
NEAR-duplicate variants per doc — a worst-realistic-case corpus for
the LSH/minhash paths), and embeddings get a per-replica float
perturbation so vectors are distinct.

Usage: ``python scale_probe.py [R ...]`` (default ``1 10``). Prints one
JSON line per (R, probe) with wall seconds, output rows, and JVM heap
in use after the probe; a final line per R totals it. Results are
summarized in SCALE_PROBE.md.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

# set by the stream_sessionize probe: state rows carried per batch
LAST_STATE_ROWS = None


def replicate(df: DataFrame, r: int, id_cols: list[str]) -> DataFrame:
    """R× the table, remapping every key in ``id_cols`` to ``id*R + rep``
    so keys stay unique and join relationships are preserved across
    replicas (replica r of orders joins replica r of customer)."""
    if r <= 1:
        return df
    rep = F.broadcast(SparkSession.active().range(r).select(F.col("id").alias("_rep")))
    out = df.crossJoin(rep)
    for c in id_cols:
        out = out.withColumn(c, F.col(c) * r + F.col("_rep"))
    return out


def load_replicated(spark: SparkSession, sf_dir: str, r: int) -> dict[str, DataFrame]:
    from kafka_topic_dumper_spark.sources.tables import load_table

    t: dict[str, DataFrame] = {}
    t["lineitem"] = replicate(
        load_table(spark, sf_dir, "lineitem"), r, ["l_orderkey"]
    )
    t["orders"] = replicate(
        load_table(spark, sf_dir, "orders"), r, ["o_orderkey", "o_custkey"]
    )
    t["customer"] = replicate(
        load_table(spark, sf_dir, "customer"), r, ["c_custkey"]
    )
    ev = replicate(
        load_table(spark, sf_dir, "events"), r, ["event_id", "user_id"]
    )
    # distinct wall-clock per replica so windows don't see R-way ties
    t["events"] = ev.withColumn(
        "ts", F.expr("timestampadd(SECOND, CAST(event_id % 7 AS INT), ts)")
    )
    docs = replicate(load_table(spark, sf_dir, "documents"), r, ["doc_id"])
    # near-duplicate variants, not byte-identical copies: each replica
    # appends a tiny suffix, so exact-dedup finds nothing while the
    # shingle/minhash paths face R-sized near-dup clusters.
    t["documents"] = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" r"), (F.col("doc_id") % r).cast("string"))
    ) if r > 1 else docs
    emb = replicate(load_table(spark, sf_dir, "embeddings"), r, ["vec_id"])
    t["embeddings"] = emb.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x: (x.cast("double") + (F.col("vec_id") % r) * 1e-3).cast("float"),
        ),
    ) if r > 1 else emb
    return t


def probes(t: dict[str, DataFrame], r: int = 1):
    from kafka_topic_dumper_spark.operators import dedup, packing, similarity

    li, orders, cust = t["lineitem"], t["orders"], t["customer"]

    def q1_agg():
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
        )

    def q3_join():
        cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
        return (
            li.filter(F.col("l_shipdate") > cutoff)
            .join(orders.filter(F.col("o_orderdate") < cutoff), li.l_orderkey == orders.o_orderkey)
            .join(cust.filter(F.col("c_mktsegment") == "BUILDING"), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
            .orderBy(F.col("revenue").desc())
            .limit(10)
        )

    def flagship_window():
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        return (
            t["events"].withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
        )

    def exact():
        return dedup.exact_dedup(t["documents"])

    def minhash():
        return dedup.minhash_lsh_dedup(t["documents"])

    def minhash_clusters():
        # the quadratic-free output mode: same banding as minhash, but
        # star edges → connected components → per-cluster survivor row;
        # the R=100 contrast with dedup_minhash_lsh (pair output) is
        # the point — output stays corpus-linear while pairs go
        # quadratic in the planted R-sized near-dup clusters
        return dedup.minhash_cluster_dedup(t["documents"])

    def ngram():
        return dedup.ngram_jaccard_pairs(t["documents"]).filter(F.col("jaccard") >= 0.8)

    def ann_lsh():
        qids = [int(x) for x in similarity.QUERY_IDS]
        return similarity.cosine_topk_lsh(t["embeddings"], qids, 10)

    def pack():
        return packing.pack_sequences(t["documents"])

    def bigram_lm():
        from kafka_topic_dumper_spark.operators import text

        return text.bigram_lm_quality(t["documents"])

    def ivf():
        qids = [int(x) for x in similarity.QUERY_IDS]
        return similarity.ivf_topk(t["embeddings"], qids, 10)

    def quality_pipeline():
        # max_bits loosened vs the registry default: the replica suffix
        # adds one rare bigram per doc, shifting every score ~+0.1 bits
        # — at 4.91 the filter would drop the whole synthetic corpus
        # and the dedup/pack stages would probe nothing
        return packing.quality_dedup_pack(
            t["documents"], max_bits=5.5, seq_len=512, buckets=32
        )

    def semantic():
        # k SCALED with the corpus (16·R) — the SemDeDup production
        # discipline (the paper uses k≈11k for LAION) that keeps
        # E[|cell|] constant so the per-cell quadratic term doesn't
        # grow. The fixed-k form was probed once: at R=100 a 185k-
        # member cell means ~2.8e11 in-cell pairs — the intrinsic
        # quadratic cost, not a plan defect (the blocked kernel keeps
        # memory at O(B²); time is the unavoidable part). Recorded in
        # SCALE_PROBE.md.
        return dedup.semantic_dedup(
            t["embeddings"], n_centroids=16 * r, threshold=0.40
        )

    def dup_spans():
        # the replica suffix makes replicas differ only in their last
        # token, so every 16-gram EXCEPT the final one duplicates
        # R-fold — a worst-realistic-case for the gram-count shuffle
        return dedup.duplicate_spans(t["documents"], 16, 2)

    def chunk():
        return packing.chunk_documents(t["documents"], 64, 32)

    def epoch_order():
        return packing.epoch_shuffle(t["documents"], 3)

    def knng():
        # nbits SCALES with the corpus (8/11/14 at R=1/10/100 — +~3.3
        # bits per decade keeps E[bucket size] constant), the same
        # density discipline as semantic dedup's k=16·R. With FIXED
        # 8-bit tables the R=100 run goes quadratic on INTER-cluster
        # collisions (2000-member buckets → ~2G candidate pairs —
        # measured 77 s at R=10 already, projected hours at R=100);
        # the planted 100-member near-dup clusters still collide at
        # any nbits and are the irreducible answer-shaped cost.
        nbits = 8 + (6 if r >= 100 else 3 if r >= 10 else 0)
        return similarity.knn_graph(t["embeddings"], nbits=nbits)

    def mutual_knn_clusters():
        # the r6 verdict's unprobed claim: CC sweep count must stay
        # bounded as the graph decade-scales (adaptive pointer-jumping
        # from sweep 4). Same nbits-per-decade density discipline as
        # knng; the probe records graph.LAST_SWEEP_COUNT per R — if
        # sweeps grow past the jumping bound, large-star/small-star
        # contraction (Kiveris et al.) is the named swap-in.
        nbits = 8 + (6 if r >= 100 else 3 if r >= 10 else 0)
        return similarity.mutual_knn_clusters(t["embeddings"], nbits=nbits)

    def _with_cc(fn, method):
        # A/B the CC engine on identical inputs: flip the module
        # default, build the (lazy) plan, restore — count() later
        # executes whatever connected_components dispatched to
        from kafka_topic_dumper_spark.operators import graph as graph_mod

        prev = graph_mod.CC_METHOD
        graph_mod.CC_METHOD = method
        try:
            return fn()
        finally:
            graph_mod.CC_METHOD = prev

    def minhash_clusters_contraction():
        return _with_cc(minhash_clusters, "contraction")

    def mutual_knn_clusters_contraction():
        return _with_cc(mutual_knn_clusters, "contraction")

    def bm25():
        from kafka_topic_dumper_spark.operators import text

        return text.bm25_topk(t["documents"])

    def triangles():
        # the R-sized near-dup cliques make the candidate graph
        # triangle-RICH (each k-clique holds C(k,3) triangles): the
        # claim under test is that degree orientation keeps the wedge
        # join bounded by out-degree² (≤ (k-1)²/4-ish per clique
        # member), never raw degree² — clique density must not go
        # quadratic in R beyond the answer itself
        from kafka_topic_dumper_spark.operators.graph import triangle_counts

        return triangle_counts(
            dedup.minhash_lsh_candidates(
                dedup.minhash_signatures(t["documents"])
            )
        )

    def lpa():
        # 4 synchronous sweeps, each one edge join + one (node,label)
        # count + one per-node top-1 window — edge-linear per sweep
        # with per-sweep localCheckpoint, same discipline as PageRank
        from kafka_topic_dumper_spark.operators.graph import label_propagation

        return label_propagation(
            dedup.minhash_lsh_candidates(
                dedup.minhash_signatures(t["documents"])
            )
        )

    def setsim():
        # answer-shaped quadratic on this corpus: the replica variants
        # of each doc form R-sized near-dup cliques at J ≥ 80%, so the
        # OUTPUT itself grows ~R²·docs — same contrast as the minhash
        # pair probe. What the probe charges to the machinery: the
        # rare-first prefixes must keep the candidate join off the
        # corpus-furniture shingles at every R (df of shared shingles
        # grows R×, but so does their global rank).
        return dedup.setsim_prefix_join_pairs(t["documents"])

    def editdist():
        # the replica suffix is lengthened beyond the D=30 horizon
        # (two md5 blocks per replica id — cross-replica pad distance
        # ≥ ~48) so variants of the same doc do NOT pair: that
        # quadratic answer is charged to the setsim probe above. The
        # answer here stays the 25 planted pairs × R (same-replica
        # twins share the pad), so this probe isolates the PRUNING
        # machinery's growth — gram-count shuffle, count-lemma filter,
        # adjacent-length-band join — at corpus scale.
        docs = t["documents"]
        if r > 1:
            docs = docs.withColumn(
                "text",
                F.concat(
                    F.col("text"),
                    F.lit(" "),
                    F.repeat(F.md5((F.col("doc_id") % r).cast("string")), 2),
                ),
            )
        return dedup.editdist_join_pairs(docs)

    def bpe_pairs():
        # the BPE scaling claim on display: corpus R× up, the word
        # VOCABULARY stays ~constant (replicas add only the "r<k>"
        # suffix words), so the sweep cost should track the one
        # corpus-scale word-count shuffle and nothing else
        from kafka_topic_dumper_spark.operators import bpe as bpe_mod

        return bpe_mod.pair_counts_first_sweep(t["documents"])

    def zorder():
        from kafka_topic_dumper_spark.operators import layout

        return layout.zorder_key(t["events"])

    def hilbert():
        # 16 chained branch-free projection levels — the claim under
        # test is that the unrolled CASE chain stays a pure map stage
        # (one min/max broadcast aside) whose cost is row-linear,
        # indistinguishable from the straight-line Morton interleave
        from kafka_topic_dumper_spark.operators import layout

        return layout.hilbert_key(t["events"])

    def kcore():
        # R-sized near-dup cliques make every clique member degree
        # ~R-1: the 3-core keeps ALL clique nodes at R ≥ 4, so output
        # is node-linear while the peel rounds stay edge-linear —
        # the claim is no round goes quadratic as cliques densify
        from kafka_topic_dumper_spark.operators.graph import kcore_membership

        return kcore_membership(
            dedup.minhash_lsh_candidates(
                dedup.minhash_signatures(t["documents"])
            )
        )

    def rolling_anomaly_probe():
        # bounded-frame window statistics: one user_id shuffle + one
        # in-partition sort; the claim is row-linear growth with O(1)
        # per-row state (20-element integer frames)
        from kafka_topic_dumper_spark.operators.analytics import (
            rolling_anomaly,
        )

        return rolling_anomaly(t["events"])

    def cusum_probe():
        # unbounded-prefix window statistics (running sum + running
        # extremum): same single (user, time) sort, still O(1) state
        from kafka_topic_dumper_spark.operators.analytics import (
            cusum_changepoints,
        )

        return cusum_changepoints(t["events"])

    def pca():
        # two corpus-linear Arrow passes + a d²-row exact reduce; the
        # claim is the driver leg stays METADATA-sized (64×64 ints)
        # no matter how big the corpus gets
        from kafka_topic_dumper_spark.operators.similarity import pca_project

        return pca_project(t["embeddings"])

    def tok_pack():
        # output is corpus-TOKEN-scale (one row per token) — the
        # heaviest row-count of any probe; the vocab stays constant
        # (replica suffixes), so the broadcast lookup never grows
        return packing.tokenize_pack_ids(t["documents"], seq_len=512, buckets=32)

    def pagerank():
        # 10 fixed iterations x (edge join + dst sum); edge-linear per
        # iteration with localCheckpoint lineage truncation — the
        # weighted-iteration cousin of the CC probes
        from kafka_topic_dumper_spark.operators.graph import (
            pagerank_fixed_point,
        )

        pairs = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("c"),
                (F.col("l_suppkey") * 2 + 1).alias("s"),
            )
            .distinct()
        )
        edges = pairs.select(
            F.col("c").alias("src"), F.col("s").alias("dst")
        ).union(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        return pagerank_fixed_point(edges)

    def pagerank_dangling():
        # the round-11 general-directed variant: raw customer→supplier
        # edges (every supplier a sink), dangling mass redistributed
        # per sweep via the is_sink filtered 1-row aggregate — the
        # claim under test is that the extra term stays metadata-sized
        # (a broadcast scalar) while the sweeps remain edge-linear
        from kafka_topic_dumper_spark.operators.graph import (
            pagerank_fixed_point,
        )

        edges = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"),
            )
            .distinct()
        )
        return pagerank_fixed_point(edges, redistribute_dangling=True)

    def stream_sessionize():
        # the applyInPandasWithState sessionizer (r7 verdict item 6):
        # replay the replicated events as 4 ts-range micro-batches and
        # drain through a REAL parquet sink with a checkpoint. The
        # 100 TB risk is state growth — the claim under test is that
        # state is ONE fixed-width tuple per distinct user ever seen
        # (O(keys), not O(events)); numRowsTotal per batch is captured
        # from the query progress into LAST_STATE_ROWS so the decade
        # table can print state rows carried per batch next to wall.
        import atexit
        import shutil
        import tempfile

        from kafka_topic_dumper_spark.streaming.queries import (
            write_ranged_replay_files,
        )
        from kafka_topic_dumper_spark.streaming.stateful import (
            sessionize_stream,
        )

        global LAST_STATE_ROWS
        root = tempfile.mkdtemp(prefix="probe_stream_sess_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = f"{root}/events"
        write_ranged_replay_files(
            t["events"].select(
                "event_id", "user_id", "event_type", "value", "ts"
            ),
            path,
            4,
            ("ts", "event_id"),
        )
        spark = t["events"].sparkSession
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string,"
                " value double, ts timestamp_ntz"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        q = (
            sessionize_stream(stream, flush_timeout=True)
            .writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise RuntimeError("sessionize probe exceeded 1800 s")
        per_batch = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = json.loads(p.json)
            for op in p.get("stateOperators", []):
                per_batch.append(int(op.get("numRowsTotal", -1)))
        LAST_STATE_ROWS = per_batch
        return spark.read.parquet(f"{root}/out")

    def stream_interval_join():
        # the stream-stream interval join (round 8): the 100 TB claim
        # under test is BOUNDED join state — both sides watermarked,
        # condition time-bounded, so buffered rows are evicted once
        # the opposite watermark passes; state must track the rows
        # inside the horizon, not the stream's history.
        import atexit
        import shutil
        import tempfile

        from kafka_topic_dumper_spark.streaming.queries import (
            write_ranged_replay_files,
        )
        from kafka_topic_dumper_spark.streaming.windows import (
            interval_join_stream,
        )

        global LAST_STATE_ROWS
        root = tempfile.mkdtemp(prefix="probe_stream_ij_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = f"{root}/events"
        write_ranged_replay_files(
            t["events"].select(
                "event_id", "user_id", "event_type", "value", "ts"
            ),
            path,
            4,
            ("ts", "event_id"),
        )
        spark = t["events"].sparkSession

        def side(event_type, id_alias, ts_alias):
            return (
                spark.readStream.schema(
                    "event_id long, user_id long, event_type string,"
                    " value double, ts timestamp_ntz"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
                .filter(F.col("event_type") == event_type)
                .select(
                    F.col("event_id").alias(id_alias),
                    "user_id",
                    F.expr(
                        "timestamp_micros(timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
                    ).alias(ts_alias),
                )
            )

        out = interval_join_stream(
            side("click", "click_id", "c_ts"),
            side("purchase", "purchase_id", "p_ts"),
            "user_id",
            "c_ts",
            "p_ts",
            max_delay="30 minutes",
            watermark="1 hour",
        ).select("click_id", "purchase_id")
        q = (
            out.writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise RuntimeError("interval-join probe exceeded 1800 s")
        per_batch = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = json.loads(p.json)
            for op in p.get("stateOperators", []):
                per_batch.append(int(op.get("numRowsTotal", -1)))
        LAST_STATE_ROWS = per_batch
        return spark.read.parquet(f"{root}/out")

    def stream_minhash():
        # the ONLINE near-dup filter: write the replicated corpus as 4
        # doc_id-range files (one range shuffle — the same backfill
        # split the registry row uses; write time is included in the
        # probe, it is part of the streaming path's real cost), then
        # drive the shared foreachBatch filter across the 4
        # micro-batches. Probes the cross-batch index claim: per-batch
        # cost tracks batch size x collision rate, not corpus size.
        import atexit
        import shutil
        import tempfile

        from kafka_topic_dumper_spark.streaming.queries import (
            run_minhash_stream_filter,
            write_ranged_replay_files,
        )

        root = tempfile.mkdtemp(prefix="probe_stream_minhash_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = f"{root}/docs"
        write_ranged_replay_files(
            t["documents"].select("doc_id", "text"), path, 4, ("doc_id",)
        )
        return run_minhash_stream_filter(
            t["documents"].sparkSession, path, timeout=1800
        )

    return {
        "q1_agg": q1_agg,
        "q3_join": q3_join,
        "flagship_window": flagship_window,
        "dedup_exact": exact,
        "dedup_minhash_lsh": minhash,
        "dedup_minhash_clusters": minhash_clusters,
        "dedup_ngram_jaccard": ngram,
        "similarity_topk_lsh": ann_lsh,
        "pack_sequences": pack,
        "bigram_lm_quality": bigram_lm,
        "similarity_topk_ivf": ivf,
        "quality_pipeline": quality_pipeline,
        "dedup_semantic": semantic,
        "dedup_duplicate_spans": dup_spans,
        "chunk_documents": chunk,
        "epoch_shuffle": epoch_order,
        "similarity_knn_graph": knng,
        "similarity_mutual_knn_clusters": mutual_knn_clusters,
        "dedup_minhash_clusters_contraction": minhash_clusters_contraction,
        "similarity_mutual_knn_clusters_contraction": mutual_knn_clusters_contraction,
        "text_bm25_topk": bm25,
        "dedup_setsim_prefix_join": setsim,
        "dedup_editdist_join": editdist,
        "graph_triangle_counts": triangles,
        "graph_label_propagation": lpa,
        "text_bpe_pair_counts": bpe_pairs,
        "layout_zorder_events": zorder,
        "layout_hilbert_events": hilbert,
        "graph_kcore": kcore,
        "embedding_pca_project": pca,
        "stats_rolling_anomaly": rolling_anomaly_probe,
        "stats_cusum_changepoints": cusum_probe,
        "pipeline_tokenize_pack_ids": tok_pack,
        "streaming_dedup_minhash": stream_minhash,
        "streaming_interval_join": stream_interval_join,
        "streaming_sessionize_state": stream_sessionize,
        "graph_pagerank": pagerank,
        "graph_pagerank_dangling": pagerank_dangling,
    }


def heap_mb(spark: SparkSession) -> int:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) / (1 << 20))


def main() -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kafka_topic_dumper_spark.session import get_session

    rs = [int(a) for a in sys.argv[1:]] or [1, 10]
    only = {p for p in os.environ.get("SPARK_GRAFT_PROBES", "").split(",") if p}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("scale_probe")
    for r in rs:
        t = load_replicated(spark, sf_dir, r)
        total = 0.0
        for name, fn in probes(t, r).items():
            if only and name not in only:
                continue
            spark.catalog.clearCache()
            from kafka_topic_dumper_spark.operators import graph as graph_mod

            graph_mod.LAST_SWEEP_COUNT = None
            global LAST_STATE_ROWS
            LAST_STATE_ROWS = None
            t0 = time.monotonic()
            rows = fn().count()
            secs = round(time.monotonic() - t0, 2)
            total += secs
            rec = {"R": r, "probe": name, "sec": secs, "rows": rows, "heap_mb": heap_mb(spark)}
            if graph_mod.LAST_SWEEP_COUNT is not None:
                rec["cc_sweeps"] = graph_mod.LAST_SWEEP_COUNT
            if LAST_STATE_ROWS is not None:
                rec["state_rows_per_batch"] = LAST_STATE_ROWS
            print(json.dumps(rec), flush=True)
        print(json.dumps({"R": r, "probe": "TOTAL", "sec": round(total, 2)}), flush=True)


if __name__ == "__main__":
    main()
