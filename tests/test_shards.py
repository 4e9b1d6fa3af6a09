"""Training-shard sink: fixed-shape sequence rows, contiguous shard
ranges, exact round-trip of the capstone's token cells."""

from __future__ import annotations

import glob
import re

from kafka_topic_dumper_spark.operators.packing import tokenize_pack_ids
from kafka_topic_dumper_spark.sinks.shards import (
    PAD_ID,
    read_token_shards,
    write_token_shards,
)
from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
L = 128


def test_token_shards_roundtrip_and_shape(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    cells = tokenize_pack_ids(docs, seq_len=L, buckets=4)
    cell_rows = cells.collect()
    path = str(tmp_path / "shards")
    write_token_shards(cells, path, seq_len=L, n_shards=4)

    back = read_token_shards(spark, path).collect()
    # every sequence row is fixed-shape
    assert all(len(r.token_ids) == L for r in back)
    # real cells round-trip exactly; padding only past n_real
    want = {}
    for c in cell_rows:
        want.setdefault(c.seq_id, {})[c.pos_in_seq] = c.token_id
    assert {r.seq_id for r in back} == set(want)
    for r in back:
        w = want[r.seq_id]
        assert r.n_real == len(w)
        for pos, tid in enumerate(r.token_ids):
            assert tid == w.get(pos, PAD_ID), (r.seq_id, pos)

    # shards hold contiguous, non-overlapping seq_id ranges
    ranges = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        ids = [r.seq_id for r in spark.read.parquet(f).select("seq_id").collect()]
        if ids:
            assert ids == sorted(ids)
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo, (ranges,)
