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
