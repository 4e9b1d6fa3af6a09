"""JSONL/CSV ingest: typed round trip, corrupt-line quarantine (no
silent loss), and schema-pass-count discipline (no inference)."""

from __future__ import annotations

from kafka_topic_dumper_spark.sources.ingest import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_quarantine,
)
from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "corpus.jsonl")
    jsonl = [r for (r,) in docs.selectExpr("to_json(struct(*)) j").toLocalIterator()]
    jsonl.insert(3, '{"doc_id": "not-a-number", "text": 17')  # malformed
    jsonl.insert(7, "garbage line")
    with open(path, "w") as f:
        f.write("\n".join(jsonl))

    raw = read_jsonl(spark, path)
    assert CORRUPT_COL in raw.columns
    clean, bad = split_quarantine(raw)
    assert bad.count() == 2  # both bad lines quarantined, none dropped
    assert clean.count() == docs.count()
    a = sorted(map(tuple, clean.select(*docs.columns).collect()))
    b = sorted(map(tuple, docs.collect()))
    assert a == b  # typed values identical to the parquet original


def test_cli_ingest_end_to_end(spark, tmp_path):
    """The ingest subcommand writes clean parquet + a quarantine dir."""
    import glob

    from kafka_topic_dumper_spark.cli import main

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "corpus.jsonl")
    jsonl = [r for (r,) in docs.selectExpr("to_json(struct(*)) j").toLocalIterator()]
    jsonl.append("{broken json")
    with open(src, "w") as f:
        f.write("\n".join(jsonl))
    out = str(tmp_path / "ingested")
    assert main(["ingest", "--input", src, "--output", out]) == 0
    clean = spark.read.parquet(out + "/clean")
    assert clean.count() == docs.count()
    assert spark.read.parquet(out + "/quarantine").count() == 1
    assert glob.glob(out + "/clean/*.parquet")


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    docs = load_table(spark, SF, "documents").selectExpr(
        "doc_id", "lang", "source", "n_chars"
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    csv_file = str(tmp_path / "corpus.csv")
    with open(csv_file, "w") as f:
        f.write("doc_id,lang,source,n_chars\n")
        for r in docs.toLocalIterator():
            f.write(f"{r.doc_id},{r.lang},{r.source},{r.n_chars}\n")
        f.write("oops,this,row,not-a-number\n")

    raw = read_csv(spark, csv_file, schema=schema)
    clean, bad = split_quarantine(raw)
    assert bad.count() == 1
    assert clean.count() == docs.count()
    a = sorted(map(tuple, clean.collect()))
    b = sorted(map(tuple, docs.collect()))
    assert a == b


def test_streaming_ingest_quarantine_and_idempotent_restart(spark, tmp_path):
    """Streaming twin: files land → micro-batches split clean vs
    quarantine into per-batch dirs; a restart from the same checkpoint
    reprocesses nothing."""
    import json as jsonlib

    from kafka_topic_dumper_spark.sources.ingest import ingest_stream

    land = tmp_path / "landing"
    land.mkdir()
    rows = [
        {"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s", "n_chars": 5}
        for i in range(6)
    ]
    (land / "a.jsonl").write_text(
        "\n".join(jsonlib.dumps(r) for r in rows[:3]) + "\n{not json\n"
    )
    (land / "b.jsonl").write_text("\n".join(jsonlib.dumps(r) for r in rows[3:]))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = ingest_stream(spark, str(land), out, ckpt)
    q.awaitTermination(120)

    clean = spark.read.parquet(out + "/clean")
    assert sorted(r.doc_id for r in clean.collect()) == list(range(6))
    from kafka_topic_dumper_spark.sources.ingest import read_quarantine

    bad = read_quarantine(spark, out)
    assert bad.count() == 1 and "{not json" in bad.collect()[0].raw_line
    # a clean-only run never creates the dir; the reader returns empty
    assert read_quarantine(spark, str(tmp_path / "nowhere")).count() == 0
    # maxFilesPerTrigger=1 → one batch per file → per-batch dirs
    import glob

    assert len(glob.glob(out + "/clean/ingest_batch=*")) >= 2

    # restart: same checkpoint, no new files → nothing reprocessed
    q2 = ingest_stream(spark, str(land), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out + "/clean").count() == 6
    assert read_quarantine(spark, out).count() == 1


def test_orc_roundtrip_preserves_documents(spark, tmp_path):
    """Native ORC write+read must preserve every row and column of the
    corpus exactly (schema included) — the second columnar format."""
    from kafka_topic_dumper_spark.sources.ingest import read_orc, write_orc
    from kafka_topic_dumper_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    want = sorted(map(tuple, docs.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want
