"""`prep` CLI action: documents parquet → quality filter → canonical
dedup → vocab + fixed-shape token shards, end-to-end through main()."""

from __future__ import annotations

from kafka_topic_dumper_spark import cli
from kafka_topic_dumper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_prep_end_to_end(spark, tmp_path):
    out = str(tmp_path / "prep_out")
    rc = cli.main(
        [
            "prep",
            "--input",
            f"{SF}/documents.parquet",
            "--output",
            out,
            "--seq-len",
            "128",
            "--vocab-size",
            "256",
        ]
    )
    assert rc == 0

    vocab = spark.read.parquet(out + "/vocab")
    assert vocab.columns == ["tok", "token_id"]
    n_vocab = vocab.count()
    assert 0 < n_vocab <= 256
    ids = sorted(r.token_id for r in vocab.collect())
    assert ids == list(range(1, n_vocab + 1))

    shards = spark.read.parquet(out + "/shards")
    rows = shards.collect()
    assert rows and all(len(r.token_ids) == 128 for r in rows)
    # sequences cover exactly the kept corpus's token count
    total_real = sum(r.n_real for r in rows)
    assert total_real > 0
    # kept docs ≤ input docs (quality filter + dedup only ever drop)
    n_docs = load_table(spark, SF, "documents").count()
    assert total_real <= n_docs * 200  # sanity bound, not exact


def test_prep_requires_args(spark):
    assert cli.main(["prep"]) == 2


def test_prep_dry_run(spark, tmp_path):
    out = str(tmp_path / "never_written")
    rc = cli.main(
        ["prep", "--input", f"{SF}/documents.parquet", "--output", out, "-x"]
    )
    assert rc == 0
    import os

    assert not os.path.exists(out)
