"""Schema-drift tripwires for the ``documents`` and ``embeddings``
tables — the same insurance ``events`` got after round 4 (see
test_events_schema.py): if a driver-side testdata regeneration changes
a dtype these operators assume, fail HERE with a named message instead
of in dozens of anonymous registry differentials.

Contract pinned:
- ``documents``: doc_id int64, text string (the dedup/text/packing
  suite tokenizes it), lang/source strings, n_chars int64.
- ``embeddings``: vec_id int64, embedding array<float> (every
  similarity kernel upcasts float32→float64 and assumes a fixed,
  uniform dimension).

If one of these fails, adapt ``sources/tables.py`` (add a normalizing
branch like the events one) — not the operators.
"""

from __future__ import annotations

from pyspark.sql import types as T

from kafka_topic_dumper_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_documents_schema_contract(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {f.name: f.dataType for f in docs.schema.fields}
    assert isinstance(got["doc_id"], T.LongType), got["doc_id"]
    assert isinstance(got["text"], T.StringType), got["text"]
    assert isinstance(got["lang"], T.StringType), got["lang"]
    assert isinstance(got["source"], T.StringType), got["source"]
    assert isinstance(got["n_chars"], T.LongType), got["n_chars"]


def test_embeddings_schema_and_uniform_dim(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {f.name: f.dataType for f in emb.schema.fields}
    assert isinstance(got["vec_id"], T.LongType), got["vec_id"]
    assert isinstance(got["embedding"], T.ArrayType), got["embedding"]
    elem = got["embedding"].elementType
    assert isinstance(elem, (T.FloatType, T.DoubleType)), (
        f"embedding element drifted to {elem} — similarity kernels upcast "
        "float32/float64 only; fix a normalizing branch in "
        "kafka_topic_dumper_spark/sources/tables.py::load_table."
    )
    from pyspark.sql import functions as F

    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert len(dims) == 1 and dims[0]["d"] == 64, (
        f"embedding dimension set {sorted(r['d'] for r in dims)} != {{64}} — "
        "the LSH hyperplanes, IVF codebook, and every oracle's range(1, 65) "
        "assume dim 64; regenerate expectations deliberately, in one place."
    )
