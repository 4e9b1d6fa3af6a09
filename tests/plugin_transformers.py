"""Test transformer plug-ins (FIXTURES.md §1.3): Identity is the
engine default; Explode tests 1→k flat-map semantics; Drop tests 1→0.
Loaded via the ``module:Class`` plug-in API."""

from __future__ import annotations

from kafka_topic_dumper_spark.transform import Transformer


class Explode(Transformer):
    """1→2: emits the row twice, second copy value-suffixed."""

    def transform(self, row):
        yield (row.key, row.value)
        suffix = b"-copy"
        yield (row.key, (row.value or b"") + suffix)

    def get_id(self) -> str:
        return "Explode"


class Drop(Transformer):
    """1→0 for null-keyed rows, else identity."""

    def transform(self, row):
        if row.key is not None:
            yield (row.key, row.value)

    def get_id(self) -> str:
        return "Drop"
