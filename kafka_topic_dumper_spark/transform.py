"""Pluggable per-message transformer surface (reference U1/U2).

The reference's plug-in protocol (transformer.py:2-8, loader
kafka_client.py:199-205) is a ``module:Class`` whose instance exposes
``transform(msg) -> Iterator[rows]`` (0..n output rows — flat-map
semantics, applied at kafka_client.py:395-398) and ``get_id() -> str``
(the idempotency cache key stored in the dump state).

This engine keeps the same plug-in API but executes it as an
Arrow-batched ``mapInPandas`` flat-map: the transformer sees one
pandas row at a time (``transform(row) -> iterable of (key, value)``)
while Spark moves data in vectorized batches. Plug-in modules are
registered with cloudpickle *by value*, so executors never need the
plug-in installed — the closure ships the code.
"""

from __future__ import annotations

import importlib
import sys
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class Transformer:
    """Protocol (duck-typed; subclassing optional): yield 0..n
    ``(key: bytes|None, value: bytes|None)`` tuples per input row."""

    def transform(self, row) -> Iterable[tuple[bytes | None, bytes | None]]:
        raise NotImplementedError

    def get_id(self) -> str:
        return type(self).__name__


class Identity(Transformer):
    """Default transformer — emits the row unchanged (reference
    transformer.py:2-8)."""

    def transform(self, row):
        yield (row.key, row.value)

    def get_id(self) -> str:
        return "Identity"


def load_transformer(spec: str | None):
    """Load ``"package.module:ClassName"`` (reference CLI flag
    main.py:69-72; dynamic import kafka_client.py:199-205). ``None`` →
    Identity. The plug-in module is registered for by-value pickling so
    the instance can ship inside UDF closures without the module being
    importable on executors."""
    if spec is None:
        return Identity()
    module_name, _, class_name = spec.partition(":")
    if not module_name or not class_name:
        raise ValueError(
            f"transformer spec must be 'module:Class', got {spec!r}"
        )
    module = importlib.import_module(module_name)
    try:
        import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception:  # pragma: no cover - best effort; plain stdlib pickle path
        pass
    cls = getattr(module, class_name)
    return cls()


TRANSFORM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
    ]
)


def apply_transformer(records: DataFrame, transformer) -> DataFrame:
    """Flat-map ``records`` (must have binary ``key``/``value``
    columns) through the transformer — the Spark form of the
    reference's per-row produce loop (kafka_client.py:395-398).

    mapInPandas gives vectorized Arrow transfer; inside each batch the
    transformer keeps its 1→0..n row-at-a-time contract, so reference
    plug-ins port by changing only their row accessors. The transformer
    instance is captured in the closure by value.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, values = [], []
            for row in pdf.itertuples(index=False):
                for out in transformer.transform(row):
                    keys.append(out[0])
                    values.append(out[1])
            yield pd.DataFrame({"key": keys, "value": values}, dtype=object)

    return records.select("key", "value").mapInPandas(
        run, schema=TRANSFORM_OUTPUT_SCHEMA
    )
