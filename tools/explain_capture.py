"""Capture .explain("formatted") output for named registry queries.

Usage: python tools/explain_capture.py <outdir> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt (suffix from $EXPLAIN_SUFFIX,
default "before"). Iterative operators (pagerank, CC, k-core, LPA)
eagerly execute their sweeps at plan-construction time and return a
final plan whose lineage is checkpoint-truncated — the captured text
then shows the per-sweep terminal shape, which is the informative part.
"""

from __future__ import annotations

import os
import sys

from kafka_topic_dumper_spark import registry
from kafka_topic_dumper_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    spark = get_session("kafka_topic_dumper_spark-explain")
    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
