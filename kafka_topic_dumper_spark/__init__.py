"""kafka_topic_dumper_spark — a PySpark-native analytics/ETL engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of Cobliteam/kafka-topic-dumper: tail-N Kafka topic dumps to
chunked gzip Parquet, idempotent reload through pluggable transformers,
plus LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``    — SparkSession factory (AQE on, UTC, Arrow).
- ``plans``      — pure planning logic (tail-N offset planner).
- ``sources``    — dump-catalog discovery, Kafka reader option builders.
- ``operators``  — relational helpers + LLM-pipeline operators.
- ``functions``  — scalar function surface (reference F1-F6 parity).
- ``streaming``  — dump / reload pipelines and the state manifest.
- ``transform``  — the pluggable per-message transformer (UDTF) surface.
"""

__version__ = "0.1.0"
