"""gmall-pyspark: a PySpark-native analytics engine with the query and
data-processing capabilities of ``hellohappyworld/flink-gmall2024-realtime``.

The reference is a Flink 1.17 real-time e-commerce data warehouse (ODS Kafka
topics -> DIM/DWD/DWD/DWS layers).  This package re-expresses every operator in
its inventory (SURVEY.md section 2) Spark-first: columnar DataFrames, Catalyst
optimization, Structured Streaming micro-batches, ``applyInPandas(WithState)``
only where genuinely stateful.

Layout
------
- ``session``    SparkSession factory (BaseApp equivalent; reference
                 ``realtime-common/.../base/BaseApp.java:24-62``).
- ``sources``    fixture/Kafka/CDC source builders
                 (``FlinkSourceUtil.java:24-77``).
- ``functions``  scalar function library (``DateFormatUtil.java``,
                 ``IKUtil.java`` equivalents) + deterministic hashing.
- ``operators``  batch-expressible operators: ETL filters, joins, windows,
                 splits, dedup, similarity search, text analysis, multimodal.
- ``streaming``  Structured Streaming pipelines, stateful processors and
                 sinks (watermarks, applyInPandasWithState, foreachBatch
                 keyed upserts and dynamic routing).
- ``plans``      the query catalog: every implemented capability as a
                 ``(spark_fn, oracle_sql)`` pair checked against DuckDB.
"""

__version__ = "0.1.0"
