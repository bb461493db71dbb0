"""PySpark-native analytics engine with the capabilities of the reference
``mtousif2303/azure-airbnb-cdc-ingestion-pipeline`` (an Azure Data Factory
Lambda-architecture CDC pipeline), rebuilt Spark-first.

The reference is declarative configuration (ADF JSON + one Mapping Data Flow
+ T-SQL); this package re-expresses WHAT it computes as idiomatic PySpark
DataFrame/SQL plans plus Structured-Streaming wiring:

- ``session``    — SparkSession factory (AQE on, tuned shuffle partitions)
- ``schemas``    — the reference's source/sink schemas as StructTypes
- ``sources``    — CSV/JSON/parquet readers, versioned parquet tables,
                   stream sources (change-feed analog)
- ``operators``  — conditional split, derive, project, lookup-latest join,
                   keyed MERGE/upsert, aggregation, window helpers
- ``functions``  — text analysis, dedup (exact/minhash/simhash/jaccard),
                   embedding similarity search
- ``streaming``  — foreachBatch CDC merge, windowed/sessionized aggs
- ``pipelines``  — orchestration parity (dim load, fact load, CDC chain)
- ``plans``      — the correctness-query catalog over /root/testdata
"""

__version__ = "0.1.0"
