"""trino_demo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference demo (najann/trino-demo).

The reference federates PostgreSQL / MongoDB / Kafka behind Trino and does
its dataflow client-side in pandas; this package re-expresses the whole
surface engine-side as Spark DataFrame / SQL plans (Catalyst-optimized),
plus the LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
    session      SparkSession factory with scale-aware defaults
    registry     schema registry + table catalog (the three declaration
                 styles of the reference: DDL / sidecar / mapping)
    operators/   relational, aggregate, and window operator library
    functions/   scalar function helpers
    sources/     csv/jdbc/kafka/document source & sink adapters
    streaming/   Structured Streaming equivalents of the Kafka surface
    llm/         dedup, similarity, text analysis, multimodal plumbing
    parity       the declared query inventory (SURVEY.md §2) wired to
                 testdata tables, with DuckDB oracle SQL for each
"""

__version__ = "0.1.0"
