"""JDBC source/sink adapter (the reference's PostgreSQL catalog,
`trino/catalog/trinodemo.properties:1-6`).

No network database runs in the test container, but the wrappers ARE
exercised against a real JDBC engine: embedded Derby (shipped in
Spark's jars) round-trips write → single-task read → range-partitioned
parallel read → pushed-down filter in
tests/test_sources.py::test_jdbc_real_roundtrip_embedded_derby. The
parity suite additionally runs the same shapes on parquet stand-ins
(`scan_jdbc`, `sink_jdbc_copy`) for the driver's oracle compare. The
scale-relevant read options: predicate and projection pushdown are
automatic for the JDBC source; *parallel* reads require explicit
partitioning bounds, which Trino handles internally and Spark exposes
as options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int = 8,
    **properties: str,
) -> DataFrame:
    """Read a relational table. With a numeric/date partition_column the
    scan fans out to num_partitions range-bounded queries — the only way a
    JDBC scan parallelizes; without it the read is single-task (fine for
    dims, wrong for facts)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "read_table: partition_column requires BOTH lower_bound "
                "and upper_bound (str(None) would reach the JDBC source "
                "as the literal 'None')"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def write_table(
    df: DataFrame, url: str, table: str, mode: str = "append", batchsize: int = 10_000,
    **properties: str,
) -> None:
    """Bulk load (the `\\copy ... FORMAT csv` path of
    `fill_postgresql.sql:12`): batched inserts, append semantics."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
