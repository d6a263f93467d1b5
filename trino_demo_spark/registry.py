"""Schema registry + table catalog.

The reference exposes three schema-declaration styles (SURVEY.md §1.2):
fixed DDL (PostgreSQL `fill_postgresql.sql:1-10`), sidecar-declared
(MongoDB `schemadef`, `fillMongoDB.ipynb:510-556`), and mapping files
(Kafka `trino/kafka/*.json`). The engine mirrors that idea with one
explicit ``StructType`` per table — never schema inference for engine
tables — and a lightweight three-part-name catalog
(``catalog.schema.table`` → canonical name, case-insensitive), standing in
for Trino's federated naming (`localTrinoTest.ipynb:120`
``mongodb.weather.weatherny`` / ``trinodemo.public.applehistory``).

At 100 TB an explicit schema is also a performance feature: it guarantees
column pruning reaches the parquet scan (no footer-merge schema inference
over thousands of files) and that every reader agrees on types.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import apply_runtime_confs

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# --- declared schemas (the "DDL" style) -------------------------------------
# These are the *logical* schemas the engine promises to queries. The
# physical parquet may differ in storage detail (events.ts is stored as
# TIMESTAMP(NANOS); see _normalize_events).

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # Kafka-shaped stream table: logical schema after JSON decode +
    # broker metadata (ts). ts_ns keeps the raw broker nanos.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("ts_ns", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(SCHEMAS)

# --- federated three-part naming (the "catalog" style) ----------------------
# catalog.schema.table aliases, resolved case-insensitively like Trino
# (`ON w.DATE = a.date`, localTrinoTest.ipynb:1186).
THREE_PART_ALIASES: dict[str, str] = {
    **{f"trinodemo.public.{t}": t for t in TABLE_NAMES},
    **{f"mongodb.weather.{t}": t for t in ("documents", "embeddings")},
    **{f"kafka.default.{t}": t for t in ("events",)},
}


def resolve_name(name: str) -> str:
    """Resolve a 1- or 3-part table name to its canonical table."""
    key = name.strip().lower()
    if key in SCHEMAS:
        return key
    if key in (k.lower() for k in THREE_PART_ALIASES):
        return {k.lower(): v for k, v in THREE_PART_ALIASES.items()}[key]
    raise KeyError(f"unknown table: {name!r}")


def event_ts_columns(ts_is_long: bool) -> tuple:
    """The (ts, ts_ns) normalization expressions for the two physical
    encodings of events.ts — THE single definition, shared by the batch
    path (_normalize_events) and the streaming twin
    (streaming.kafka_shape.stream_events) so a future encoding change
    cannot silently diverge between them."""
    if ts_is_long:
        ts = F.timestamp_micros(F.expr("ts div 1000")).alias("ts")
        ts_ns = F.col("ts").alias("ts_ns")
    else:
        ts = F.col("ts").cast("timestamp").alias("ts")
        ts_ns = (
            F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        ).alias("ts_ns")
    return ts, ts_ns


def _normalize_events(df: DataFrame) -> DataFrame:
    """Physical→logical normalization for the stream table.

    Schema-adaptive because the landing-zone layout has shipped two
    physical encodings of ``ts``:

    * TIMESTAMP(NANOS), which Spark's vectorized reader only accepts as
      raw int64 nanos via ``nanosAsLong`` — nanos kept as ``ts_ns``
      (the broker-precision ordering key), microsecond TimestampType
      ``ts`` derived;
    * native TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ
      under Spark's default NTZ inference) — ``ts`` is the NTZ column
      cast to the session type (UTC session ⇒ bit-faithful), ``ts_ns``
      derived as unix_micros·1000.

    Either way the logical schema is identical. Pure column arithmetic —
    stays in whole-stage codegen, no UDF.
    """
    ts, ts_ns = event_ts_columns(
        isinstance(df.schema["ts"].dataType, T.LongType)
    )
    return df.select(
        F.col("event_id").cast("long"),
        ts,
        ts_ns,
        F.col("user_id").cast("long"),
        "event_type",
        "value",
        "props",
    )


# Physical parquet schema per absolute file path (r12): plain
# spark.read.parquet runs footer schema inference as a 1-task Spark job
# on EVERY call — measured 94 ms/call vs 19 ms with the schema provided
# (local[32], warm) — and every query calls load_table once per table
# per execution. This memoizes the INFERRED SCHEMA ONLY (metadata — the
# role a metastore/catalog plays in production; reads still scan the
# parquet in full), keyed by path so different sf_dirs never mix. The
# first call per path still infers, so a regenerated file with a new
# layout is picked up by any fresh process (the driver/bench contract —
# one process per run — makes staleness impossible in practice).
_PHYSICAL_SCHEMA_MEMO: dict[str, T.StructType] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load a registry table as a DataFrame with its declared schema."""
    apply_runtime_confs(spark)
    sf_dir = sf_dir or DEFAULT_SF_DIR
    name = resolve_name(name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    phys = _PHYSICAL_SCHEMA_MEMO.get(path)
    if phys is None:
        df = spark.read.parquet(path)
        _PHYSICAL_SCHEMA_MEMO[path] = df.schema
    else:
        df = spark.read.schema(phys).parquet(path)
    if name == "events":
        df = _normalize_events(df)
    # Conform column order/casing to the declared schema (schema-on-read).
    declared = SCHEMAS[name]
    cols = {c.lower(): c for c in df.columns}
    return df.select([F.col(cols[f.name.lower()]).alias(f.name) for f in declared.fields])


def register_views(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register every registry table as a temp view, plus an alias view
    per federated three-part name (dots → underscores, since temp view
    names are single-part): ``trinodemo_public_lineitem`` etc."""
    for name in names:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        for alias, target in THREE_PART_ALIASES.items():
            if target == name:
                df.createOrReplaceTempView(alias.replace(".", "_"))


class Catalog:
    """Tiny session-scoped catalog: name → DataFrame, memoized per sf_dir."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir or DEFAULT_SF_DIR
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        key = resolve_name(name)
        if key not in self._cache:
            self._cache[key] = load_table(self.spark, key, self.sf_dir)
        return self._cache[key]

    def __getattr__(self, name: str) -> DataFrame:
        try:
            return self.table(name)
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e
