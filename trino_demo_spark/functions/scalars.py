"""Scalar function helpers (SURVEY.md §2.8).

The reference conflates three NULL-ish representations — SQL NULL, float
NaN, and the *string* ``'NaN'`` (`localTrinoTest.ipynb:127` replaces the
string sentinel; `fillMongoDB.ipynb:187` fillna) — SURVEY.md §7 requires
normalizing all three at the scan boundary. Everything here is built-in
column expressions (JVM codegen), no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_nullish(col: Column, fill: float | None = None) -> Column:
    """Collapse SQL NULL, float NaN and the string sentinel 'NaN' into one
    representation: NULL (fill=None) or a fill value.

    Accepts string or numeric input: strings 'NaN'/'' become NULL first,
    then the value is cast to double and NaN-checked (nanvl).
    """
    as_str = col.cast("string")
    cleaned = F.when(as_str.isin("NaN", "nan", ""), F.lit(None)).otherwise(as_str)
    num = cleaned.cast("double")
    num = F.when(F.isnan(F.coalesce(num, F.lit(0.0))), F.lit(None)).otherwise(num)
    if fill is not None:
        num = F.coalesce(num, F.lit(float(fill)))
    return num


def strip_money(col: Column) -> Column:
    """`sed 's/\\$//g'` on money strings before numeric load
    (openshift_trino_demo_installation.txt:29) → regexp_replace +
    try_cast (malformed values become NULL, not job failures)."""
    return F.regexp_replace(col, r"\$", "").try_cast("double")


def parse_iso_date(col: Column) -> Column:
    """ISO8601 DATE decode (`"dataFormat": "iso8601"`,
    trino/kafka/stockdata.json:11-13)."""
    return F.to_date(col, "yyyy-MM-dd")


def parse_iso_timestamp(col: Column) -> Column:
    """`%Y-%m-%dT%H:%M:%S.%f` producer-side parse
    (stockDataProducer.py:17-19)."""
    return F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")


def affine(col: Column, shift: Column | float, scale: Column | float) -> Column:
    """(x - shift) / scale — the scaler transform core
    (localTrinoTest.ipynb:467-476)."""
    return (col - shift) / scale


def affine_inverse(col: Column, shift: Column | float, scale: Column | float) -> Column:
    """x * scale + shift — inverse_transform (localTrinoTest.ipynb:1908)."""
    return col * scale + shift


def json_encode(cols: Sequence[str]) -> Column:
    """Row → JSON string (producer value_serializer,
    stockDataProducer.py:38)."""
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def json_decode(col: Column, schema) -> Column:
    """JSON string → typed struct (Kafka table-description decode,
    trino/kafka/stockdata.json:4-6)."""
    return F.from_json(col, schema)


def cast_all(df: DataFrame, cols: Sequence[str], to: str = "float") -> DataFrame:
    """Cast measure columns (the reference's float32 astype loop,
    KubeflowStockPricePrediction.ipynb:229-230)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.col(c).cast(to))
    return out
