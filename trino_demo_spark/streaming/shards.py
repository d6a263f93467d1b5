"""Streaming crawl-shard ingestion: the arrival path of a live corpus.

A real 100 TB pipeline does not batch-load its corpus once — shards
land continuously (a crawler or exporter drops WARC.gz / WebDataset
files into object storage) and the engine tails the directory. Spark's
`binaryFile` source is the native reader for that shape: each new file
becomes one row (path, modificationTime, length, content), checkpointed
exactly-once per file, and the SAME Arrow mapInPandas parse used by
the batch entries (llm.warc / llm.webdataset) runs on the stream — the
batch/stream twin discipline this package applies everywhere
(streaming/kafka_shape.py).

Scale shape: file listing is the only driver-side work; record parsing
is per-file map-side with no shuffle, so ingest throughput scales with
executors. Watermarks/state are not needed — a shard is immutable once
closed, so the pipeline is stateless append.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("uri", T.StringType()),
        T.StructField("http_status", T.LongType()),
        T.StructField("body_len", T.LongType()),
        T.StructField("body_sig", T.LongType()),
    ]
)


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import os

    from ..llm import warc

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            parsed = warc.warc_records(bytes(content))
            idx = 0
            for rec in parsed["records"]:
                if rec["type"] != "response":
                    continue
                http = warc.parse_http_response(rec["body"])
                rows.append(
                    {
                        "shard": os.path.basename(str(path)),
                        "record_idx": idx,
                        "uri": rec["uri"],
                        "http_status": http["status"],
                        "body_len": len(http["body"]),
                        "body_sig": sum(http["body"][:16]) % 997,
                    }
                )
                idx += 1
        yield pd.DataFrame(
            rows,
            columns=[f.name for f in WARC_STREAM_SCHEMA.fields],
        )


def warc_shard_stream(spark: SparkSession, path: str) -> DataFrame:
    """Tail a directory of WARC shards: readStream binaryFile →
    map-side record parse. Append-only, stateless, exactly-once per
    file via the checkpoint."""
    # binaryFile's schema is fixed by the source, but the STREAMING
    # variant requires it stated explicitly (no inference on streams).
    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_batches, schema=WARC_STREAM_SCHEMA)


def warc_shard_batch(spark: SparkSession, path: str) -> DataFrame:
    """The batch twin over the same directory — the stream==batch
    equivalence anchor."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_batches, schema=WARC_STREAM_SCHEMA)
