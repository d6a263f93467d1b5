"""Custom connector via the Spark 4 Python DataSource API: a JSONL
(newline-delimited JSON) table reader.

This is the engine-extensibility twin of the reference's declared-mapping
connector configs (`trino/kafka/stockdata.json` maps JSON messages to a
typed table; `trino/catalog/*.properties` declare external stores): where
Trino needs a deployed connector plugin + sidecar schema, Spark 4 lets the
engine register a first-class source in Python — it participates in the
DataFrame reader API, schema declaration, and task-parallel scans like any
built-in format.

Scale shape: `partitions()` returns one InputPartition per data file, so a
directory of N part files scans as N parallel tasks (each executor parses
only its file). Parsing is stdlib-json per line — this source exists to
prove the connector surface; bulk columnar formats should stay on the
native parquet/csv readers (the read path here is Python-speed by design
and says so).

Known divergence from Spark's native JSON reader: a line whose top-level
value is an ARRAY of objects is quarantined as one corrupt record here
(this source is strictly one-line-one-row), whereas the native multiLine
reader expands such an array into multiple rows. The declared-mapping
contract this source mirrors is object-per-line, so the strict reading is
deliberate — but callers migrating from the native reader should know.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonlDataSource(DataSource):
    """`spark.read.format("pyjsonl").schema(...).load(path)` — newline-
    delimited JSON files as a typed table. Requires a user-declared
    schema (schema-on-read with an explicit contract, mirroring the
    reference's declared-mapping style — never inference)."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def reader(self, schema):
        return JsonlReader(schema, self.options)


class JsonlReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl requires a path")

    def partitions(self):
        # One partition per file: a multi-file directory scans as
        # parallel tasks (the unit of distribution for this source).
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self.path]
        return [InputPartition(f) for f in files]

    def read(self, partition):
        # Malformed-line contract mirrors Spark's native JSON reader:
        # PERMISSIVE (default) turns an unparseable or non-object line
        # into an all-NULL row — carrying the raw line when the declared
        # schema has a `_corrupt_record` string field — so one poison
        # line in a 100 TB landing zone quarantines instead of killing
        # the scan task; FAILFAST raises. (sources/csv.py and
        # scan_json_malformed pin the same stance for the native
        # readers.)
        fields = [f.name for f in self.schema.fields]
        failfast = (
            str(self.options.get("mode", "PERMISSIVE")).upper() == "FAILFAST"
        )
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    if not isinstance(rec, dict):
                        raise ValueError("top-level JSON value is not an object")
                # RecursionError included (ADVICE r5): stdlib json raises it
                # on pathologically nested input, and a poison line must
                # quarantine — not kill the scan task — in PERMISSIVE mode.
                except (ValueError, RecursionError):
                    if failfast:
                        raise
                    yield tuple(
                        line if name == "_corrupt_record" else None
                        for name in fields
                    )
                    continue
                yield tuple(rec.get(name) for name in fields)


def register(spark) -> None:
    """Idempotent registration of the pyjsonl format on a session."""
    try:
        spark.dataSource.register(JsonlDataSource)
    except Exception:
        # Already registered on this session — fine.
        pass
