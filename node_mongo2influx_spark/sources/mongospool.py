"""`mongospool` — a Spark Python Data Source for MongoDB JSON dumps.

The reference reads live Mongo collections with skip/limit pagination
(index.js:186-198 — unstable under concurrent writes, see SURVEY §4.3.1).
The container has no mongod, but the OTHER standard Mongo interchange path
— `mongoexport` newline-delimited JSON (one BSON-extended-JSON document
per line) — is fully expressible as a first-class Spark source via the
Python Data Source API (Spark 4):

* **Partition planning replaces pagination**: one input partition per
  spool file (mongoexport shards naturally per collection chunk), so reads
  scale with files and are snapshot-stable — precisely the fix for the
  reference's skip/limit hazard.
* **BSON extended JSON is decoded**, not passed through: ``{"$oid": …}``
  → string id, ``{"$date": epoch-ms | ISO}`` → timestamp, ``{"$numberLong"
  : "n"}`` → long. Other nested objects stay JSON strings (the reference's
  schemaless rows flow through the same way — a truthy `time` is the only
  structural requirement, applied later by TransformSpec).
* **Schema** comes from ``schema(...)`` on the reader or is inferred from
  the first document of the first file (driver-side, one line read).

Usage::

    spark.dataSource.register(MongoSpoolDataSource)
    df = spark.read.format("mongospool").option("path", dump_dir).load()
"""

from __future__ import annotations

import json
import pathlib
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _decode_extended(v):
    """BSON extended-JSON scalars → python values; nested docs → JSON str."""
    if isinstance(v, dict):
        if "$oid" in v:
            return str(v["$oid"])
        if "$date" in v:
            d = v["$date"]
            if isinstance(d, dict) and "$numberLong" in d:
                d = int(d["$numberLong"])
            if isinstance(d, (int, float)):
                return datetime.fromtimestamp(d / 1000.0, tz=timezone.utc)
            return datetime.fromisoformat(str(d).replace("Z", "+00:00"))
        if "$numberLong" in v:
            return int(v["$numberLong"])
        return json.dumps(v, sort_keys=True)
    if isinstance(v, list):
        return json.dumps(v, sort_keys=True)
    return v


def _infer_field(name: str, v) -> StructField:
    v = _decode_extended(v)
    if isinstance(v, bool):
        t = StringType()  # keep rare booleans as strings (schemaless source)
    elif isinstance(v, int):
        t = LongType()
    elif isinstance(v, float):
        t = DoubleType()
    elif isinstance(v, datetime):
        t = TimestampType()
    else:
        t = StringType()
    return StructField(name, t, nullable=True)


class MongoSpoolDataSource(DataSource):
    """See module docstring. Options: ``path`` (dir of .json/.jsonl files)."""

    @classmethod
    def name(cls) -> str:
        return "mongospool"

    def _files(self) -> list[str]:
        root = pathlib.Path(self.options["path"])
        files = sorted(
            str(p)
            for pat in ("*.json", "*.jsonl", "*.ndjson")
            for p in root.glob(pat)
        )
        if not files:
            raise FileNotFoundError(f"no spool files under {root}")
        return files

    def schema(self) -> StructType:
        first = self._files()[0]
        with open(first, "r", encoding="utf-8") as fh:
            line = fh.readline()
        doc = json.loads(line)
        return StructType([_infer_field(k, v) for k, v in doc.items()])

    def reader(self, schema: StructType) -> "MongoSpoolReader":
        return MongoSpoolReader(self._files(), schema)

    def simpleStreamReader(self, schema: StructType) -> "MongoSpoolStreamReader":
        return MongoSpoolStreamReader(self.options["path"], schema)


#: Comparison filters the reader evaluates itself (pushdown). Everything
#: else is returned to Spark as unsupported and re-checked post-scan.
_PUSHABLE = {
    EqualTo: lambda v, x: v == x,
    GreaterThan: lambda v, x: v > x,
    GreaterThanOrEqual: lambda v, x: v >= x,
    LessThan: lambda v, x: v < x,
    LessThanOrEqual: lambda v, x: v <= x,
}


class MongoSpoolReader(DataSourceReader):
    def __init__(self, files: list[str], schema: StructType) -> None:
        self.files = files
        self.schema = schema
        self.fields = [(f.name, f.dataType) for f in schema.fields]
        self._pushed: list = []

    def pushFilters(self, filters: list[Filter]):
        """Accept flat comparison filters — rows failing them never leave
        the source (the custom-source half of predicate pushdown). Spark
        re-applies anything we yield back as unsupported."""
        for f in filters:
            kind = type(f)
            if kind in _PUSHABLE and len(f.attribute) == 1:
                self._pushed.append((f.attribute[0], _PUSHABLE[kind], f.value))
            else:
                yield f

    def _keep(self, doc: dict) -> bool:
        for name, op, want in self._pushed:
            v = _decode_extended(doc.get(name))
            if v is None:
                return False
            try:
                if not op(v, want):
                    return False
            except TypeError:
                return False
        return True

    def partitions(self):
        # one partition per spool file: snapshot-stable, scales with files
        # (the skip/limit pagination replacement — SURVEY §4.3.1)
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from _read_file(partition.value, self.fields, self._keep)


def _read_file(path: str, fields, keep=None) -> Iterator[tuple]:
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            doc = json.loads(line)
            if keep is not None and not keep(doc):
                continue
            row = []
            for name, dtype in fields:
                v = _decode_extended(doc.get(name))
                if v is not None and isinstance(dtype, StringType):
                    v = v if isinstance(v, str) else json.dumps(v)
                row.append(v)
            yield tuple(row)


class MongoSpoolStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of a spool directory: the offset is the sorted list
    of files already delivered; each micro-batch reads exactly the files
    that appeared since (mongoexport writes a file then moves on, so
    file-granularity delivery is append-only and replayable — the offset
    log replays the same file set after a crash)."""

    def __init__(self, path: str, schema: StructType) -> None:
        self.path = pathlib.Path(path)
        self.fields = [(f.name, f.dataType) for f in schema.fields]

    def _all_files(self) -> list[str]:
        return sorted(
            str(p)
            for pat in ("*.json", "*.jsonl", "*.ndjson")
            for p in self.path.glob(pat)
        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [f for f in self._all_files() if f not in seen]
        rows = []
        for f in new:
            rows.extend(_read_file(f, self.fields))
        end = {"seen": sorted(seen | set(new))}
        return (iter(rows), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay: exactly the files in end but not in start
        files = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        rows = []
        for f in files:
            rows.extend(_read_file(f, self.fields))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # file set is the offset; nothing to clean up
