"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``):
a deterministic manifest generator.

The reference's input is a manifest text file listing image paths
(``imagelist1.txt``, SURVEY.md §2A #1). This source generates the
same record shape directly inside Spark's data source API — the
modern way to wrap ANY external listing (an object-store inventory,
an HTTP catalog, a database cursor) as a first-class, partitioned,
schema-declared table:

    spark.dataSource.register(ManifestDataSource)
    df = (spark.read.format("swat_manifest")
          .option("rows", 1000).option("partitions", 8).load())

Rows are deterministic functions of their index (md5-derived source
and class segments), so tests can assert exact content. Partitions
carry disjoint index ranges — each executor generates its slice
independently, no driver materialization (the 100 TB posture for a
listing of billions of objects).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST_SCHEMA = "idx bigint, image_path string"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _path_for(i: int) -> str:
    h = hashlib.md5(f"manifest:{i}".encode()).hexdigest()
    src = f"src{int(h[:2], 16) % 20}"
    cls = f"class_{int(h[2:4], 16) % 30}"
    return f"/data/img/{src}/{cls}/{i}.jpg"


class ManifestReader(DataSourceReader):
    """Index-range FILTER PUSHDOWN (Spark 4.1 ``pushFilters``):
    comparison predicates on ``idx`` narrow the generated range BEFORE
    partition planning, so filtered reads plan fewer/smaller
    partitions and never generate skipped rows — the Python-source
    analogue of parquet row-group pruning. Supported filters are
    claimed as fully handled (NOT returned), so Spark does not
    re-apply them: a reader that ignored the pushed range would
    surface extra rows and fail the oracle, keeping the contract
    honest. All other filters are returned for Spark to evaluate."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 100))
        self.num_partitions = int(options.get("partitions", 4))
        self.lo = 0
        self.hi = self.rows

    def pushFilters(self, filters):  # noqa: N802 (API name)
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("idx",):
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        span = hi - lo
        if span == 0:
            return [_RangePartition(lo, lo)]
        per = max(1, -(-span // self.num_partitions))  # ceil div
        return [
            _RangePartition(s, min(s + per, hi))
            for s in range(lo, hi, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, _path_for(i))


class ManifestStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same listing: micro-batches of
    ``batch_size`` manifest rows per trigger, offset = next index.

    The simple-stream contract (``initialOffset``/``read(start)``/
    ``commit``): offsets are plain dicts the engine checkpoints, so a
    restarted query resumes exactly where the last committed batch
    ended — the Python-source form of exactly-once file tracking. A
    finite ``rows`` option makes the stream drain deterministically
    (empty batches once exhausted), which is what lets a test pin the
    complete result."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 100))
        self.batch_size = int(options.get("batch_size", 50))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["i"])
        hi = min(lo + self.batch_size, self.rows)
        return (
            iter([(i, _path_for(i)) for i in range(lo, hi)]),
            {"i": hi},
        )

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # replay path after restart: regenerate the exact slice
        return iter(
            (i, _path_for(i))
            for i in range(int(start["i"]), int(end["i"]))
        )

    def commit(self, end: dict) -> None:
        pass


class ManifestDataSource(DataSource):
    """``format("swat_manifest")`` — options: rows, partitions,
    batch_size (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "swat_manifest"

    def schema(self) -> str | StructType:
        return MANIFEST_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return ManifestReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return ManifestStreamReader(self.options)


# --- custom writer: the Spark 4 DataSourceWriter surface -------------------


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class JsonlSinkWriter(DataSourceWriter):
    """Per-partition JSONL writer with a commit protocol: tasks write
    to uniquely-named temp files and report them in commit messages;
    ``commit`` atomically renames the complete set, ``abort`` removes
    strays — the same two-phase layout FileOutputCommitter uses, in
    ~30 lines of Python. One file per partition, no driver funnel."""

    def __init__(self, options):
        self.path = options.get("path")

    def write(self, iterator) -> "WriterCommitMessage":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = os.path.join(
            self.path, f"_tmp_part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        )
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            final = m.path.replace("_tmp_part-", "part-", 1)
            os.replace(m.path, final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    """``format("swat_jsonl_sink")`` — options: path."""

    @classmethod
    def name(cls) -> str:
        return "swat_jsonl_sink"

    def schema(self) -> str | StructType:
        return "placeholder string"  # sinks take the input schema

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlSinkWriter(self.options)
