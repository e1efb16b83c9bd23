"""Custom Spark 4 Python DataSource for the reference's text key/value
format — the `"key value"` line files its reduce tasks emit
(reference mr/worker.go:148-157, consumed by test-mr.sh's `sort mr-out* |
cmp`). Registering this source makes reference output directories readable
as first-class DataFrames:

    spark.dataSource.register(TextKVDataSource)
    spark.read.format("textkv").load("/path/to/mr-out-dir")

Input model mirrors the reference exactly: ONE PARTITION PER FILE (the
reference assigns one map task per input file, mr/coordinator.go:135), so
parallelism scales with the file count and each task streams one file.
Parsing splits on the FIRST space only — values may contain spaces (the
crash app emits multi-field values, mrapps/crash.go:50-56).

The matching writer (`.write.format("textkv").save(...)`) emits one
`part-<id>-<job_token>` file per Spark partition (the token is job-unique,
making concurrent appends into one directory collision-free) via the
standard commit protocol
(write to task temp, rename on commit — idempotent under task retry, the
same atomic-rename discipline as mr/worker.go:157's os.Rename).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _Committed(WriterCommitMessage):
    tmp_path: str
    final_path: str


class TextKVDataSource(DataSource):
    """format name: "textkv"; options: path (load path / save path)."""

    @classmethod
    def name(cls) -> str:
        return "textkv"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema: StructType) -> "TextKVReader":
        return TextKVReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "TextKVWriter":
        return TextKVWriter(self.options, overwrite)


class TextKVReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        assert self.path, "textkv requires a load path"

    def partitions(self):
        # one partition per part file — the reference's one-task-per-file model
        if os.path.isfile(self.path):
            return [_FilePartition(self.path)]
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if not f.startswith((".", "_"))
        )
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, sep, value = line.partition(" ")
                yield (key, value if sep else None)


class TextKVWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        assert self.path, "textkv requires a save path"
        self.overwrite = overwrite
        # Chosen ONCE on the driver at writer construction and pickled to
        # every task: part filenames are unconditionally job-unique, so two
        # concurrent APPEND jobs into one directory can never rename over
        # each other's parts (the old probe-then-pick-a-suffix scheme raced:
        # both tasks could see part-00000 absent and collide). Concurrent
        # append+overwrite remains undefined — overwrite's contract is "the
        # directory holds exactly this job's output", which is inherently
        # single-writer.
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _Committed:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        final_path = os.path.join(self.path, f"part-{pid:05d}-{self.job_token}")
        # task-attempt-unique temp + commit-time rename: a retried attempt
        # never half-overwrites a committed file (mr/worker.go:157 discipline)
        tmp_path = os.path.join(self.path, f".part-{pid:05d}.{uuid.uuid4().hex}.tmp")
        with open(tmp_path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row['key']} {row['value']}\n")
        return _Committed(tmp_path=tmp_path, final_path=final_path)

    def commit(self, messages) -> None:
        # Driver-side job commit. On overwrite, files not bearing THIS job's
        # token must go — a prior 8-partition write overwritten by a
        # 2-partition write would otherwise leave 6 stale parts that the
        # reader happily includes. (POSIX rename/unlink; an object-store
        # port would swap this for a manifest commit.)
        for m in messages:
            os.replace(m.tmp_path, m.final_path)
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith((".", "_")) or f.endswith(f"-{self.job_token}"):
                    continue
                os.remove(os.path.join(self.path, f))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass
