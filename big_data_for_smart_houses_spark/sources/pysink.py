"""JSONL sink as a Spark 4 Python Data Source WRITER.

The reference persists its gold snapshots with single-process pandas
``to_json``-style writes (reference dashboard/app.py caches, SURVEY.md
§2.2); this module re-expresses "write my table as JSON lines" through
the `pyspark.sql.datasource` WRITER API — the write-side counterpart
of sources/synthetic.py's reader — so the sink is planned and executed
like any Spark write:

- **one task per partition, zero driver data**: ``write()`` runs on
  executors over each partition's row iterator and emits one
  ``part-<pid>.jsonl`` file named by the task's partitionId —
  deterministic output layout, no RNG, no shared state;
- **two-phase commit discipline**: each task writes to a ``.tmp``
  file and renames only on success (a failed/speculative task can
  never leave a half-file visible), then the driver's ``commit()``
  writes a ``_SUCCESS`` manifest recording per-partition row counts —
  the same visibility contract as Hadoop-style committers;
- **abort path**: on task failure the driver's ``abort()`` removes
  any committed part files, so readers never observe a partial write.

At 100 TB this shape is exactly a distributed file sink: N parallel
writers, rename-based atomicity, manifest-gated visibility. The gate
(queries/core.py:pysink_roundtrip_orders) proves the full
write -> commit -> read-back loop is lossless against an identity
oracle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema: StructType, overwrite: bool) -> "JsonlSinkWriter":
        return JsonlSinkWriter(self.options, [f.name for f in schema.fields])


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, columns):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option('path', ...)")
        self.columns = columns

    def write(self, iterator) -> JsonlCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        tmp = final + ".tmp"
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        dict(zip(self.columns, row)), default=str
                    )
                    + "\n"
                )
                n += 1
        # rename-on-success: a failed or speculative attempt never
        # leaves a visible half-file
        os.replace(tmp, final)
        return JsonlCommit(final, n)

    def commit(self, messages) -> None:
        manifest = {
            os.path.basename(m.filename): m.n_rows
            for m in messages
            if m is not None
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump(
                {"files": manifest, "rows": sum(manifest.values())}, fh
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.filename):
                os.remove(m.filename)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
