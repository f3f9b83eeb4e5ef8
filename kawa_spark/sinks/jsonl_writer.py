"""Custom streaming SINK via the Spark 4 Python DataSource writer API
— the plugin face of kawa's Destination interface
(/root/reference/types.go:92-120), complementing the reader plugin in
sources/replay.py.

Commit protocol = the ack contract: each task writes its partition to
a uniquely-named temp file and returns a commit message; the driver's
``commit`` renames them into place only when EVERY task succeeded;
``abort`` removes the leftovers. A failed batch therefore leaves no
visible output and the un-committed offsets replay it — at-least-once
end to end, atomically visible per batch.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceStreamWriter, WriterCommitMessage


@dataclass
class _Committed(WriterCommitMessage):
    temp_path: str
    final_path: str
    rows: int


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(os.path.join(self.path, "_tmp"), exist_ok=True)
        name = f"part-{ctx.partitionId()}-{uuid.uuid4().hex}.jsonl"
        temp = os.path.join(self.path, "_tmp", name)
        n = 0
        with open(temp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _Committed(
            temp_path=temp, final_path=os.path.join(self.path, name), rows=n
        )

    def commit(self, messages, batchId) -> None:
        for m in messages:
            os.replace(m.temp_path, m.final_path)
        with open(os.path.join(self.path, f"_commit_{batchId}"), "w") as f:
            f.write(json.dumps({"rows": sum(m.rows for m in messages)}))

    def abort(self, messages, batchId) -> None:
        for m in messages:
            if m and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlSinkDataSource(DataSource):
    """df.writeStream.format("kawa_jsonl").option("path", …)"""

    @classmethod
    def name(cls) -> str:
        return "kawa_jsonl"

    def streamWriter(self, schema, overwrite) -> _JsonlStreamWriter:
        return _JsonlStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(JsonlSinkDataSource)
