"""Sources. Every source exposes batch (`read`) and streaming
(`read_stream`) forms of the SAME logical relation — the engine's
batch/stream duality (bounded replay ≙ kawa's scanner draining an
io.Reader, /root/reference/x/scanner/scanner.go:42-79).

Parity map:
* FileSource(format="text", line_sep=...)  ≙ scanner source with a
  custom delimiter (/root/reference/x/scanner/scanner.go:90-105)
* MemorySource                             ≙ x/memory channel source
  (/root/reference/x/memory/memory.go:24-31) realized as a file-drop
  directory: tests append files, the stream picks them up.
* RateSource                               ≙ the bench message
  generator (/root/reference/test/suite_test.go:106-155)

Scale: file sources list+split natively (maxFilesPerTrigger bounds a
microbatch ≙ batcher FlushLength); schema is always explicit in
streaming mode — inference on 100 TB of input is a non-starter.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FileSource:
    path: str
    format: str = "text"  # text | json | csv | parquet
    schema: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    line_sep: str | None = None  # scanner WithDelim parity
    max_files_per_trigger: int | None = None  # FlushLength parity

    def _reader_opts(self) -> dict[str, str]:
        opts = dict(self.options)
        if self.line_sep is not None:
            opts["lineSep"] = self.line_sep
        return opts

    def read(self, spark: SparkSession) -> DataFrame:
        r = spark.read.format(self.format).options(**self._reader_opts())
        if self.schema:
            r = r.schema(self.schema)
        return r.load(self.path)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        opts = self._reader_opts()
        if self.max_files_per_trigger:
            opts["maxFilesPerTrigger"] = str(self.max_files_per_trigger)
        r = spark.readStream.format(self.format).options(**opts)
        if self.schema:
            r = r.schema(self.schema)
        elif self.format == "text":
            pass  # text has a fixed schema
        else:
            raise ValueError(
                "streaming sources require an explicit schema "
                f"(format={self.format!r}, path={self.path!r})"
            )
        return r.load(self.path)


@dataclass
class MemorySource:
    """File-drop in-memory-ish source for tests: producers write files
    into ``dir``; batch reads see a snapshot, stream reads tail it."""

    dir: str
    format: str = "text"
    schema: str | None = None

    def _fs(self) -> FileSource:
        return FileSource(self.dir, format=self.format, schema=self.schema)

    def read(self, spark: SparkSession) -> DataFrame:
        return self._fs().read(spark)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return self._fs().read_stream(spark)


@dataclass
class RateSource:
    """Synthetic generator (streaming-native, batch via range)."""

    rows_per_second: int = 100000
    num_partitions: int = 8
    total_rows: int = 1_000_000  # batch mode size

    def read(self, spark: SparkSession) -> DataFrame:
        return (
            spark.range(0, self.total_rows, 1, self.num_partitions)
            .selectExpr("timestamp_millis(1704067200000 + id) AS timestamp", "id AS value")
        )

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.rows_per_second))
            .option("numPartitions", str(self.num_partitions))
            .load()
        )
