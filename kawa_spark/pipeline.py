"""Pipeline = Source → Handler chain → Sink (kawa Processor parity).

Reference: kawa.New(Config{Source, Destination, Handler},
kawa.Parallelism(N)).Run(ctx) — a recv→handle→send loop over N
worker goroutines with the source ack handed to the destination
(/root/reference/processor.go:62-122, 131-167).

Spark realization:
* construction  ≙ building the DataFrame DAG (declarative; Catalyst
  optimizes across source/handler/sink boundaries — something the
  reference's opaque interfaces structurally cannot do)
* Run           ≙ run_batch() (bounded) / run_stream() (unbounded;
  StreamExecution owns the loop)
* Parallelism   ≙ partitioning — a property of the data layout, not a
  worker-count option; `parallelism` here repartitions if set
* fatal-error propagation (processor.go:146-166) ≙ task retries then
  query failure; awaitTermination surfaces the first error
* at-least-once ack contract ≙ checkpointed offset commit after sink
  success (exactly-once for file/Delta sinks via the commit log)

Both run modes execute the IDENTICAL handler chain — the engine's
batch/stream duality (kawa has no batch mode at all; its tests fake
bounded runs by draining channels, /root/reference/test/suite_test.go).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from kawa_spark.handlers import Handler, chain
from kawa_spark.sinks.sinks import StreamingQueryGroup  # noqa: F401 (re-export)


@dataclass
class Pipeline:
    source: object  # read/read_stream
    handlers: list[Handler] = field(default_factory=list)
    sink: object = None  # write_batch/start_stream
    parallelism: int | None = None  # kawa.Parallelism analogue

    # --- builder ------------------------------------------------------------
    def transform(self, *handlers: Handler) -> "Pipeline":
        return Pipeline(
            self.source, [*self.handlers, *handlers], self.sink, self.parallelism
        )

    def to(self, sink) -> "Pipeline":
        return Pipeline(self.source, self.handlers, sink, self.parallelism)

    # --- execution ----------------------------------------------------------
    def _apply(self, df: DataFrame) -> DataFrame:
        if self.parallelism:
            df = df.repartition(self.parallelism)
        return chain(*self.handlers)(df)

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """The transformed (bounded) relation without a sink."""
        return self._apply(self.source.read(spark))

    def stream_dataframe(self, spark: SparkSession) -> DataFrame:
        return self._apply(self.source.read_stream(spark))

    def run_batch(self, spark: SparkSession) -> DataFrame | None:
        df = self.dataframe(spark)
        if self.sink is None:
            return df
        self.sink.write_batch(df)
        return None

    def run_stream(
        self,
        spark: SparkSession,
        trigger: str | None = None,  # FlushFrequency parity
        checkpoint: str | None = None,  # the ack ledger
        available_now: bool = False,  # bounded drain (graceful stop)
    ) -> "StreamingQuery | StreamingQueryGroup":
        # MultiSink returns a StreamingQueryGroup — a StreamingQuery-
        # shaped facade (awaitTermination/stop/isActive), so callers
        # need not care which sink kind the pipeline ends in.
        if self.sink is None:
            raise ValueError("streaming pipeline requires a sink")
        df = self.stream_dataframe(spark)
        return self.sink.start_stream(
            df, trigger=trigger, checkpoint=checkpoint, available_now=available_now
        )


def pipeline(source, *handlers: Handler) -> Pipeline:
    return Pipeline(source, list(handlers))
