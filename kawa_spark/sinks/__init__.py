from kawa_spark.sinks.sinks import (
    ConsoleSink,
    FileSink,
    ForeachBatchSink,
    MemorySink,
    MultiSink,
    NoopSink,
)

__all__ = [
    "ConsoleSink",
    "FileSink",
    "ForeachBatchSink",
    "MemorySink",
    "MultiSink",
    "NoopSink",
]
