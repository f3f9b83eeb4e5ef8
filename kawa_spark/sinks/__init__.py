from kawa_spark.sinks.sinks import (
    ConsoleSink,
    FileSink,
    ForeachBatchSink,
    MemorySink,
    MultiSink,
    NoopSink,
    RoutingSink,
)

__all__ = [
    "ConsoleSink",
    "FileSink",
    "ForeachBatchSink",
    "MemorySink",
    "MultiSink",
    "NoopSink",
    "RoutingSink",
]
