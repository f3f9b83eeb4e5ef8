from kawa_spark.sinks.sinks import (
    ConsoleSink,
    FileSink,
    ForeachBatchSink,
    MemorySink,
    MultiSink,
    NoopSink,
    RoutingSink,
    StreamingQueryGroup,
)

__all__ = [
    "ConsoleSink",
    "FileSink",
    "ForeachBatchSink",
    "MemorySink",
    "MultiSink",
    "NoopSink",
    "RoutingSink",
    "StreamingQueryGroup",
]
