from kawa_spark.sources.file import FileSource, MemorySource, RateSource
from kawa_spark.sources.multi import MultiSource

__all__ = ["FileSource", "MemorySource", "RateSource", "MultiSource"]
