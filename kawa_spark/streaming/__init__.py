from kawa_spark.streaming.batcher import BatcherPolicy, ErrorPolicy, make_foreach_batch
from kawa_spark.streaming.listener import Watchdog

__all__ = ["BatcherPolicy", "ErrorPolicy", "make_foreach_batch", "Watchdog"]
