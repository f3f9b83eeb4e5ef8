from kawa_spark.operators.asof import asof_join

__all__ = ["asof_join"]
