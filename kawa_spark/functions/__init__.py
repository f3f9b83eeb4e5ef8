from kawa_spark.functions.exact import dec, dsum, davg
from kawa_spark.functions.hof import bind

__all__ = ["dec", "dsum", "davg", "bind"]
