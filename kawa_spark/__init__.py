"""kawa_spark — a PySpark-native analytics + stream-processing engine.

Re-expresses the capabilities of the reference event-stream library
(runreveal/kawa, a Go source→handler→sink pipeline framework with
at-least-once delivery — see /root/reference/types.go, processor.go)
as an idiomatic Spark engine:

* ``kawa_spark.pipeline`` — the kawa-parity API: Pipeline / Handler /
  Source / Sink over batch DataFrames and Structured Streaming.
* ``kawa_spark.queries`` — the declared batch query surface (SURVEY.md
  §2B), each registered with a DuckDB oracle for correctness checks.
* ``kawa_spark.operators`` — reusable large-scale operators (dedup,
  similarity search, text analysis, multimodal plumbing).
* ``kawa_spark.streaming`` — microbatch config (batcher parity), retry
  / DLQ policies, query listeners (watchdog parity).

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API so Catalyst handles pushdown, pruning, join
selection and AQE; Python UDFs appear only where column expressions
genuinely cannot express the semantics (and then always Arrow-batched).
"""

from kawa_spark.session import get_spark


def __getattr__(name):
    # lazy re-exports so `import kawa_spark` stays cheap
    if name == "Pipeline":
        from kawa_spark.pipeline import Pipeline

        return Pipeline
    if name == "pipeline":
        from kawa_spark.pipeline import pipeline

        return pipeline
    raise AttributeError(name)


__all__ = ["get_spark", "Pipeline", "pipeline"]
__version__ = "0.1.0"
