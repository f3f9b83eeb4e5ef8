"""End-to-end VECTOR-STORE pipeline — the embedding-side counterpart
to examples/training_data_pipeline.py, composing the similarity tier
into the standard ANN index build + audit:

  embeddings
    → int8 quantization   (embedding_quantize — 4× storage shrink,
                           map-only, the cold-storage column)
    → PQ code table       (embedding_pq_codes — 64× shrink, the
                           column the LUT ADC search scans)
    → coarse clustering   (kmeans_lloyd — the IVF cell assignment a
                           partitioned/clustered write would key on)
    → one index table     (vec_id → codes + scale + cell + distortion
                           audit columns: what a vector store persists)
  + ANN quality audit     (similarity_recall — measured recall@k of
                           all SIX methods incl. the PQ path vs the
                           exact top-k)

Every stage is a registered or banked core — the example only joins
their outputs on vec_id (broadcast/co-partitioned at scale; a
production build writes the index clustered BY cell id so probes
partition-prune). Deterministic end to end: the same corpus always
yields the same index bytes and the same audit numbers.

Run directly (prints the audit) or through
tests/test_example_pipeline.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.queries.llm_similarity import (
    embedding_pq_codes,
    embedding_quantize,
    kmeans_lloyd,
    similarity_recall,
)


def build_vector_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per vector: the persisted ANN index card — int8 column
    + scale, PQ codes + quantization-error audit, coarse cell id."""
    q8 = embedding_quantize(spark, sf_dir).select(
        "vec_id", "scale", "q8_csv"
    )
    codes = embedding_pq_codes(spark, sf_dir)
    cells = kmeans_lloyd(spark, sf_dir).select(
        "vec_id", "cluster_id", "dist2"
    )
    return (
        q8.join(codes, "vec_id")
        .join(cells, "vec_id")
        .select(
            "vec_id",
            "cluster_id",
            "pq_codes",
            "q_err",
            "scale",
            "q8_csv",
            "dist2",
        )
    )


def audit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-level recall@k of every ANN tier vs the exact top-k —
    the offline audit a deployment runs before turning a knob."""
    return (
        similarity_recall(spark, sf_dir)
        .select("method", "method_hits", "method_total", "method_recall")
        .distinct()
        .orderBy("method")
    )


if __name__ == "__main__":
    from kawa_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="vector_pipeline")
    idx = build_vector_index(spark, sf)
    print(f"index rows: {idx.count()}")
    for r in audit_report(spark, sf).collect():
        print(
            f"{r['method']:22s} {r['method_hits']:3d}/{r['method_total']}"
            f" = {r['method_recall']:.2f}"
        )
    spark.stop()
