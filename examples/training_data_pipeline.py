"""End-to-end TRAINING-DATA pipeline — the LLM-corpus counterpart to
examples/log_pipeline.py, composing the registry's operators into the
standard corpus build:

  documents
    → quality gate        (Gopher-style scalar signals, keep flag)
    → exact dedup         (normalized-hash keepers)
    → near-dup dedup      (posting-list jaccard → connected
                           components; only cluster keepers survive)
    → image-level dedup   (r12: the SURVIVORS' leading bytes render
                           through the real BMP codec to a 63-bit
                           perceptual dHash; docs whose image equals
                           another survivor's are the cross-byte
                           duplicate class every TEXT gate misses)
    → span contamination  (r10: docs whose 8-word windows mostly
                           duplicate OTHER docs are dropped — the
                           boilerplate/licence-chrome pages that
                           survive document-level dedup because the
                           rest of the page differs)
    → deterministic order (reproducible epoch shuffle position)
    → clustered write     (range-clustered parquet so downstream
                           readers prune by position range)

Every stage is a doc_id-keyed semi/anti join against an operator's
output — one declarative plan end to end; Catalyst fuses the gates
and the only shuffles are the operators' own documented ones plus
the final range partition. Deterministic: the same corpus always
yields the same training set in the same order, on any cluster.

Run directly (writes under /tmp) or through tests/test_example_pipeline.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.io import table
from kawa_spark.queries.llm_dedup import dedup_exact_norm
from kawa_spark.queries.llm_dedup import dedup_clusters_query
from kawa_spark.queries.llm_dedup import span_fractions
from kawa_spark.queries.llm_quality import quality_gopher_filter
from kawa_spark.queries.llm_corpus import corpus_shuffle_deterministic
from kawa_spark.sinks.layout import write_clustered


def build_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → filtered, deduped, deterministically ordered set."""
    docs = table(spark, sf_dir, "documents")
    quality_ok = (
        quality_gopher_filter(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    exact_keepers = dedup_exact_norm(spark, sf_dir).select(
        F.col("keeper_id").alias("doc_id")
    )
    # near-dup clusters: everything that is IN a cluster but not its
    # keeper is dropped; docs outside any cluster pass untouched
    near_dup_losers = (
        dedup_clusters_query(spark, sf_dir)
        .filter(~F.col("is_keeper"))
        .select("doc_id")
    )
    order = corpus_shuffle_deterministic(spark, sf_dir).select(
        "doc_id", "global_pos"
    )
    deduped = (
        docs.join(quality_ok, "doc_id", "left_semi")
        .join(exact_keepers, "doc_id", "left_semi")
        .join(near_dup_losers, "doc_id", "left_anti")
    )
    # image-level dedup OVER THE SURVIVOR SET (r12 — the same
    # survivor-set rationale as the span gate below): the plant-free
    # shared cores (image_hashes → image_dedup_from_hashes) hash each
    # survivor's rendered image and drop non-keeper image-duplicates
    # — the same-pixels/different-bytes class that byte- and
    # shingle-level dedup structurally miss.
    # CONFIRMED drops only (ADVICE r12): the 63-bit dHash quantizes
    # cell-sum gradients of the rendered 64x8 crop, so two distinct
    # documents can coincidentally agree on every gradient sign; a
    # DELETION gate must not act on the sketch alone. The crop is a
    # pure function of the first 512 payload bytes, so byte-prefix
    # equality with the group keeper is an exact SAME-CROP check
    # (ADVICE r13: not same-image — two payloads identical in their
    # first 512 bytes but diverging afterwards still collapse; a
    # true same-image confirmation would compare full payloads) at
    # the cost of one equi-join on values both sides already carry —
    # hash-collided docs whose rendered crops differ are kept (the
    # sketch stays the cheap candidate filter, exactly the
    # LSH-then-verify discipline of the text near-dup stage above).
    from kawa_spark.queries.llm_multimodal import (
        image_dedup_from_hashes,
        image_hashes,
    )

    renders = deduped.filter(F.length("text") > 0).select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    crops = renders.select(
        "doc_id", F.substring(F.col("payload"), 1, 512).alias("crop")
    )
    # ONE crops join: every group member carries its crop, and the
    # keeper's crop rides a first-by-doc_id window over the SAME
    # dhash groups the verdict already shuffles on (the keeper IS the
    # group's min doc_id) — a second crops join would re-run the
    # documents scan + encode lineage per side (code review r13)
    from pyspark.sql.window import Window

    w_grp = Window.partitionBy("dhash").orderBy("doc_id")
    img_losers = (
        image_dedup_from_hashes(image_hashes(renders))
        .join(crops, "doc_id")
        .select(
            "doc_id",
            "is_dup",
            "crop",
            F.first("crop").over(w_grp).alias("keeper_crop"),
        )
        .filter(F.col("is_dup") & (F.col("crop") == F.col("keeper_crop")))
        .select("doc_id")
    )
    deduped = deduped.join(img_losers, "doc_id", "left_anti")
    # span-level contamination OVER THE SURVIVOR SET (code review
    # r10): running the gate on the raw corpus would (a) flag a dup
    # group's keeper against the very copies dedup just removed —
    # deleting the content entirely instead of keeping one — and
    # (b) count the registered key's synthetic plant windows toward
    # real docs; the plant-free span_fractions core on the deduped
    # frame measures only duplication that SURVIVES dedup (the
    # cross-page boilerplate this stage exists for)
    contaminated = (
        span_fractions(deduped.select("doc_id", "text"))
        .filter(F.col("is_contaminated"))
        .select("doc_id")
    )
    return (
        deduped.join(contaminated, "doc_id", "left_anti")
        .join(order, "doc_id")
        .select("global_pos", "doc_id", "lang", "source", "n_chars", "text")
    )


def daily_update(
    spark: SparkSession, prior: DataFrame, new_batch: DataFrame
) -> DataFrame:
    """The INCREMENTAL form of the pipeline above — the shape a
    daily-crawl deployment actually runs once the first training set
    is committed (r12; built on the r11 incremental tier): today's
    batch is classified against the committed corpus instead of
    rebuilding the world.

      new batch
        → exact gate     (incremental_dedup vs the prior kept-set
                          digest index: dup_prior / dup_batch rows
                          are dropped, the batch's own keepers stay)
        → near-dup gate  (incremental_minhash_matches vs the prior
                          corpus's LSH buckets: re-crawls whose ad
                          block rotated — digest misses — are
                          dropped)
        → image gate     (incremental_image_from_hashes vs the prior
                          corpus's dHash band table, r14: same-image
                          different-byte re-encodes — the class BOTH
                          byte digests and text shingles miss — are
                          dropped)

    Returns the accepted (doc_id, text) rows to append. All three
    gates are the registry cores (one definition); the prior side's
    digest index, signature/band tables, and (doc_id, dhash) image
    table are what a deployment PERSISTS between runs (bucketed by
    digest / (band_id, band_hash)) — only the day's batch is
    scanned, hashed, and shuffled here."""
    from kawa_spark.queries.llm_dedup import (
        incremental_dedup,
        incremental_minhash_matches,
        prior_digest_index,
    )
    from kawa_spark.queries.llm_multimodal import (
        _dhash_int,
        image_hashes,
        incremental_image_from_hashes,
    )

    kept_exact = (
        incremental_dedup(new_batch, prior_digest_index(prior))
        .filter(F.col("status") == "kept")
        .select("doc_id")
    )
    exact_survivors = new_batch.join(kept_exact, "doc_id", "left_semi")
    near_dup = incremental_minhash_matches(prior, exact_survivors).select(
        "doc_id"
    )
    text_survivors = exact_survivors.join(near_dup, "doc_id", "left_anti")

    def _hashes(docs: DataFrame, side: str) -> DataFrame:
        rendered = docs.filter(F.length("text") > 0).select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        )
        return image_hashes(rendered).select(
            "doc_id",
            "dhash",
            F.lit(side).alias("side"),
            _dhash_int().alias("dhash_int"),
        )

    image_dup = incremental_image_from_hashes(
        _hashes(prior, "p").unionByName(_hashes(text_survivors, "n"))
    ).select("doc_id")
    return text_survivors.join(image_dup, "doc_id", "left_anti")


def main(sf_dir: str = "/root/testdata/sf0.001", out: str | None = None) -> dict:
    from kawa_spark.session import get_spark

    spark = get_spark(app_name="training_data_pipeline")
    ts = build_training_set(spark, sf_dir)
    out = out or "/tmp/kawa_training_set"
    # cluster the files by training position: an epoch reader asking
    # for positions [a, b) opens only the files whose range overlaps
    write_clustered(ts, out, ["global_pos"], n_files=8)
    n = spark.read.parquet(out).count()
    return {"rows": n, "path": out}


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
