"""The shared-Lloyd trained-centroid cache (llm_similarity.py
::_lloyd_cent1_cached) replays the collected K-row model BIT-EXACTLY:
kmeans_lloyd and similarity_ivf_kmeans share one training pass, so a
lossy round-trip would silently skew both operators' hash-verified
outputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from kawa_spark.io import table, spread
from kawa_spark.queries import llm_similarity as S

SF = "/root/testdata/sf0.001"


def test_cached_centroids_bit_equal_direct(spark):
    e = spread(table(spark, SF, "embeddings"), "vec_id")
    direct = {
        r["cid"]: r["emb"]
        for r in S._lloyd_cent1(e).collect()
    }
    S._cache_evict(SF)  # force a fresh train + collect
    cached = {
        r["cid"]: r["emb"]
        for r in S._lloyd_cent1_cached(e, SF).collect()
    }
    assert set(direct) == set(cached) == set(range(S.K_CLUSTERS))
    for cid in direct:
        # exact equality, element by element — IEEE doubles round-trip
        # the driver collect/createDataFrame boundary losslessly
        assert direct[cid] == cached[cid], cid


def test_cache_is_reused_within_process(spark):
    e = spread(table(spark, SF, "embeddings"), "vec_id")
    S._cache_evict(SF)
    S._lloyd_cent1_cached(e, SF).collect()
    key = (SF, S._embeddings_fingerprint(SF))
    assert key in S._CENT1_CACHE
    rows_before, _schema = S._CENT1_CACHE[key]
    S._lloyd_cent1_cached(e, SF)  # second call must not retrain
    rows_after, _schema2 = S._CENT1_CACHE[key]
    assert rows_before is rows_after


def test_cache_key_isolates_scale_factors(spark):
    """Different sf_dir ⇒ different corpus ⇒ different model — the
    cache must never cross-serve."""
    other = "/root/testdata/sf0.01"
    e1 = spread(table(spark, SF, "embeddings"), "vec_id")
    e2 = spread(table(spark, other, "embeddings"), "vec_id")
    c1 = {r["cid"]: r["emb"] for r in S._lloyd_cent1_cached(e1, SF).collect()}
    c2 = {
        r["cid"]: r["emb"]
        for r in S._lloyd_cent1_cached(e2, other).collect()
    }
    assert c1 != c2


def test_cache_invalidates_on_input_rewrite(spark, tmp_path):
    """Rewriting the data under a cached sf_dir must retrain, not
    replay the stale model (ADVICE r6): the cache key carries a
    stat fingerprint of the embeddings input."""
    import shutil, os

    sfdir = str(tmp_path)
    shutil.copy(f"{SF}/embeddings.parquet", f"{sfdir}/embeddings.parquet")
    e = spread(table(spark, sfdir, "embeddings"), "vec_id")
    c1 = {r["cid"]: r["emb"] for r in S._lloyd_cent1_cached(e, sfdir).collect()}
    # rewrite with the sf0.01 corpus — different data, same path
    shutil.copy("/root/testdata/sf0.01/embeddings.parquet",
                f"{sfdir}/embeddings.parquet")
    e2 = spread(table(spark, sfdir, "embeddings"), "vec_id")
    c2 = {r["cid"]: r["emb"] for r in S._lloyd_cent1_cached(e2, sfdir).collect()}
    assert c1 != c2  # a bare-sf_dir key would have replayed c1
