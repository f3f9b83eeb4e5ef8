"""The a-priori min-support prune in cooccurrence_lift: pruning must
only REMOVE pairs involving infrequent items — every surviving pair's
numbers (n_ab, n_a, n_b, support, lift) must equal the unpruned
run's, because support/totals are defined over the full incidence."""

from __future__ import annotations

from kawa_spark.queries.events import cooccurrence_lift


def _rows(df):
    return {
        (r["type_a"], r["type_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["support"], r["lift"]
        )
        for r in df.collect()
    }


def test_min_support_prunes_without_renumbering(spark):
    # 4 users; type 'rare' appears once, others are frequent
    pairs = [
        (1, "a"), (1, "b"), (1, "rare"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "c"),
    ]
    inc = spark.createDataFrame(pairs, "user_id long, event_type string")
    full = _rows(cooccurrence_lift(inc))
    pruned = _rows(cooccurrence_lift(inc, min_support=2))
    # 'rare' (support 1) cannot appear in any pruned pair
    assert all("rare" not in k for k in pruned)
    assert any("rare" in k for k in full)
    # every surviving pair is numerically identical to the full run
    assert pruned == {k: v for k, v in full.items() if "rare" not in k}
    # a-priori soundness: no qualifying pair was lost — every full
    # pair of two frequent items survives
    assert set(pruned) == {k for k in full if "rare" not in k}
