"""Connected components / dedup clusters on known graphs."""

from __future__ import annotations

from kawa_spark.operators.components import connected_components, dedup_clusters


def test_components_chain_and_islands(spark):
    # chain 1-2-3-4, pair 10-11, self-contained triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_components_random_vs_union_find(spark):
    """Property check against a pure-python union-find on a few random
    graphs (seeded)."""
    import random

    rng = random.Random(7)
    for _ in range(3):
        nodes = list(range(30))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {a for a, _ in edges} | {b for _, b in edges}
        want = {n: find(n) for n in touched}

        df = spark.createDataFrame(edges, "src long, dst long")
        # BOTH execution paths must match the reference labeling:
        # default (≤ cap ⇒ driver union-find) AND the distributed
        # star loop forced via local_solve_cap=0 — otherwise this
        # property test would circularly compare union-find against
        # itself now that small graphs solve locally.
        got_local = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        got_dist = {
            r["node"]: r["component"]
            for r in connected_components(df, local_solve_cap=0).collect()
        }
        assert got_local == want
        assert got_dist == want


def test_dedup_clusters_keepers(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (100, 101)], "doc_a long, doc_b long"
    )
    rows = dedup_clusters(pairs, "doc_a", "doc_b").collect()
    keepers = {r["doc_id"] for r in rows if r["is_keeper"]}
    clusters = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert keepers == {5, 100}
    assert clusters[7] == 5 and clusters[9] == 5 and clusters[101] == 100


def test_components_long_chain_converges_in_log_rounds(spark):
    """A 200-node path graph is the worst case for label propagation
    (diameter 199) but the star alternation must finish in O(log n)
    rounds — well inside the default max_iterations=20.
    local_solve_cap=0 forces the distributed path this test is about."""
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, local_solve_cap=0).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_components_local_and_distributed_paths_agree(spark):
    """The driver-side union-find fast path (edge count ≤
    local_solve_cap) must be bit-identical to the distributed star
    loop — same labels, same schema — on a graph with multiple
    components, self-loop-only nodes, and reversed/duplicate edges."""
    edges = spark.createDataFrame(
        [(5, 7), (7, 9), (9, 5), (100, 101), (42, 42), (7, 5), (3, 2)],
        "src long, dst long",
    )
    local = connected_components(edges)  # 7 edges → local path
    dist = connected_components(edges, local_solve_cap=0)
    assert local.schema == dist.schema
    to_map = lambda df: {r["node"]: r["component"] for r in df.collect()}
    assert to_map(local) == to_map(dist)
    assert to_map(local) == {
        5: 5, 7: 5, 9: 5, 100: 100, 101: 100, 42: 42, 2: 2, 3: 2
    }


def test_components_strict_contract(spark):
    """strict=True raises when the round budget is exhausted before a
    verified fixpoint; strict=False returns partial labels that are
    still valid members of each node's true component."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            edges, max_iterations=1, strict=True, local_solve_cap=0
        )

    partial = {
        r["node"]: r["component"]
        for r in connected_components(
            edges, max_iterations=1, strict=False, local_solve_cap=0
        ).collect()
    }
    # every label is a real node of the (single) component, and labels
    # never exceed the node they label (min-propagation invariant)
    assert set(partial) == set(range(64))
    assert all(0 <= c <= node for node, c in partial.items())


def test_components_self_loop_only_node_kept(spark):
    """ADVICE r04: a node appearing ONLY as an (x, x) self-pair must
    still be emitted with its own label — the self-loop pre-filter
    must not drop it from the (node, component) output."""
    edges = spark.createDataFrame(
        [(1, 2), (7, 7), (3, 3), (3, 4)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 7: 7, 3: 3, 4: 3}


def test_components_null_edges_ignored_on_both_paths(spark):
    """Edges with a null endpoint are dropped in the shared raw
    projection, so the driver fast path and the distributed star loop
    agree (ADVICE r6: the fast path raised TypeError comparing None
    roots while the distributed loop emitted a (null, null) row)."""
    from pyspark.sql import functions as F
    from kawa_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, None), (None, 3), (None, None), (4, 5)],
        "src long, dst long",
    )
    expect = {(1, 1), (2, 1), (4, 4), (5, 4)}
    fast = connected_components(edges, "src", "dst")
    dist = connected_components(edges, "src", "dst", local_solve_cap=0)
    assert {(r["node"], r["component"]) for r in fast.collect()} == expect
    assert {(r["node"], r["component"]) for r in dist.collect()} == expect


def test_edge_reuse_seam_row_identity(spark, sf_dir, tmp_path):
    """VERDICT r14 item 4: the production edge-reuse seam
    (write_dedup_edges → parquet → dedup_clusters_from_edges) is
    row-identical to the inline registered dedup_clusters — the only
    difference is where the candidate edges come from."""
    from kawa_spark.queries.llm_dedup import (
        dedup_clusters_query,
        dedup_clusters_from_edges,
        write_dedup_edges,
    )

    edge_path = str(tmp_path / "edges.parquet")
    write_dedup_edges(spark, sf_dir, edge_path)

    inline = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters_query(spark, sf_dir).collect()
    }
    reused = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters_from_edges(spark, edge_path).collect()
    }
    assert inline == reused
    assert len(inline) > 0  # non-vacuous: sf0.001 has planted near-dups


def test_edge_reuse_seam_accepts_dataframe(spark):
    """The seam also takes an in-memory (doc_a, doc_b) frame — e.g.
    minhash_pairs output — so any candidate generator can feed the
    shared CC core without touching disk."""
    from kawa_spark.queries.llm_dedup import dedup_clusters_from_edges

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters_from_edges(spark, pairs).collect()
    }
    assert got == {
        (1, 1, True), (2, 1, False), (3, 1, False),
        (10, 10, True), (11, 10, False),
    }
