"""Connected components via alternating large-star/small-star — the
dedup-cluster merger: near-dup PAIRS (from minhash/simhash/embedding
blocking) form a graph; components are the duplicate clusters; one
keeper survives per cluster.

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", public): repeatedly rewrite the EDGE set —

- large-star: every node connects its larger neighbors to the minimum
  of its closed neighborhood;
- small-star: every node connects its smaller neighbors (and itself)
  to that minimum.

Each phase preserves connectivity, and the alternation converges to
rooted stars (every node → its component's min id) in O(log n) rounds
— vs O(diameter) for plain label propagation. Near-dup graphs have
tiny diameters, so the practical win is fewer Spark rounds: each
round's fixed scheduling cost dominates at small edge counts, and the
star alternation needs roughly half the rounds (replacing the
label-propagation loop measured at 5.7 s for dedup_clusters at sf0.1).

Scale notes: each phase is one aggregate + one join, shuffled on node
id — no step ever materializes a neighborhood list, so skewed
high-degree nodes cost a hot key at worst (AQE skew-join splits it).
localCheckpoint() truncates lineage each round; the loop is
driver-side CONTROL only (one scalar checksum per round); all data
stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _large_star(edges: DataFrame) -> DataFrame:
    """(a,b) directed edges → large-star rewrite.

    Symmetrize, then for each node a: m = min(closed neighborhood);
    emit (b, m) for every strictly-larger neighbor b.

    No intermediate distinct()s: the min aggregate is insensitive to
    duplicate edges, and _small_star canonicalizes its output — each
    skipped distinct is a skipped shuffle per round."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = sym.groupBy("a").agg(
        F.least(F.first("a"), F.min("b")).alias("m")
    )
    return (
        sym.join(m, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Directed edges → small-star rewrite.

    Orient a > b; for each node a: m = min of its smaller neighbors;
    emit (v, m) for every smaller neighbor v ≠ m plus (a, m)."""
    e = (
        edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
    )
    m = e.groupBy("a").agg(F.min("b").alias("m"))
    leaves = (
        e.join(m, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    roots = m.select("a", F.col("m").alias("b"))
    return leaves.unionByName(roots).distinct()


def _edge_checksum(edges: DataFrame) -> tuple:
    """Cheap fixpoint probe: (count, Σa, Σb) in exact DECIMAL.

    Equal triples on consecutive rounds make a fixpoint CANDIDATE;
    the caller confirms with one exact set comparison (paid once),
    so a checksum collision can never produce a wrong answer."""
    row = edges.agg(
        F.count(F.lit(1)),
        F.sum(F.col("a").cast("decimal(38,0)")),
        F.sum(F.col("b").cast("decimal(38,0)")),
    ).collect()[0]
    return tuple(row)


# Below this many distinct edges the component structure is solved
# on the driver with union-find instead of the distributed star loop.
# Rationale (the same adaptivity AQE applies to join strategy): the
# star loop's cost at small edge counts is ~all fixed per-round
# scheduling — 3-5 rounds × (2 aggregates + 2 joins + a checksum job)
# for a graph that fits in one network packet. The cap bounds driver
# transfer at ~2 MB (CAP × two 8-byte ids + row overhead); above it
# the distributed path runs exactly as before, so the operator's
# 100 TB story is unchanged — near-dup PAIR sets are orders smaller
# than the corpus, but when they aren't, nothing ever collects them.
LOCAL_SOLVE_CAP = 100_000


def _local_components(rows: list) -> list:
    """Driver-side union-find over a bounded edge list → [(node,
    component=min reachable id)]. Same contract as the distributed
    path, bit-for-bit."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: the smaller id becomes the root, so roots
            # are already the component minimum when the loop ends
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(node, find(node)) for node in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    strict: bool = True,
    local_solve_cap: int = LOCAL_SOLVE_CAP,
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node
    id reachable. Deterministic.

    Adaptive execution: the distinct edge set is materialized first
    (it feeds every round); if it holds ≤ LOCAL_SOLVE_CAP edges the
    components are solved on the driver with union-find (one bounded
    collect — candidate-pair graphs after LSH/blocking are tiny
    relative to the corpus), otherwise the distributed alternating
    large-star/small-star loop runs.

    Convergence contract (distributed path): a round whose edge-set
    checksum matches the previous round is verified by an EXACT
    multiset comparison before being accepted as the fixpoint. If
    ``max_iterations`` rounds pass without a verified fixpoint,
    ``strict=True`` (default) raises rather than silently returning
    split components; ``strict=False`` returns the partial labels
    (every label is still a valid member of its true component, just
    possibly not the global min)."""
    # materialize the edge set FIRST: `edges` may itself be an
    # expensive pipeline (e.g. LSH candidate generation), and the
    # star rewrites reference it repeatedly — without this checkpoint
    # the candidate pipeline would re-execute every round
    # null ids are dropped HERE, in the projection both paths share:
    # without the filter the driver union-find raised TypeError
    # comparing None roots while the distributed loop silently emitted
    # a (null, null) row — same input, different behavior depending on
    # edge count (ADVICE r6). An edge with an unknown endpoint carries
    # no usable connectivity; both paths now ignore it identically.
    raw = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    # ONE driver round-trip sizes the graph AND fetches it when small:
    # take(cap+1) returns every row iff the set holds ≤ cap edges, so
    # the fast path no longer pays a limit().count() probe followed by
    # a second full collect() over the same checkpoint (ADVICE r6).
    head = raw.take(local_solve_cap + 1)
    if len(head) <= local_solve_cap:
        spark = edges.sparkSession
        labels = _local_components([(r[0], r[1]) for r in head])
        # node type = the a/b common supertype (plan-derived, no job)
        out_schema = (
            raw.select(F.col("a").alias("node"))
            .unionByName(raw.select(F.col("b").alias("node")))
            .select("node", F.col("node").alias("component"))
            .schema
        )
        if not labels:
            return spark.createDataFrame([], out_schema)
        return spark.createDataFrame(labels, out_schema)
    # every node that appears anywhere — taken from the RAW pair set,
    # BEFORE the self-loop filter below, so a node appearing only as
    # an (x, x) pair still receives its self-label via the final
    # coalesce instead of vanishing from the output. Lazy over the
    # checkpoint; used once in the final join.
    nodes = (
        raw.select(F.col("a").alias("node"))
        .unionByName(raw.select(F.col("b").alias("node")))
        .distinct()
    )
    # self-loops carry no connectivity — drop them from the star loop.
    # A lazy filter over the checkpoint: each loop reference re-scans
    # the materialized blocks, not the upstream (possibly expensive)
    # pair pipeline.
    cur = raw.where(F.col("a") != F.col("b"))

    # No checksum of the INPUT set: real pipelines never arrive
    # converged, so the first comparable round is round 2 — saving one
    # driver round-trip on every invocation at the cost of one extra
    # rewrite round iff the caller passed an already-star-shaped set.
    prev_sum: tuple | None = None
    converged = False
    for _ in range(max_iterations):
        # lazy checkpoint: the checksum action right below is the
        # round's single job — it materializes the checkpoint AND
        # returns the fixpoint probe in one pass (eager=True would
        # spend a second job per round on the same data)
        new = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        cur_sum = _edge_checksum(new)
        if cur_sum == prev_sum:
            # checksum says fixpoint — confirm exactly. Both sides are
            # distinct sets and the checksum already matched counts, so
            # new ⊆ cur alone proves equality (one exactly-once job).
            if new.exceptAll(cur).limit(1).count() == 0:
                cur = new
                converged = True
                break
        cur = new
        prev_sum = cur_sum
    if not converged and strict:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations or pass strict=False for "
            "partial labels"
        )
    # fixpoint edges are rooted stars (node → component min); roots
    # and isolated nodes label themselves
    return (
        nodes.join(cur, nodes["node"] == cur["a"], "left")
        .select(
            "node",
            F.coalesce(F.col("b"), F.col("node")).alias("component"),
        )
    )


def dedup_clusters(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, is_keeper). Keeper = min
    doc_id per cluster, derived as a per-cluster window min rather
    than ``node == component`` — with partial labels a split cluster
    could otherwise have zero keepers, and downstream "keep keepers
    only" would drop every doc in it. The window min guarantees
    exactly one keeper per emitted cluster_id unconditionally."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.min("node").over(w)).alias("is_keeper"),
    )
