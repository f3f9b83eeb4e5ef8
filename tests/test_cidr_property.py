"""Property-based cross-check of the longest-prefix-match core
(security.longest_prefix_match) against a brute-force Python
reference on random addresses and random NESTED CIDR plans — the
overlap/argmax semantics (most specific prefix wins, no-match rows
dropped) are the part a plain range join gets wrong.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.security import longest_prefix_match


def _ref(ips: list[tuple[int, int]], nets: list[tuple[str, int, int, int]]):
    """row_id → (net, plen) of the max (plen, net) among matches."""
    out = {}
    for rid, ip in ips:
        best = None
        for net, plen, lo, hi in nets:
            if lo <= ip <= hi:
                cand = (plen, net)
                if best is None or cand > best:
                    best = cand
        if best is not None:
            out[rid] = (best[1], best[0])
    return out


@st.composite
def cidr_plan(draw):
    """A random set of genuinely CIDR-shaped [lo, hi] blocks over a
    small 8-bit space: aligned power-of-two blocks, so nesting and
    same-length disjointness mirror real prefix structure."""
    nets = []
    n = draw(st.integers(1, 6))
    for i in range(n):
        plen = draw(st.integers(0, 8))  # block size 2^(8-plen)
        size = 1 << (8 - plen)
        lo = draw(st.integers(0, (256 // size) - 1)) * size
        nets.append((f"net{i}", plen, lo, lo + size - 1))
    return nets


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    nets=cidr_plan(),
    ip_vals=st.lists(st.integers(0, 255), min_size=1, max_size=30),
)
def test_lpm_matches_bruteforce(spark, nets, ip_vals):
    ips = [(i, v) for i, v in enumerate(ip_vals)]
    ips_df = spark.createDataFrame(ips, "rid long, ip long")
    nets_df = spark.createDataFrame(
        nets, "net string, plen long, lo long, hi long"
    )
    got = {
        r["rid"]: (r["net"], r["plen"])
        for r in longest_prefix_match(ips_df, nets_df).collect()
    }
    assert got == _ref(ips, nets), (nets, ip_vals)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    nets=cidr_plan(),
    ip_vals=st.lists(st.integers(0, 255), min_size=1, max_size=30),
    bucket_bits=st.sampled_from([0, 3, 8]),
)
def test_bucketed_lpm_equals_mapside(spark, nets, ip_vals, bucket_bits):
    """The BGP-scale bucketized equi-join rewrite must equal the
    map-side broadcast-array form row-for-row — including plans with
    routes wider than a bucket (plen < bucket_bits, multi-bucket
    explode) and the degenerate bucket counts 0 (everything in one
    bucket) and addr_bits (one address per bucket)."""
    from kawa_spark.queries.security import longest_prefix_match_bucketed

    ips = [(i, v) for i, v in enumerate(ip_vals)]
    ips_df = spark.createDataFrame(ips, "rid long, ip long")
    nets_df = spark.createDataFrame(
        nets, "net string, plen long, lo long, hi long"
    )
    got = {
        r["rid"]: (r["net"], r["plen"])
        for r in longest_prefix_match_bucketed(
            ips_df, nets_df, bucket_bits=bucket_bits, addr_bits=8
        ).collect()
    }
    assert got == _ref(ips, nets), (nets, ip_vals, bucket_bits)
