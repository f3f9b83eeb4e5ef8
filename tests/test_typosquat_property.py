"""Property-based cross-check of the typosquat fuzzy-dim join
(queries/security.typosquat_matches) against a pure-Python
Levenshtein DP on random labels and random edits of whitelist
entries.

Why this exists: the hash oracle pins Spark's levenshtein against
DuckDB's on the REGISTERED inputs only (three planted typos). A
semantic divergence between the two engines' edit distance (or
between either and the textbook DP) on other string shapes —
prefixes, transposition-heavy strings, repeated characters — would
never surface there. This test drives the SAME core the registered
key calls on adversarial random inputs against an independent
reference implementation.
"""

from __future__ import annotations

import random

from kawa_spark.queries.security import typosquat_matches

ALPHABET = "abcdefghij.-0"
WHITELIST = ["mail.example.com", "www.acme.org", "api.shop.net"]
MAX_DIST = 2


def _lev(a: str, b: str) -> int:
    # textbook DP, the independent reference
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[len(b)]


def _ref_matches(domains, wl, max_dist):
    # deliberately UNBANDED: the production core's length-band
    # conjunct is an optimization (|len(a)-len(b)| lower-bounds the
    # edit distance), so comparing the banded Spark output against
    # this unbanded reference ALSO proves the band never prunes a
    # real match.
    out = set()
    for d in domains:
        for w in wl:
            dist = _lev(d, w)
            if 1 <= dist <= max_dist:
                out.add((d, w, dist))
    return out


def _random_edit(rng: random.Random, s: str, n_edits: int) -> str:
    cs = list(s)
    for _ in range(n_edits):
        op = rng.choice(["sub", "ins", "del"])
        if op == "sub" and cs:
            i = rng.randrange(len(cs))
            cs[i] = rng.choice(ALPHABET)
        elif op == "ins":
            i = rng.randrange(len(cs) + 1)
            cs.insert(i, rng.choice(ALPHABET))
        elif op == "del" and len(cs) > 1:
            del cs[rng.randrange(len(cs))]
    return "".join(cs)


def test_typosquat_matches_brute_force(spark):
    """Random near-whitelist edits + random junk labels: the Spark
    core's matched set (domain, wl_domain, edit_dist) must equal the
    DP reference's exactly — including edits that overshoot max_dist
    and random strings that collide back onto a whitelist entry
    (distance 0, which the >= 1 bound must exclude)."""
    rng = random.Random(0xC1DE)
    domains = set()
    for w in WHITELIST:
        for n_edits in (1, 2, 3):
            for _ in range(8):
                domains.add(_random_edit(rng, w, n_edits))
    domains.update(
        "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(1, 25)))
        for _ in range(40)
    )
    domains.update(WHITELIST)  # distance-0 rows must NOT match
    rows = [(d, 1, 1) for d in sorted(domains)]
    agg = spark.createDataFrame(
        rows, "domain string, n_events long, n_users long"
    )
    wl = spark.createDataFrame(
        [(w,) for w in WHITELIST], "wl_domain string"
    )
    got = {
        (r["domain"], r["wl_domain"], r["edit_dist"])
        for r in typosquat_matches(agg, wl, MAX_DIST).collect()
    }
    want = _ref_matches(sorted(domains), WHITELIST, MAX_DIST)
    assert got == want
    assert want, "degenerate run: no near-matches generated"


def test_blocked_form_equals_bnlj_form(spark):
    """typosquat_matches(blocked=True) — the PassJoin segment-blocked
    equi-join for 10^4+ whitelists — must be ROW-IDENTICAL to the
    BNLJ form on adversarial inputs: random multi-edit typos, junk
    labels, distance-0 collisions, short whitelist entries (len <=
    max_dist forces zero-length segments, the trivial-match
    pigeonhole case), and repeated-character strings where a naive
    blocking scheme double-counts."""
    rng = random.Random(0xB10C)
    wl_entries = sorted(
        set(WHITELIST)
        | {"a", "ab", "aaa", "a-b.c", "0000000000"}
        | {
            "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(1, 18)))
            for _ in range(30)
        }
    )
    domains = set(wl_entries)  # distance-0 rows must NOT match
    for w in wl_entries:
        for n_edits in (1, 2, 3):
            for _ in range(4):
                domains.add(_random_edit(rng, w, n_edits))
    domains.update(
        "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(1, 25)))
        for _ in range(40)
    )
    rows = [(d, i + 1, 1) for i, d in enumerate(sorted(domains))]
    agg = spark.createDataFrame(
        rows, "domain string, n_events long, n_users long"
    )
    wl = spark.createDataFrame(
        [(w,) for w in wl_entries], "wl_domain string"
    )
    bnlj = {
        tuple(r)
        for r in typosquat_matches(agg, wl, MAX_DIST).collect()
    }
    blocked = {
        tuple(r)
        for r in typosquat_matches(
            agg, wl, MAX_DIST, blocked=True
        ).collect()
    }
    assert blocked == bnlj
    assert bnlj, "degenerate run: no near-matches generated"
    # and both agree with the unbanded DP reference
    want = _ref_matches(sorted(domains), wl_entries, MAX_DIST)
    assert {(d, w, dist) for d, w, dist, _, _ in bnlj} == want
