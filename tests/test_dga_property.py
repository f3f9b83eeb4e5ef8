"""Property-based cross-check of the DGA label-feature core
(queries/security.dga_features) against collections.Counter on random
labels — the higher-order-function char statistics (nested
filter-inside-aggregate) are exactly the kind of expression a shared
construction error would mirror into the oracle."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.security import dga_features

LABEL_CHARS = "abcz019"


def _ref(domain):
    label = domain.split(".")[0]
    c = Counter(label)
    n = len(label)
    n_distinct = len(c)
    coll = sum(v * (v - 1) for v in c.values())
    n_digits = sum(v for k, v in c.items() if k.isdigit())
    is_dga = n >= 12 and n_digits >= 1 and 2 * n_distinct >= n
    return (n, n_distinct, coll, n_digits, is_dga)


@st.composite
def domains(draw):
    out = set()
    for _ in range(draw(st.integers(1, 8))):
        label = draw(
            st.text(alphabet=LABEL_CHARS, min_size=1, max_size=20)
        )
        out.add(label + draw(st.sampled_from([".com", ".bad", ".io"])))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ds=domains())
def test_dga_features_match_counter(spark, ds):
    agg = spark.createDataFrame(
        [(d, 1, 1) for d in ds],
        "domain string, n_events long, n_users long",
    )
    got = {
        r["domain"]: (
            r["label_len"],
            r["n_distinct"],
            r["coll"],
            r["n_digits"],
            r["is_dga"],
        )
        for r in dga_features(agg).collect()
    }
    assert got == {d: _ref(d) for d in ds}, ds
