"""Non-vacuity pins for the spray/typosquat keys (the VERDICT r8
join_anti lesson: a flag whose true class the testdata never
exercises is a vacuous hash match). Both keys plant deterministic
positives in BOTH engines; these tests pin that the plants actually
land."""

from __future__ import annotations

import pytest

from kawa_spark import registry
from kawa_spark.queries.security import (
    SPRAY_MIN_USERS,
    SPRAY_PLANT_N,
    TYPO_PLANTS,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_spray_flags_planted_net_and_only_it(spark):
    rows = registry.QUERIES["events_password_spray"](spark, SF).collect()
    hot = [r for r in rows if r["is_spray"]]
    cold = [r for r in rows if not r["is_spray"]]
    assert len(hot) == 1, hot
    assert hot[0]["net"] == "quarantine"
    assert hot[0]["n_users"] == SPRAY_PLANT_N >= SPRAY_MIN_USERS
    # the plant's 40 attempts all land in ONE hour slot
    assert hot[0]["n_attempts"] >= SPRAY_PLANT_N
    assert cold, "no false class — natural signups missing"


def test_spray_online_twin_equals_batch(spark):
    batch = {
        tuple(r)
        for r in registry.QUERIES["events_password_spray"](
            spark, SF
        ).collect()
    }
    online = {
        tuple(r)
        for r in registry.QUERIES["stream_exec_password_spray"](
            spark, SF
        ).collect()
    }
    assert batch == online


def test_typosquat_finds_exactly_the_plants(spark):
    rows = registry.QUERIES["logs_typosquat"](spark, SF).collect()
    got = {(r["domain"], r["edit_dist"]) for r in rows}
    assert got == {(dom, 1) for dom, _ in TYPO_PLANTS}
    by_dom = {r["domain"]: r for r in rows}
    for dom, k in TYPO_PLANTS:
        assert by_dom[dom]["n_events"] == k
        # every second plant event reuses the prior account
        assert by_dom[dom]["n_users"] < by_dom[dom]["n_events"]


@pytest.mark.parametrize(
    "key", ["events_password_spray", "logs_typosquat"]
)
def test_vocab_and_bad_domains_never_match(spark, key):
    """Whitelist hits are distance 0 (excluded by >= 1) and .bad
    domains are length-pruned — natural traffic alone must produce
    zero typosquat matches and zero sprays (asserted via the planted
    rows being the only positives, covered above); here: the OUTPUT
    schema carries no nulls (both engines agree on completeness)."""
    df = registry.QUERIES[key](spark, SF)
    n = df.count()
    assert df.dropna().count() == n
