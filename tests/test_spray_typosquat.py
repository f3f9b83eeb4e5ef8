"""Non-vacuity pins for the spray/typosquat keys (the VERDICT r8
join_anti lesson: a flag whose true class the testdata never
exercises is a vacuous hash match). Both keys plant deterministic
positives in BOTH engines; these tests pin that the plants actually
land."""

from __future__ import annotations

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


def test_typosquat_online_twin_equals_batch(spark):
    """The eleventh online/offline twin: the pair-drain streaming form
    must reproduce the batch fuzzy-join output exactly (COUNT-only
    state, order-insensitive — no ordering contract to violate)."""
    batch = {
        tuple(r)
        for r in registry.QUERIES["logs_typosquat"](spark, SF).collect()
    }
    online = {
        tuple(r)
        for r in registry.QUERIES["stream_exec_typosquat"](
            spark, SF
        ).collect()
    }
    assert batch == online and batch


def test_natural_traffic_never_alerts(spark):
    """The plants are the ONLY positives: every spray flag sits in
    the plant's hour slot on the quarantine net (natural signups are
    too sparse to trip the threshold), and every typosquat match is
    a planted domain (vocab hits are distance 0, excluded by >= 1;
    .bad labels differ in length from every vocab entry by >= 4, so
    no natural domain can ever pass the band)."""
    from kawa_spark.queries.events import HOUR_US
    from kawa_spark.queries.security import PLANT_BASE_US

    plant_slot = PLANT_BASE_US // HOUR_US
    sprays = (
        registry.QUERIES["events_password_spray"](spark, SF)
        .filter("is_spray")
        .collect()
    )
    assert {(r["net"], r["hour_slot"]) for r in sprays} == {
        ("quarantine", plant_slot)
    }
    typos = registry.QUERIES["logs_typosquat"](spark, SF).collect()
    assert {r["domain"] for r in typos} == {d for d, _ in TYPO_PLANTS}
