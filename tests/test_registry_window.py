"""Registry-window hygiene (VERDICT r01 tasks 2 + 10).

The driver's correctness gate checks only the FIRST 50 registered
keys. These tests pin (a) that the intended DRIVER_WINDOW actually
occupies those slots, and (b) that the window is maximally useful:
every window key either carries a DuckDB oracle (full rows+schema+
hash check) or is on the explicit rows-only allowlist (semantics not
ANSI-SQL-expressible: approximate sketches, order-dependent float
state, opaque-binary kernels).
"""

from __future__ import annotations

from kawa_spark import registry

registry.load_all()

WINDOW_SIZE = 50


def test_window_occupies_first_slots():
    keys = list(registry.QUERIES)
    assert keys[:WINDOW_SIZE] == registry.DRIVER_WINDOW


def test_window_size_is_driver_cap():
    assert len(registry.DRIVER_WINDOW) == WINDOW_SIZE
    assert len(set(registry.DRIVER_WINDOW)) == WINDOW_SIZE


def test_every_key_is_oracle_backed():
    """As of round 4 every registered key carries a DuckDB oracle —
    the approximate ones via the exact-value + approx_within_tol
    pattern, the stub-kernel multimodal ones via exact byte-math
    twins, the passthrough bench via its constant delivery count.
    A key registered without an oracle is a regression to the
    driver's weaker rows-only check."""
    missing = sorted(set(registry.QUERIES) - set(registry.ORACLES))
    assert not missing, missing


def test_window_covers_all_driver_unseen_keys():
    """Round-4 rotation contract: every key with no driver evidence in
    CORRECTNESS_r01-r03 must sit in the window this round."""
    import json
    import os

    seen: set[str] = set()
    for r in (1, 2, 3):
        p = f"/root/repo/CORRECTNESS_r{r:02d}.json"
        if os.path.exists(p):
            with open(p) as f:
                seen |= set(json.load(f))
    if not seen:  # driver artifacts absent (fresh checkout)
        return
    unseen = set(registry.QUERIES) - seen
    assert unseen <= set(registry.DRIVER_WINDOW), sorted(
        unseen - set(registry.DRIVER_WINDOW)
    )


def test_every_key_still_registered_once():
    assert len(registry.QUERIES) >= 100
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_oracle_outputs_are_driver_canonicalizable(spark):
    """The driver canonicalizes hash-checked results via pandas
    sort_values, which dies on array/map/struct cells (round 1's
    array_map_ops failure). Every oracle-backed query must therefore
    emit scalar columns only — complex values go out stringified
    (array_join / to_json), as embedding_quantize does."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for key in registry.ORACLES:
        df = registry.QUERIES[key](spark, "/root/testdata/sf0.001")
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[key] = complex_cols
    assert not offenders, offenders
