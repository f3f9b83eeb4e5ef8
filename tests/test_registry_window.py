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

# rows-only keys deliberately allowed inside the window: the driver's
# weaker rows-check is still evidence the query runs under the driver
ROWS_ONLY_WINDOW_OK = {
    "udtf_lateral",  # UDTF fan-out; oracle-free by design (Python-defined)
    "stream_exec_running_total",  # float cumsum order depends on state chunks
    "stream_exec_session_totals",  # same, plus open-session retention
    "percentile_approx",  # approximate by definition
}


def test_window_occupies_first_slots():
    keys = list(registry.QUERIES)
    assert keys[:WINDOW_SIZE] == registry.DRIVER_WINDOW


def test_window_size_is_driver_cap():
    assert len(registry.DRIVER_WINDOW) == WINDOW_SIZE
    assert len(set(registry.DRIVER_WINDOW)) == WINDOW_SIZE


def test_window_keys_are_oracle_backed_or_allowlisted():
    for k in registry.DRIVER_WINDOW:
        assert k in registry.ORACLES or k in ROWS_ONLY_WINDOW_OK, (
            f"{k} sits in the driver window without an oracle and is "
            "not on the rows-only allowlist — either add an oracle or "
            "swap in an oracle-backed key"
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
