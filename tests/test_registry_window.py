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
