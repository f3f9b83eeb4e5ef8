"""Every oracle-declared query must hash-match DuckDB at sf0.001.

This is a local pre-flight of the driver's t2 gate (which runs at
sf0.01); a failure here *will* fail there.
"""

from __future__ import annotations

import pytest

from kawa_spark import registry

registry.load_all()

from tests.oracle_harness import compare  # noqa: E402

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_match(spark, sf_dir, key):
    report = compare(spark, sf_dir, registry.QUERIES[key], registry.ORACLES[key])
    assert report["count_match"], report
    assert report["cols_match"], report
    assert report["values_match"], report


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, key):
    df = registry.QUERIES[key](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
