"""transformWithStateInPandas (Spark 4 stateful API v2) coverage.

The live streaming path needs google.protobuf (the v2 state-server
protocol), absent from this container — that test auto-skips. The
processor's accumulation logic is unit-tested in-process regardless,
so the arithmetic stays pinned even where the runtime can't start.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kawa_spark.streaming.stateful import UserTotalsProcessor

try:
    from google.protobuf import descriptor  # noqa: F401

    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema):
        return self.state


def test_processor_accumulates_exact_cents():
    proc = UserTotalsProcessor()
    handle = _FakeHandle()
    proc.init(handle)

    batch1 = pd.DataFrame({"value": [1.25, 2.50]})
    out1 = list(proc.handleInputRows((7,), [batch1], None))
    assert len(out1) == 1
    assert out1[0].to_dict("records") == [
        {"user_id": 7, "n_events": 2, "total_cents": 375}
    ]

    # state carries into the next microbatch
    batch2 = pd.DataFrame({"value": [0.25]})
    out2 = list(proc.handleInputRows((7,), [batch2], None))
    assert out2[0].to_dict("records") == [
        {"user_id": 7, "n_events": 3, "total_cents": 400}
    ]
    assert handle.state.get() == (400, 3)


@pytest.mark.skipif(not HAVE_PROTOBUF, reason="v2 state server needs protobuf")
def test_v2_streaming_end_to_end(spark):
    from kawa_spark.io import stream_table
    from kawa_spark.streaming.stateful import user_totals_v2

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    df = user_totals_v2(stream_table(spark, "/root/testdata/sf0.001", "events"))
    q = (
        df.writeStream.format("memory")
        .queryName("v2_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.table("v2_totals")
    assert got.count() > 0
