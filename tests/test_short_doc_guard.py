"""Short-document guard for the shared bigram shingler (ADVICE r7).

The unguarded pattern — ``F.sequence(F.lit(1), F.size(ws) - 1)`` —
crashes on 0/1-word docs: Spark's ``sequence(1, 0)`` infers step -1
and yields ``[1, 0]``, so ``F.slice(ws, 0, 2)`` throws
INVALID_PARAMETER_VALUE.START at runtime, while the DuckDB oracle's
``generate_series(1, 0)`` is simply empty. ``hof.bigrams`` guards
with ``when(size >= 2, ...)``; these tests pin the guard with docs of
0, 1, 2 and N words, and property-test against a brute-force Python
shingler.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kawa_spark.functions.hof import bigrams, bind


def _spark_bigrams(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "text": texts})
    )
    col = bind(F.split(F.lower(F.col("text")), " "), bigrams)
    rows = df.select("i", col.alias("bg")).orderBy("i").collect()
    return [r["bg"] for r in rows]


def _py_bigrams(text):
    ws = text.lower().split(" ")
    return [f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)]


def test_short_docs_do_not_crash(spark):
    texts = ["", "one", "two words", "a b c", "x " * 5]
    got = _spark_bigrams(spark, texts)
    assert got == [_py_bigrams(t) for t in texts]
    # the 0- and 1-word docs must shingle to EMPTY (explode → 0 rows),
    # matching DuckDB's empty generate_series(1, 0); "" splits to
    # [""] — one (empty) word — so it is a 1-word doc
    assert got[0] == []
    assert got[1] == []


def test_explode_drops_short_docs(spark):
    """End-to-end posting shape: short docs contribute zero rows."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["solo", "a b", "p q r"]})
    )
    col = bind(F.split(F.lower(F.col("text")), " "), bigrams)
    posts = df.select("doc_id", F.explode(col).alias("bg")).collect()
    by_doc = {}
    for r in posts:
        by_doc.setdefault(r["doc_id"], []).append(r["bg"])
    assert 1 not in by_doc
    assert by_doc[2] == ["a b"]
    assert by_doc[3] == ["p q", "q r"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=3),
            min_size=0,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_bigrams_match_python_reference(spark, texts):
    assert _spark_bigrams(spark, texts) == [_py_bigrams(t) for t in texts]
