"""scripts/idle_merge.py merge() semantics (ADVICE r13): per-key
minima, post-only restriction for changed keys, and the loud failure
when a --changed key appears in no post capture."""

from __future__ import annotations

import pytest

from scripts.idle_merge import merge


def _cap(queries, load=(0.1, 0.2, 0.3)):
    return {
        "queries": queries,
        "queries_audit": {},
        "queries_cold": {},
        "sf": "0.1",
        "host": {"loadavg_at_launch": list(load), "cpus": 32},
    }


def test_min_merge_and_changed_post_only():
    pre = [_cap({"a": 1.0, "b": 5.0}), _cap({"a": 0.8, "b": 6.0})]
    post = [_cap({"a": 2.0, "b": 4.0})]
    rec = merge(pre, post, {"b"}, "", "")
    # unchanged key: min across ALL captures; changed key: post only
    assert rec["queries"]["a"] == 0.8
    assert rec["queries"]["b"] == 4.0


def test_changed_key_absent_from_post_fails_loudly():
    pre = [_cap({"a": 1.0})]
    post = [_cap({"a": 0.9})]
    with pytest.raises(ValueError, match="absent from every --post"):
        merge(pre, post, {"typo_key"}, "", "")


def test_changed_without_post_rejected():
    with pytest.raises(ValueError, match="no --post"):
        merge([_cap({"a": 1.0})], [], {"a"}, "", "")
