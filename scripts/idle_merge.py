#!/usr/bin/env python
"""Min-merge bench captures into the round's idle record.

The per-round perf evidence discipline (docs/STATUS.md, r9 onward):
single captures on this host vary up to ~1.17× with ZERO code delta
(hypervisor steal, invisible to loadavg), so only per-key MINIMA
across several captures are comparable round-to-round. This script
folds N `bench.py` output files into one record shaped like
docs/bench_r{N}_idle.json.

Keys whose implementation changed mid-round must take minima from
post-change captures only — a pre-change capture can flatter them
(r13's dedup_incremental_embedding read 0.8× at the 100× probe
against its own leaked cache). Pass those via --changed, and list
the post-change captures after `--post`.

Usage:
  python scripts/idle_merge.py --out docs/bench_r14_idle.json \
      cap1.json cap2.json [--changed key1,key2 --post cap3.json ...]

Prints the merged record's headline and, if --prev is given, the
median per-key ratio against the previous round's idle record.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def _minmerge(caps: list[dict], field: str, keys=None) -> dict:
    out: dict = {}
    for c in caps:
        for k, v in (c.get(field) or {}).items():
            if keys is not None and k not in keys:
                continue
            out[k] = min(out.get(k, float("inf")), v)
    return out


def merge(
    pre: list[dict],
    post: list[dict],
    changed: set[str],
    reps_note: str,
    note: str,
) -> dict:
    """Min-merge pre+post captures; `changed` keys take post-only
    minima. `post` may be empty (no mid-round implementation
    changes), in which case `changed` must be empty too."""
    if changed and not post:
        raise ValueError("--changed given but no --post captures")
    caps = pre + post
    q = _minmerge(caps, "queries")
    qa = _minmerge(caps, "queries_audit")
    qc = _minmerge(caps, "queries_cold")
    if changed:
        # A --changed key absent from every post capture would
        # silently keep the pre-change (flattered) minimum — the
        # exact failure this restriction exists to prevent (ADVICE
        # r13). A typo'd or unbenched key must fail loudly instead.
        covered = set()
        for c in post:
            for field in ("queries", "queries_audit", "queries_cold"):
                covered |= set(c.get(field) or {})
        missing = changed - covered
        if missing:
            raise ValueError(
                f"--changed keys absent from every --post capture: "
                f"{sorted(missing)}"
            )
        q.update(_minmerge(post, "queries", changed))
        qa.update(_minmerge(post, "queries_audit", changed))
        qc.update(_minmerge(post, "queries_cold", changed))
    ref = caps[-1]
    return {
        "metric": "headline_query_wall_time",
        "value": round(sum(q.values()), 2),
        "unit": "sec",
        "queries": q,
        "queries_audit": qa,
        "audit_value": round(sum(qa.values()), 2),
        "queries_cold": qc,
        "sf": ref["sf"],
        "reps": reps_note,
        "host": {
            "loadavg_at_launch": [
                c["host"]["loadavg_at_launch"] for c in caps
            ],
            "cpus": ref["host"]["cpus"],
        },
        "note": note,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("captures", nargs="+", help="bench.py output files")
    p.add_argument("--post", nargs="*", default=[],
                   help="post-implementation-change captures")
    p.add_argument("--changed", default="",
                   help="comma-separated keys restricted to --post minima")
    p.add_argument("--out", required=True)
    p.add_argument("--prev", help="previous round's idle record to diff")
    p.add_argument("--reps", default="", help="reps provenance note")
    p.add_argument("--note", default="", help="record note")
    a = p.parse_args()

    pre = [json.load(open(f)) for f in a.captures]
    post = [json.load(open(f)) for f in a.post]
    changed = {k for k in a.changed.split(",") if k}
    rec = merge(pre, post, changed, a.reps, a.note)
    json.dump(rec, open(a.out, "w"), indent=1)
    print(f"wrote {a.out}: {len(rec['queries'])} production keys, "
          f"value {rec['value']} s, audit {rec['queries_audit']}")
    if a.prev:
        prev = json.load(open(a.prev))
        shared = set(rec["queries"]) & set(prev["queries"])
        rats = sorted(
            (rec["queries"][k] / prev["queries"][k], k) for k in shared
        )
        print(f"median per-key ratio vs {a.prev} on {len(shared)} shared "
              f"keys: {statistics.median(r for r, _ in rats):.3f}")
        print("worst3:", [(k, round(r, 2)) for r, k in rats[-3:]])


if __name__ == "__main__":
    sys.exit(main())
