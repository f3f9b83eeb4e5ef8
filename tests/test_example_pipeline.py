"""The examples/log_pipeline.py flow end-to-end: tail → parse →
enrich → route → archive, with offset resume."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo/examples")

from log_pipeline import start_pipeline  # noqa: E402


class _Collector:
    def __init__(self):
        self.rows = []

    def write_batch(self, df):
        self.rows.extend(r.asDict() for r in df.collect())


def _emit(log, i, level):
    with open(log, "a") as f:
        f.write(
            json.dumps(
                {
                    "event": f"evt-{i}",
                    "level": level,
                    "user": f"u{i % 3}",
                    "ts": f"2024-02-01 0{i % 10}:00:00",
                }
            )
            + "\n"
        )


def test_log_pipeline_routes_and_archives(spark, tmp_path):
    log = tmp_path / "app.jsonl"
    archive = str(tmp_path / "archive")
    cp = str(tmp_path / "cp")
    for i, lv in enumerate(["INFO", "ERROR", "WARN", "FATAL", "INFO"]):
        _emit(log, i, lv)

    errors = _Collector()
    q = start_pipeline(spark, str(log), archive, cp, error_sink=errors)
    q.awaitTermination(120)

    # errors routed with enrichment intact
    assert sorted(r["event"] for r in errors.rows) == ["evt-1", "evt-3"]
    assert {r["severity"] for r in errors.rows} == {3, 4}

    # the rest archived as gzip NDJSON in time partitions
    archived = spark.read.json(archive)
    assert sorted(r["event"] for r in archived.collect()) == [
        "evt-0",
        "evt-2",
        "evt-4",
    ]
    import glob
    import os

    assert glob.glob(os.path.join(archive, "dt=2024-02-01", "hr=*"))

    # resume: only new records flow on the next drain
    _emit(log, 9, "ERROR")
    errors.rows.clear()
    q2 = start_pipeline(spark, str(log), archive, cp, error_sink=errors)
    q2.awaitTermination(120)
    assert [r["event"] for r in errors.rows] == ["evt-9"]


def test_training_data_pipeline_composes(spark, tmp_path):
    """examples/training_data_pipeline.py: the quality → dedup →
    order → clustered-write composition produces a deterministic,
    properly-filtered training set."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from training_data_pipeline import build_training_set

    sf = "/root/testdata/sf0.001"
    ts = build_training_set(spark, sf)
    rows = ts.collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert 0 < len(rows) < n_docs  # gates actually dropped something
    # deterministic: same input → identical set and order key
    again = {(r["doc_id"], r["global_pos"]) for r in build_training_set(spark, sf).collect()}
    assert {(r["doc_id"], r["global_pos"]) for r in rows} == again
    # positions are unique (a valid training order)
    poss = [r["global_pos"] for r in rows]
    assert len(set(poss)) == len(poss)
    # near-dup losers really are gone: no doc that a cluster marked
    # non-keeper survives
    from kawa_spark.queries.llm_dedup import dedup_clusters_query
    from pyspark.sql import functions as F

    losers = {
        r["doc_id"]
        for r in dedup_clusters_query(spark, sf).filter(~F.col("is_keeper")).collect()
    }
    assert losers and not losers & {r["doc_id"] for r in rows}
    # span-contamination gate (r10 stage): runs over the SURVIVOR
    # set with the plant-free core (code review r10 — the raw-corpus
    # form flagged dup-group keepers against the very copies dedup
    # removed, and let synthetic plant windows count). Recompute it
    # exactly as the pipeline does and assert the composition.
    from kawa_spark.queries.llm_dedup import dedup_exact_norm, span_fractions
    from kawa_spark.queries.llm_quality import quality_gopher_filter

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    survivors = {r["doc_id"] for r in rows}
    q_ok = {
        r["doc_id"]
        for r in quality_gopher_filter(spark, sf)
        .filter(F.col("keep"))
        .collect()
    }
    keepers = {
        r["keeper_id"] for r in dedup_exact_norm(spark, sf).collect()
    }
    dedup_survivors = (q_ok & keepers) - losers
    # image-level gate (r12 stage): plant-free cores on the survivor
    # set, exactly as the pipeline composes them
    from kawa_spark.queries.llm_multimodal import (
        image_dedup_from_hashes,
        image_hashes,
    )

    img_in = docs.filter(
        F.col("doc_id").isin([int(x) for x in dedup_survivors])
        & (F.length("text") > 0)
    ).select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    # confirmed drops only (ADVICE r12), exactly as the pipeline
    # composes them: a hash-collided doc is dropped only when its
    # 512-byte rendered crop equals the keeper's byte-for-byte
    img_crops = {
        r["doc_id"]: bytes(r["crop"])
        for r in img_in.select(
            "doc_id", F.substring(F.col("payload"), 1, 512).alias("crop")
        ).collect()
    }
    img_losers = {
        r["doc_id"]
        for r in image_dedup_from_hashes(image_hashes(img_in))
        .filter(F.col("is_dup"))
        .collect()
        if img_crops[r["doc_id"]] == img_crops[r["keeper"]]
    }
    post_img = dedup_survivors - img_losers
    gate_in = docs.filter(
        F.col("doc_id").isin([int(x) for x in post_img])
    )
    contaminated = {
        r["doc_id"]
        for r in span_fractions(gate_in)
        .filter(F.col("is_contaminated"))
        .collect()
    }
    assert survivors == post_img - contaminated
    # prove the image gate BITES where every text gate can't: same
    # rendered image (shared leading 512 bytes), different byte tails
    crop = ("x" * 512)[:512]
    ibite = spark.createDataFrame(
        [
            (1, crop + " tail one"),
            (2, crop + " tail two"),
            (3, "entirely different content"),
        ],
        "doc_id long, text string",
    ).select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    idup = {
        r["doc_id"]
        for r in image_dedup_from_hashes(image_hashes(ibite))
        .filter(F.col("is_dup"))
        .collect()
    }
    assert idup == {2}  # min-id keeper survives, its image-twin drops
    # on THIS corpus the near-dup stage already removes every
    # majority-duplicated doc, so the gate is a no-op here — honest
    # (its target is boilerplate that survives dedup). Prove the gate
    # BITES where dedup can't: two survivor-like docs sharing a
    # majority body but different enough to evade near-dup pairing.
    shared = " ".join(f"w{i}" for i in range(30))
    bite = spark.createDataFrame(
        [
            (1, shared + " unique tail one alpha beta gamma delta"),
            (2, shared + " other tail two epsilon zeta eta theta"),
            (3, "completely different text about nothing shared at all here"),
        ],
        "doc_id long, text string",
    )
    bitten = {
        r["doc_id"]
        for r in span_fractions(bite)
        .filter(F.col("is_contaminated"))
        .collect()
    }
    assert bitten == {1, 2}


def test_daily_update_gates_compose(spark):
    """examples/training_data_pipeline.daily_update (r12; image gate
    r14): the incremental form classifies today's batch against the
    committed prior corpus through the registry cores. Checked
    independently: accepted docs are exactly the batch minus
    (exact-gate drops ∪ near-dup-gate drops ∪ image-gate drops), the
    exact gate is verified against a hashlib digest reference, and
    all three gates bite (a re-delivered prior doc exercises
    dup_prior; the natural cross-split near-dups exercise the
    minhash gate; a planted same-crop/different-text re-encode
    exercises the image gate — the class the first two structurally
    miss)."""
    import hashlib
    import re
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo/examples")
    from training_data_pipeline import daily_update

    from kawa_spark.queries.llm_dedup import (
        INC_PRIOR_MOD,
        incremental_minhash_matches,
        is_prior_doc,
    )
    from kawa_spark.queries import llm_multimodal as M
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    nat = con.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    con.close()
    nat = [(int(d), t) for d, t in nat]
    prior_rows = [(d, t) for d, t in nat if d % 10 < INC_PRIOR_MOD]
    new_rows = [(d, t) for d, t in nat if d % 10 >= INC_PRIOR_MOD]
    # a re-delivered prior doc (same text, new id) must be dropped by
    # the EXACT gate — at-least-once redelivery, the tier's raison
    redelivered = (-1, prior_rows[0][1])
    new_rows = new_rows + [redelivered]
    # image-gate plant: a prior doc whose 512-byte crop a NEW doc
    # reproduces exactly while the text body diverges completely (a
    # long disjoint-word tail → different digest, shingle jaccard ≈ 0)
    # — only the rendered image agrees. The irregular 512-char body
    # from the near-dup plant construction keeps its bands out of the
    # corpus's crowded low-entropy buckets.
    crop_body = M._dhash_near_plants()[0][1][:512]
    img_tail = " ".join(f"imgtailword{i}" for i in range(400))
    prior_rows = prior_rows + [(-51, crop_body + " end-of-prior")]
    img_plant = (-52, crop_body + " " + img_tail)
    new_rows = new_rows + [img_plant]

    prior = spark.createDataFrame(prior_rows, "doc_id long, text string")
    newb = spark.createDataFrame(new_rows, "doc_id long, text string")
    accepted = {r["doc_id"] for r in daily_update(spark, prior, newb).collect()}

    def norm_digest(t: str) -> str:
        return hashlib.md5(
            re.sub(r"\s+", " ", t).strip().lower().encode()
        ).hexdigest()

    prior_digests = {norm_digest(t) for _, t in prior_rows}
    # exact gate reference covers BOTH exact classes (code review
    # r12): dup_prior (digest in the prior set) AND dup_batch (not
    # the min-doc_id keeper of its digest within the batch) — the
    # pipeline keeps only status=='kept'
    batch_keeper: dict[str, int] = {}
    for d, t in new_rows:
        h = norm_digest(t)
        batch_keeper[h] = min(batch_keeper.get(h, d), d)
    exact_drops = {
        d
        for d, t in new_rows
        if norm_digest(t) in prior_digests or d != batch_keeper[norm_digest(t)]
    }
    text_survivor_rows = [
        (d, t) for d, t in new_rows if d not in exact_drops
    ]
    near_drops = {
        r["doc_id"]
        for r in incremental_minhash_matches(
            prior,
            spark.createDataFrame(
                text_survivor_rows, "doc_id long, text string"
            ),
        ).collect()
    }
    text_survivor_rows = [
        (d, t) for d, t in text_survivor_rows if d not in near_drops
    ]
    # image-gate reference: the shared hash-level core over the same
    # side-tagged inputs the example feeds it (the core itself is
    # brute-force-pinned in test_image_dedup.py)
    def _href(rows, side):
        docs = spark.createDataFrame(
            [(d, t) for d, t in rows if t], "doc_id long, text string"
        ).select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
        return M.image_hashes(docs).select(
            "doc_id",
            "dhash",
            F.lit(side).alias("side"),
            M._dhash_int().alias("dhash_int"),
        )

    image_drops = {
        r["doc_id"]
        for r in M.incremental_image_from_hashes(
            _href(prior_rows, "p").unionByName(
                _href(text_survivor_rows, "n")
            )
        ).collect()
    }
    want = (
        {d for d, _ in new_rows} - exact_drops - near_drops - image_drops
    )
    assert accepted == want, sorted(accepted ^ want)
    # all three gates bit: the redelivered doc via the exact gate,
    # the natural cross-split near-dups via the minhash gate, the
    # same-crop plant via the image gate
    assert redelivered[0] in exact_drops
    assert redelivered[0] not in accepted
    assert near_drops, "near-dup gate must drop the natural re-crawls"
    assert img_plant[0] not in exact_drops and img_plant[0] not in near_drops
    assert img_plant[0] in image_drops, "image gate must drop the re-encode"
    assert img_plant[0] not in accepted
    assert len(accepted) < len(new_rows) - 2


def test_security_analytics_composes(spark):
    """examples/security_analytics.py: the r8 detection tier composed
    over one debounced stream — detectors agree with their registry
    twins' semantics on the shared input."""
    from security_analytics import alert_relation, debounced_events

    SF = "/root/testdata/sf0.001"
    clean = debounced_events(spark, SF)
    n_clean = clean.count()
    from kawa_spark.io import table as _table

    n_raw = _table(spark, SF, "events").count()
    assert 0 < n_clean <= n_raw

    alerts = alert_relation(spark, SF).collect()
    assert alerts, "pipeline must produce alerts on the testdata"
    kinds = {r["alert"] for r in alerts}
    # heavy hitters always exist; drift always flags day-1 templates
    assert "heavy_hitter" in kinds
    assert "new_template" in kinds
    assert all(r["severity"] in (1, 2, 3, 4) for r in alerts)
    # heavy-hitter count: exactly K per type present
    hh = [r for r in alerts if r["alert"] == "heavy_hitter"]
    types = _table(spark, SF, "events").select("event_type").distinct().count()
    from kawa_spark.queries.events import HH_TOP_K

    assert len(hh) <= types * HH_TOP_K
    # r9 detectors: quarantine covers 1/64 of the derived ip space, so
    # hits exist at any sf; subjects are "user#session" composites
    assert "quarantine_net" in kinds
    for r in alerts:
        if r["alert"] == "improbable_session":
            assert "#" in r["subject"]
    # late-r9 detectors: the planted callback streams guarantee
    # beaconing fires (both plant keys), and the dense synthetic
    # per-user stream guarantees net hops inside the window
    beacons = [r for r in alerts if r["alert"] == "beaconing"]
    assert {r["subject"] for r in beacons} >= {
        "9900001/beacon",
        "9900002/beacon",
    }
    assert "impossible_travel" in kinds
    for r in alerts:
        if r["alert"] == "impossible_travel":
            assert " -> " in r["subject"]
    # r10 detectors: the planted walks guarantee lateral movement
    # fires with both severities (true pivot 3, roundtrip bounce 2)
    lm = [r for r in alerts if r["alert"] == "lateral_movement"]
    assert {
        r["subject"] for r in lm if r["severity"] == 3
    } >= {"quarantine -> corp-east-dc1 -> corp-guest"}
    assert {
        r["subject"] for r in lm if r["severity"] == 2
    } >= {"quarantine -> corp-east-dc1 -> quarantine"}
    # weekday affinity stays QUIET on the uniform demo traffic (no
    # plant in the example by design) — absence IS the assertion
    # (code review r10: the earlier severity-shaped form was a
    # tautology)
    assert not any(r["alert"] == "weekday_affinity" for r in alerts)
    # r11 detectors: the planted 4-net walks guarantee 3-hop chains
    # with both severities (true deep pivot 4, return bounce 3)
    lm3 = [r for r in alerts if r["alert"] == "lateral_movement_3hop"]
    assert {
        r["subject"] for r in lm3 if r["severity"] == 4
    } >= {"quarantine -> corp-east-dc1 -> corp-west -> corp-guest"}
    assert {
        r["subject"] for r in lm3 if r["severity"] == 3
    } >= {"quarantine -> corp-east-dc1 -> corp-west -> quarantine"}


def test_security_analytics_spray_and_typosquat_fire(spark):
    """The two r9-continuation detectors fire on their plants: the
    spray alert names the quarantine net with the full planted
    account count, and the typosquat alerts are exactly the planted
    look-alike domains."""
    from security_analytics import alert_relation

    from kawa_spark.queries.security import SPRAY_PLANT_N, TYPO_PLANTS

    alerts = alert_relation(spark, "/root/testdata/sf0.001").collect()
    sprays = [r for r in alerts if r["alert"] == "password_spray"]
    assert len(sprays) == 1, sprays
    assert sprays[0]["subject"].startswith("quarantine@h")
    assert f"users={SPRAY_PLANT_N}" in sprays[0]["detail"]
    typos = {
        r["subject"] for r in alerts if r["alert"] == "typosquat"
    }
    assert typos == {dom for dom, _ in TYPO_PLANTS}


def test_vector_pipeline_composes(spark):
    """The embedding-side index build: one card per vector with every
    index column populated, and the six-method audit with the exact
    structural orderings (wide probes ≥ narrow for both families —
    superset candidate sets)."""
    import re

    from vector_pipeline import audit_report, build_vector_index

    sf = "/root/testdata/sf0.001"
    idx = build_vector_index(spark, sf).collect()
    assert len(idx) == 500  # one card per vector
    code_re = re.compile(r"^\d+(,\d+){3}$")
    for r in idx:
        assert code_re.match(r["pq_codes"]), r["pq_codes"]
        assert r["q_err"] >= 0
        assert 0 <= r["cluster_id"] < 8
        assert r["scale"] is not None and r["q8_csv"]

    audit = {r["method"]: r for r in audit_report(spark, sf).collect()}
    assert set(audit) == {
        "ivf_kmeans",
        "ivf_kmeans_wide",
        "lsh_ann",
        "lsh_multiprobe",
        "lsh_multiprobe_wide",
        "pq_adc",
    }
    assert all(r["method_total"] == 50 for r in audit.values())
    # superset candidate sets ⇒ recall can only go up with the knob
    assert audit["ivf_kmeans_wide"]["method_hits"] >= audit["ivf_kmeans"]["method_hits"]
    assert (
        audit["lsh_multiprobe_wide"]["method_hits"]
        >= audit["lsh_multiprobe"]["method_hits"]
        >= audit["lsh_ann"]["method_hits"]
    )
    assert audit["pq_adc"]["method_hits"] > 0
