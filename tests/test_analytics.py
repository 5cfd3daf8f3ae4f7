"""Multi-join analytics: broadcast planning + Bloom pruning semantics."""

from __future__ import annotations

from tabsketchfm_spark.operators.analytics import bloom_prejoin_count, shipping_priority


def test_bloom_prejoin_superset_and_tight(spark, sf01):
    r = bloom_prejoin_count(spark, sf01).first()
    assert r.bloom_pruned_cnt >= r.exact_cnt  # no false negatives
    assert r.fp_overhead <= 0.02, r.fp_overhead  # fp rate within budget


def test_q3_broadcasts_dimension(spark, sf01):
    plan = (
        shipping_priority(spark, sf01)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_funnel_ordering_semantics(spark):
    """Earliest-completion funnel: a click BEFORE the user's first view
    does not advance the funnel; monotone drop-off across steps."""
    from datetime import datetime

    from tabsketchfm_spark.operators.analytics import funnel_counts

    rows = [
        # u1: full ordered funnel
        (1, datetime(2024, 1, 1, 10), 1, "view", 0.0, ""),
        (2, datetime(2024, 1, 1, 11), 1, "click", 0.0, ""),
        (3, datetime(2024, 1, 1, 12), 1, "signup", 0.0, ""),
        (4, datetime(2024, 1, 1, 13), 1, "purchase", 0.0, ""),
        # u2: click precedes the first view — stalls at step 1
        (5, datetime(2024, 1, 1, 9), 2, "click", 0.0, ""),
        (6, datetime(2024, 1, 1, 10), 2, "view", 0.0, ""),
        # u3: view then click, nothing else
        (7, datetime(2024, 1, 1, 10), 3, "view", 0.0, ""),
        (8, datetime(2024, 1, 1, 10), 3, "click", 0.0, ""),  # tie counts (>=)
        # u4: never viewed
        (9, datetime(2024, 1, 1, 10), 4, "purchase", 0.0, ""),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {r.step: r.n_users for r in funnel_counts(events).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 1}


def test_cohort_retention_shape(spark, sf01):
    """Every user appears in their own cohort's first activity week,
    and activity weeks never precede the cohort week."""
    from tabsketchfm_spark.operators.analytics import cohort_retention
    from tabsketchfm_spark.sources.tables import load_table

    rows = cohort_retention(load_table(spark, sf01, "events")).collect()
    assert rows
    assert all(r.activity_week >= r.cohort_week for r in rows)
    diag = {r.cohort_week: r.n_users for r in rows if r.activity_week == r.cohort_week}
    assert diag, "no diagonal cohort rows"


def test_user_value_trend_recovers_known_slope(spark):
    """OLS sanity: a perfectly linear value series recovers its exact
    slope (per day) and intercept; a single-event user reports NULL."""
    from datetime import datetime, timedelta

    from tabsketchfm_spark.operators.windows import user_value_trend

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: value = 10 + 2.5 * day
    for day in range(10):
        eid += 1
        rows.append((eid, t0 + timedelta(days=day), 1, "view", 10.0 + 2.5 * day, ""))
    rows.append((999, t0, 2, "view", 7.0, ""))  # single event
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {r.user_id: r for r in user_value_trend(events).collect()}
    assert abs(got[1].slope_per_day - 2.5) < 1e-6
    assert abs(got[1].intercept - 10.0) < 1e-6
    assert got[2].slope_per_day is None and got[2].n == 1


def test_funnel_semantics_batch_vs_streaming_contrast():
    """The documented divergence, executed: a user who CLICKS before
    their first VIEW then views and clicks again. The batch w6 chain
    (events at-or-after the previous stage's earliest completion)
    counts them at step 2; the streaming first-occurrence-ordered
    funnel (min(view) <= min(click)) does NOT — its state is only the
    per-(user, step) minimum, and that minimum click precedes the
    first view. Both contracts verified via their own oracle SQL on
    the same synthetic changelog."""
    import duckdb

    from tabsketchfm_spark.operators.analytics import funnel_counts_oracle_sql
    from tabsketchfm_spark.streaming.profile_stream import (
        streaming_funnel_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        """CREATE VIEW events AS SELECT * FROM (VALUES
             (1, TIMESTAMP '2024-01-01 00:00:00', 7, 'click', 1.0, NULL),
             (2, TIMESTAMP '2024-01-02 00:00:00', 7, 'view',  1.0, NULL),
             (3, TIMESTAMP '2024-01-03 00:00:00', 7, 'click', 1.0, NULL)
           ) v(event_id, ts, user_id, event_type, value, props)"""
    )
    steps = ["view", "click"]
    batch = {
        r[0]: r[2] for r in con.execute(funnel_counts_oracle_sql(steps)).fetchall()
    }
    stream = {
        r[0]: r[2]
        for r in con.execute(streaming_funnel_oracle_sql(steps)).fetchall()
    }
    assert batch == {1: 1, 2: 1}  # chain finds the later click
    assert stream == {1: 1, 2: 0}  # first occurrences are out of order


def test_domain_mixture_flattens_toward_small_domains(spark, sf01):
    """Temperature-0.5 property: the inclusion RATE of the smallest
    (lang, source) domain must be >= the rate of the largest (quota ∝
    sqrt(n) means rate ∝ 1/sqrt(n))."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.sources.splits import domain_mixture_sample
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    n = {
        (r["lang"], r["source"]): r["n"]
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    s = {
        (r["lang"], r["source"]): r["k"]
        for r in domain_mixture_sample(docs, k=150)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("k"))
        .collect()
    }
    small = min(n, key=n.get)
    big = max(n, key=n.get)
    assert n[big] > 2 * n[small], "testdata should have skewed domains"
    rate = lambda d: s.get(d, 0) / n[d]  # noqa: E731
    assert rate(big) < 1.0, "big domain must not saturate or the test is vacuous"
    assert rate(small) > rate(big)


def test_cluster_split_never_straddles_near_dup_clusters(spark, sf01):
    """Leakage invariant: every near-dup cluster's documents land in
    ONE split (the whole point vs row-hash assign_split), and the
    registered summary's totals reconcile with the corpus."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.sources.splits import (
        assign_split_by_cluster,
        cluster_split_counts,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    s = assign_split_by_cluster(docs)
    straddlers = (
        s.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    summary = {r["split"]: r for r in cluster_split_counts(docs).collect()}
    assert sum(r["n_docs"] for r in summary.values()) == docs.count()
    # the corpus has real near-dup clusters, else the guarantee is vacuous
    assert sum(r["n_clustered_docs"] for r in summary.values()) > 0


def test_domain_cap_bounds_every_domain_deterministically(spark, sf01):
    """Hard cap semantics: <= cap docs per domain, every nonempty
    domain keeps at least one doc (the priority is a per-domain rank,
    not a global cut), and the kept set is run-stable."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.sources.splits import domain_cap
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    kept = domain_cap(docs, cap=7)
    per = {r["domain"]: r["n"] for r in kept.groupBy("domain").agg(
        F.count("*").alias("n")).collect()}
    assert per and max(per.values()) <= 7
    domains = {r["source"] for r in docs.select("source").distinct().collect()}
    assert set(per) == domains
    a = sorted(map(tuple, kept.collect()))
    b = sorted(map(tuple, domain_cap(docs, cap=7).collect()))
    assert a == b


def test_incremental_lsh_matches_full_runs_cross_pairs(spark, sf01):
    """Consistency pin: delta-vs-corpus incremental dedup produces
    EXACTLY the full run's pairs that cross the delta/corpus boundary,
    with identical estimates — the incremental path loses nothing and
    invents nothing."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        dedup_incremental_lsh,
        minhash_lsh_pairs,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    caches: list = []
    try:
        inc = {
            (r["delta_id"], r["corpus_id"]): r["est_jaccard"]
            for r in dedup_incremental_lsh(
                docs.where(F.col("doc_id") % 7 == 0),
                docs.where(F.col("doc_id") % 7 != 0),
                caches=caches,
            ).collect()
        }
    finally:
        for c in caches:
            c.unpersist()
    full_cross = {}
    for r in minhash_lsh_pairs(docs, threshold=0.5).collect():
        a, b = r["id_a"], r["id_b"]
        for d, c in ((a, b), (b, a)):
            if d % 7 == 0 and c % 7 != 0:
                full_cross[(d, c)] = r["est_jaccard"]
    assert inc == full_cross
    assert inc, "testdata must yield cross pairs or the pin is vacuous"


def test_quality_perceptron_matches_independent_fold(spark, sf01):
    """Implementation pin (the ExactSubstr-fold pattern): the
    distributed batch-perceptron loop produces IDENTICAL integer
    weights to a plain python fold over the same feature rows, and the
    trained scorer's training accuracy is at least the majority-class
    baseline (the gopher seed labels are ~90% positive at sf0.01, so
    convergence to the majority predictor is the documented floor)."""
    from tabsketchfm_spark.operators import classifier as qc
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    w, feat = qc.train_quality_perceptron(docs)
    try:
        rows = [r.asDict() for r in feat.collect()]
        assert qc.train_quality_perceptron_py(rows) == w
        # score from the SAME trained (w, feat) — a second
        # quality_perceptron_scores call would re-train and persist a
        # second feature frame this test could not release
        dim = qc.N_BUCKETS + 1
        scores = [
            {
                "y": r["y"],
                "pred": sum(w[j] * r[f"x{j}"] for j in range(dim)) > 0,
            }
            for r in rows
        ]
    finally:
        feat.unpersist()
    n = len(scores)
    majority = max(
        sum(1 for r in scores if r["y"] == 1), sum(1 for r in scores if r["y"] == -1)
    ) / n
    acc = sum(1 for r in scores if r["pred"] == (r["y"] == 1)) / n
    assert acc >= majority


def test_streaming_dedup_runs_real_micro_batches(spark, sf01, tmp_path):
    """The streaming twin must actually stream: the range-partitioned
    feed with maxFilesPerTrigger=1 produces one sink partition per
    micro-batch, and the APPEND union across batches equals the batch
    incremental operator exactly."""
    import os

    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import dedup_incremental_lsh
    from tabsketchfm_spark.sources.tables import load_table
    from tabsketchfm_spark.streaming.profile_stream import (
        streaming_dedup_incremental,
    )

    sink = str(tmp_path / "sink")
    got = sorted(
        map(tuple, streaming_dedup_incremental(spark, sf01, sink_path=sink).collect())
    )
    parts = [d for d in os.listdir(sink) if d.startswith("batch_id=")]
    assert len(parts) >= 2, f"expected real micro-batches, got {parts}"
    docs = load_table(spark, sf01, "documents")
    want = sorted(
        map(
            tuple,
            dedup_incremental_lsh(
                docs.where(F.col("doc_id") % 7 == 0),
                docs.where(F.col("doc_id") % 7 != 0),
            ).collect(),
        )
    )
    assert got == want and got


def test_incremental_dedup_from_signature_store(spark, sf01, tmp_path):
    """Production seam: corpus signatures materialized once to parquet
    (build_signature_store), deltas deduped against the STORE — output
    bit-identical to the self-contained operator."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        build_signature_store,
        dedup_incremental_lsh,
        dedup_incremental_lsh_stored,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    delta = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    store = str(tmp_path / "sig_store")
    build_signature_store(corpus, store)
    caches: list = []
    try:
        stored = sorted(
            map(
                tuple,
                dedup_incremental_lsh_stored(
                    delta, spark, store, caches=caches
                ).collect(),
            )
        )
        direct = sorted(
            map(tuple, dedup_incremental_lsh(delta, corpus, caches=caches).collect())
        )
    finally:
        for c in caches:
            c.unpersist()
    assert stored == direct and stored


def test_ingest_dedup_commit_loop(spark, sf01, tmp_path):
    """The full incremental-ingest lifecycle: build store → ingest
    batch 1 (commit survivors) → ingest batch 2 → REPLAY batch 1.
    Every batch-1 doc accepted in the first pass must now be REJECTED
    at est_jaccard exactly 1.0 — it self-matches against its own
    committed signature — proving the commit actually lands in the
    store later deltas read."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        build_signature_store,
        ingest_dedup_commit,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    delta = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    store = str(tmp_path / "store")
    build_signature_store(corpus, store)

    mid = delta.approxQuantile("doc_id", [0.5], 0)[0]
    b1 = delta.where(F.col("doc_id") <= mid)
    b2 = delta.where(F.col("doc_id") > mid)

    v1 = {r["delta_id"]: r for r in ingest_dedup_commit(b1, spark, store).collect()}
    assert len(v1) == b1.count()  # one verdict per delta doc
    for r in v1.values():  # rejected rows carry their best match
        assert r["accepted"] == (r["matched_corpus_id"] is None)
        if not r["accepted"]:
            assert r["est_jaccard"] >= 0.5

    v2 = {r["delta_id"]: r for r in ingest_dedup_commit(b2, spark, store).collect()}
    assert len(v2) == b2.count()

    replay = {
        r["delta_id"]: r for r in ingest_dedup_commit(b1, spark, store).collect()
    }
    accepted1 = {i for i, r in v1.items() if r["accepted"]}
    assert accepted1, "batch 1 must have survivors or the replay is vacuous"
    for i in accepted1:
        assert not replay[i]["accepted"]
        assert replay[i]["est_jaccard"] == 1.0


def test_compact_signature_store_ttl(spark, sf01, tmp_path):
    """Store maintenance: after commits accumulate, compaction must
    (1) keep exactly the TTL-surviving ids, one signature row each,
    bit-equal to freshly built signatures; (2) flip to a generation
    dir and GC the legacy root files + commit dirs; (3) be repeatable
    (gen -> gen compaction GCs the retired generation)."""
    import os

    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        _lsh_sigs,
        build_signature_store,
        compact_signature_store,
        _read_signature_store,
        ingest_dedup_commit,
    )
    from tabsketchfm_spark.sources.tables import load_table
    from tabsketchfm_spark.sources.store_util import read_manifest

    docs = load_table(spark, sf01, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    store = str(tmp_path / "sig_store")
    build_signature_store(corpus, store)
    # grow the store: one committed batch (accepted docs append sigs)
    ingest_dedup_commit(docs.where(F.col("doc_id") % 7 == 0), spark, store)
    from tabsketchfm_spark.operators.dedup import _sig_data_root
    from tabsketchfm_spark.sources.store_util import read_manifest as _rm

    data_root = _sig_data_root(store, _rm(store))
    assert any(e.startswith("commit_") for e in os.listdir(data_root))

    build_gen = _rm(store)["data_dir"]
    compact_signature_store(spark, store, keep_pred="id >= 100")
    m = read_manifest(store)
    assert m["data_dir"].startswith("gen_")
    # DEFERRED GC: the superseded build generation is RETIRED, not
    # deleted — a concurrent reader's lazy frame pinned to it can
    # finish; only the new gen + the retired one remain
    assert m["retired_data_dir"] == build_gen
    left = {e for e in os.listdir(store) if not e.startswith("_")}
    assert left == {m["data_dir"], build_gen}, left

    caches: list = []
    try:
        got = _read_signature_store(spark, store, 3, 100, caches)
        got_rows = {r["id"]: tuple(r)[1:] for r in got.collect()}
        # superset recompute: ALL docs past the horizon (the store holds
        # corpus + accepted-delta ids only, so got ⊆ want below)
        committed = docs.where(F.col("doc_id") >= 100)
        want = _lsh_sigs(committed, "doc_id", "text", 3, 100, caches)
        want_rows = {r["id"]: tuple(r)[1:] for r in want.collect()}
    finally:
        for c in caches:
            c.unpersist()
    # every kept id has exactly one row with the recompute's signature;
    # ingest-rejected docs never entered the store, so got ⊆ want and
    # every id the store holds is >= the horizon with exact sigs
    assert got_rows
    assert all(i >= 100 for i in got_rows)
    for i, sig in got_rows.items():
        assert sig == want_rows[i], f"signature drift for id {i}"

    # repeat: the NEXT maintenance cycle sweeps the previously retired
    # generation (its readers are gone), retires the current one
    old_gen = m["data_dir"]
    compact_signature_store(spark, store, keep_pred="id >= 200")
    m2 = read_manifest(store)
    assert m2["data_dir"] != old_gen
    assert m2["retired_data_dir"] == old_gen
    assert not os.path.exists(os.path.join(store, build_gen)), (
        "first cycle's retired generation must be swept on the second"
    )
    assert os.path.exists(os.path.join(store, old_gen)), (
        "the just-retired generation must survive one cycle"
    )
    # a crashed-write orphan gen dir is collected by the next sweep
    os.makedirs(os.path.join(store, "gen_orphan_crash"))
    compact_signature_store(spark, store, keep_pred="id >= 200")
    assert not os.path.exists(os.path.join(store, "gen_orphan_crash"))
    assert not os.path.exists(os.path.join(store, old_gen))


def test_compact_signature_store_no_chimera_rows(spark, sf01, tmp_path):
    """An id re-ingested with CHANGED content leaves two different
    signature rows; compaction must keep one REAL row (lexicographic
    min over the whole struct), never a per-column blend belonging to
    neither content."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        _lsh_sigs,
        _read_signature_store,
        _sig_data_root,
        build_signature_store,
        compact_signature_store,
    )
    from tabsketchfm_spark.sources.store_util import read_manifest
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 20")
    store = str(tmp_path / "sig_store")
    build_signature_store(docs, store)
    # same ids, different content -> genuinely different signatures
    altered = docs.select(
        "doc_id", F.concat(F.lit("changed prefix "), F.col("text")).alias("text")
    )
    caches: list = []
    try:
        alt_sigs = _lsh_sigs(altered, "doc_id", "text", 3, 100, caches)
        root = _sig_data_root(store, read_manifest(store))
        alt_sigs.write.mode("overwrite").parquet(f"{root}/commit_altered")
        orig_rows = {
            r["id"]: tuple(r)[1:]
            for r in _lsh_sigs(docs, "doc_id", "text", 3, 100, caches).collect()
        }
        alt_rows = {r["id"]: tuple(r)[1:] for r in alt_sigs.collect()}
        compact_signature_store(spark, store)
        got = {
            r["id"]: tuple(r)[1:]
            for r in _read_signature_store(spark, store, 3, 100, caches).collect()
        }
    finally:
        for c in caches:
            c.unpersist()
    assert set(got) == set(orig_rows)
    for i, sig in got.items():
        assert sig in (orig_rows[i], alt_rows[i]), f"chimera signature for {i}"
        assert sig == min(orig_rows[i], alt_rows[i])  # deterministic pick


def test_signature_store_ttl_ts_lifecycle(spark, sf01, tmp_path):
    """Timestamp-TTL store layout: rows carry a caller-supplied
    LOGICAL ingest_ts; (1) the writer/store contract is symmetric and
    loud in all four mismatch directions; (2) compaction by age keeps
    exactly the fresh rows with signatures bit-equal to a recompute;
    (3) a re-ingested id keeps its LATEST row (last-seen-wins), not
    the lexicographic-min chimera-avoidance rule of legacy stores."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        _lsh_sigs,
        _read_signature_store,
        append_signatures,
        build_signature_store,
        compact_signature_store,
        ingest_dedup_commit,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 120")
    store = str(tmp_path / "sig_ts_store")
    build_signature_store(docs.where("doc_id < 40"), store, ingest_ts=0)

    # contract: ts store refuses ts-less writers; legacy refuses ts
    with _pytest.raises(IOError, match="ingest_ts"):
        append_signatures(docs.where("doc_id >= 40"), spark, store)
    with _pytest.raises(IOError, match="ingest_ts"):
        ingest_dedup_commit(docs.where("doc_id >= 40"), spark, store)
    legacy = str(tmp_path / "sig_legacy")
    build_signature_store(docs.where("doc_id < 40"), legacy)
    with _pytest.raises(IOError, match="legacy"):
        append_signatures(docs.where("doc_id >= 40"), spark, legacy, ingest_ts=1)
    with _pytest.raises(IOError, match="legacy"):
        ingest_dedup_commit(
            docs.where("doc_id >= 40"), spark, legacy, ingest_ts=1
        )

    # grow: bulk append at ts=1, a dedup commit at ts=2
    append_signatures(
        docs.where("doc_id >= 40 AND doc_id < 80"), spark, store, ingest_ts=1
    )
    ingest_dedup_commit(docs.where("doc_id >= 80"), spark, store, ingest_ts=2)

    # expire by AGE: everything from ts=0 goes, ts>=1 survives
    compact_signature_store(spark, store, keep_pred="ingest_ts >= 1")
    caches: list = []
    try:
        got = _read_signature_store(spark, store, 3, 100, caches)
        got_rows = {
            r["id"]: (r["ingest_ts"], tuple(r)[1:-1]) for r in got.collect()
        }
        want = _lsh_sigs(
            docs.where("doc_id >= 40"), "doc_id", "text", 3, 100, caches
        )
        want_rows = {r["id"]: tuple(r)[1:] for r in want.collect()}
    finally:
        for c in caches:
            c.unpersist()
    assert got_rows and all(i >= 40 for i in got_rows)
    # the bulk-appended ts=1 slice must survive COMPLETELY: every
    # shingle-eligible id in 40..79 (the recompute's own key set) is
    # present — a partial commit or wrong keep_pred that drops most of
    # the slice fails here, not just an empty-slice check. The >=80
    # ingest commit is verdict-dependent (subset), sig equality only.
    eligible_ts1 = {i for i in want_rows if 40 <= i < 80}
    assert eligible_ts1, "vacuous: no shingle-eligible docs in 40..79"
    missing = eligible_ts1 - set(got_rows)
    assert not missing, f"ts=1 rows lost by compaction: {sorted(missing)}"
    for i, (ts, sig) in got_rows.items():
        assert ts == (1 if i < 80 else 2)
        assert sig == want_rows[i], f"signature drift for id {i}"

    # last-seen-wins: re-append id<60 with CHANGED content at ts=5
    altered = docs.where("doc_id >= 40 AND doc_id < 60").select(
        "doc_id", F.concat(F.lit("changed "), F.col("text")).alias("text")
    )
    append_signatures(altered, spark, store, ingest_ts=5)
    compact_signature_store(spark, store, keep_pred="ingest_ts >= 1")
    caches2: list = []
    try:
        got2 = {
            r["id"]: (r["ingest_ts"], tuple(r)[1:-1])
            for r in _read_signature_store(spark, store, 3, 100, caches2).collect()
        }
        alt_rows = {
            r["id"]: tuple(r)[1:]
            for r in _lsh_sigs(altered, "doc_id", "text", 3, 100, caches2).collect()
        }
    finally:
        for c in caches2:
            c.unpersist()
    for i in range(40, 60):
        if i in got2:
            ts, sig = got2[i]
            assert ts == 5, f"id {i}: last-seen row must win, got ts={ts}"
            assert sig == alt_rows[i]


def test_append_signatures_retry_is_idempotent(spark, sf01, tmp_path):
    """The store family's retried-batch rule on the signature store:
    re-running an append with identical inputs commits ZERO new rows
    (full-row anti join), while a genuine refresh — same ids at a
    fresher ingest_ts — still lands and is resolved by compaction's
    last-seen-wins."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        _read_signature_store,
        append_signatures,
        build_signature_store,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 60")

    def _count(store):
        caches: list = []
        try:
            return _read_signature_store(spark, store, 3, 100, caches).count()
        finally:
            for c in caches:
                c.unpersist()

    # ts layout
    store = str(tmp_path / "sig_ts")
    build_signature_store(docs.where("doc_id < 40"), store, ingest_ts=0)
    base = _count(store)
    delta = docs.where("doc_id >= 40")
    append_signatures(delta, spark, store, ingest_ts=1)
    n1 = _count(store)
    assert n1 > base
    append_signatures(delta, spark, store, ingest_ts=1)  # retry
    assert _count(store) == n1, "byte-identical retry must commit nothing"
    append_signatures(delta, spark, store, ingest_ts=2)  # refresh
    assert _count(store) == n1 + (n1 - base), "fresh-ts refresh must land"

    # legacy layout
    legacy = str(tmp_path / "sig_legacy")
    build_signature_store(docs.where("doc_id < 40"), legacy)
    append_signatures(delta, spark, legacy)
    n1 = _count(legacy)
    append_signatures(delta, spark, legacy)  # retry
    assert _count(legacy) == n1


def test_cluster_store_lifecycle(spark, sf01, tmp_path):
    """Persisted clustering state: init → two updates (each re-reads
    from disk), deferred one-cycle state GC, lease respected, final
    labels equal the one-shot incremental composition."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import dedup
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    old = docs.where(F.col("doc_id") % 4 != 0)
    labels_old = dedup.dedup_clusters(old, df_cap=None).select(
        "doc_id", "cluster_id"
    )
    pairs_all = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", 3, 0.8, df_cap=None
    )
    a, b = F.col("id_a"), F.col("id_b")
    p1 = pairs_all.where(
        ((a % 8 == 0) | (b % 8 == 0))
        & ((a % 4 != 0) | (a % 8 == 0))
        & ((b % 4 != 0) | (b % 8 == 0))
    )
    p2 = pairs_all.where((a % 8 == 4) | (b % 8 == 4))

    store = str(tmp_path / "cluster_store")
    dedup.cluster_store_init(spark, labels_old, store)
    state0 = su.read_manifest(store)["state_dir"]

    # lease respected
    su.acquire_lease(store, owner="other-writer")
    with _pytest.raises(IOError, match="other-writer"):
        dedup.cluster_store_update(
            spark, p1, docs.where(F.col("doc_id") % 8 == 0), store
        )
    su.release_lease(store)

    dedup.cluster_store_update(
        spark, p1, docs.where(F.col("doc_id") % 8 == 0), store
    )
    m1 = su.read_manifest(store)
    assert m1["n_updates"] == 1 and m1["retired_state_dir"] == state0
    assert os.path.exists(os.path.join(store, state0)), (
        "superseded state must survive one cycle for in-flight readers"
    )
    out = dedup.cluster_store_update(
        spark, p2, docs.where(F.col("doc_id") % 8 == 4), store
    )
    m2 = su.read_manifest(store)
    assert m2["n_updates"] == 2
    assert not os.path.exists(os.path.join(store, state0)), (
        "first cycle's retired state must be swept on the second"
    )
    # final state == stored state == full clustering of the corpus
    got_store = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_store_read(spark, store).collect()
    }
    got_out = {(r["doc_id"], r["cluster_id"]) for r in out.collect()}
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.dedup_clusters(docs, df_cap=None).collect()
    }
    assert got_store == got_out == want

    # arrival-discipline contract: a pair naming a never-arrived doc
    # is rejected loudly in the SAME call
    ghost_pair = spark.createDataFrame(
        [(1, 10**9)], "id_a bigint, id_b bigint"
    )
    with _pytest.raises(ValueError, match="arrived"):
        dedup.cluster_store_update(
            spark, ghost_pair, docs.where(F.lit(False)), store
        )

    # RETENTION: expire half the docs; the compacted store must (a)
    # keep exactly the survivors, (b) re-minimize labels so the
    # closure invariant holds — proven by running ANOTHER update
    # afterwards (its precondition validation would reject a broken
    # store) — and (c) keep survivors merged even when their only
    # connection was an expired doc (historical closure, not a
    # recompute on survivors)
    out_c = dedup.cluster_store_compact(spark, store, "doc_id < 48")
    surv = {(r["doc_id"], r["cluster_id"]) for r in out_c.collect()}
    assert all(d < 48 for d, _ in surv)
    # same partition as the pre-compaction clustering, restricted to
    # survivors, with labels re-minimized to surviving members
    from collections import defaultdict

    pre = defaultdict(set)
    for d, c in want:
        if d < 48:
            pre[c].add(d)
    expected = {
        (d, min(members)) for members in pre.values() for d in members
    }
    assert surv == expected
    # closure invariant: the next update must accept the compacted
    # state (it validates uniqueness, label closure, min-ness loudly)
    p3 = pairs_all.where((a < 48) & (b < 48))
    dedup.cluster_store_update(
        spark, p3, docs.where(F.col("doc_id") < 48), store
    )

    # re-init over the existing store: fresh unique state dir (never an
    # in-place overwrite of the live one), the superseded live state
    # survives one cycle (deferred GC), and every OLDER state_* dir is
    # swept — a fresh manifest would otherwise strand them forever
    live_before = su.read_manifest(store)["state_dir"]
    # plant a stranded generation (a crashed writer's leftover): the
    # re-init sweep must collect it
    os.makedirs(os.path.join(store, "state_000099"))
    dedup.cluster_store_init(spark, labels_old, store)
    m3 = su.read_manifest(store)
    assert m3["state_dir"] != live_before
    assert m3["retired_state_dir"] == live_before
    left = {e for e in os.listdir(store) if e.startswith("state_")}
    assert left == {m3["state_dir"], live_before}
    got_reinit = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_store_read(spark, store).collect()
    }
    assert got_reinit == {
        (r["doc_id"], r["cluster_id"]) for r in labels_old.collect()
    }


def test_safe_subdir_blocks_store_escapes(tmp_path):
    """The destructive-path guard every manifest-recorded dir passes
    through before rmtree: only bare child names with the expected
    prefix resolve; traversal/absolute/nested/non-string values — the
    corrupt-manifest escape class — return None."""
    import os

    from tabsketchfm_spark.sources.store_util import safe_subdir

    p = str(tmp_path)
    assert safe_subdir(p, "gen_abc", "gen_") == os.path.join(p, "gen_abc")
    assert safe_subdir(p, "state_000001", "state_") == os.path.join(
        p, "state_000001"
    )
    for bad in (
        "..",
        ".",
        "/gen_abs",
        "gen_x/..",
        "gen_x/nested",
        "../gen_x",
        "wrongprefix",
        "",
        None,
        7,
    ):
        assert safe_subdir(p, bad, "gen_") is None, bad


def test_sig_store_sweep_survives_corrupt_manifest(spark, sf01, tmp_path):
    """A hand-corrupted retired pointer ('..') must be ignored by the
    maintenance sweep: the store's PARENT tree and the live generation
    survive, and the compaction still completes."""
    import json
    import os

    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        build_signature_store,
        compact_signature_store,
    )
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 30")
    sibling = tmp_path / "sibling_data"
    sibling.mkdir()
    (sibling / "keep.txt").write_text("must survive")
    store = str(tmp_path / "sig_store")
    build_signature_store(docs, store)
    m = su.read_manifest(store)
    su.write_manifest(store, {**m, "retired_data_dir": ".."})
    compact_signature_store(spark, store, keep_pred="id >= 0")
    assert (sibling / "keep.txt").exists(), "sweep escaped the store"
    m2 = su.read_manifest(store)
    assert os.path.isdir(os.path.join(store, m2["data_dir"]))


def test_sig_sweep_refuses_corrupt_live_pointer(spark, sf01, tmp_path):
    """A corrupt LIVE pointer (nested 'gen_x/sub') never string-equals
    a listdir entry, so the orphan loop would classify the ACTUAL live
    generation as an orphan and delete it — the sweep must refuse
    instead (ADVICE r9)."""
    import os

    from tabsketchfm_spark.operators.dedup import (
        _sweep_retired_sig_data,
        build_signature_store,
    )
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 20")
    store = str(tmp_path / "sig_store")
    build_signature_store(docs, store)
    m = su.read_manifest(store)
    live = m["data_dir"]
    _sweep_retired_sig_data(store, {**m, "data_dir": f"{live}/nested"})
    assert os.path.isdir(os.path.join(store, live)), (
        "corrupt live pointer must not let the sweep delete the live gen"
    )


def test_crawl_retention_detects_and_heals_orphan_sigs(spark, sf01, tmp_path):
    """The cross-store audit must CATCH a horizon mismatch (labels
    swept, signatures not → expired docs keep matching as orphan
    signatures) and a same-horizon retention_sweep must heal it."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import dedup
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 60")
    sig = str(tmp_path / "sig")
    cl = str(tmp_path / "cl")
    dedup.build_signature_store(docs, sig)
    dedup.cluster_store_init(
        spark,
        docs.select("doc_id", F.col("doc_id").alias("cluster_id")),
        cl,
    )
    ok = dedup.crawl_store_consistency(spark, sig, cl).first()
    assert ok["n_orphan_sigs"] == 0 and ok["n_labels"] == 60

    # horizon mismatch: sweep ONLY the labels
    dedup.cluster_store_compact(spark, cl, "doc_id < 40")
    bad = dedup.crawl_store_consistency(spark, sig, cl).first()
    assert bad["n_orphan_sigs"] == 20, bad

    # same-horizon sweep heals the pair
    dedup.retention_sweep(spark, sig, cl, "id < 40", "doc_id < 40")
    healed = dedup.crawl_store_consistency(spark, sig, cl).first()
    assert healed["n_orphan_sigs"] == 0
    assert healed["n_labels"] == healed["n_sigs"] == 40


def test_cluster_store_update_redelivery_is_noop(spark, tmp_path):
    """Re-folding the SAME batch (pairs + nodes) must leave the stored
    labels identical — the property that makes foreachBatch redelivery
    safe for the streamed crawl loop: labels already reflect the
    batch's pairs, endpoints contract to themselves, the closure is
    unchanged. (The signature side is guarded separately by the
    full-row anti-join.)"""
    from tabsketchfm_spark.operators import dedup

    labels0 = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id bigint, cluster_id bigint"
    )
    store = str(tmp_path / "cstore")
    dedup.cluster_store_init(spark, labels0, store)
    pairs = spark.createDataFrame(
        [(2, 4), (3, 5)], "id_a bigint, id_b bigint"
    )
    nodes = spark.createDataFrame([(4,), (5,)], "doc_id bigint")
    dedup.cluster_store_update(spark, pairs, nodes, store)
    first = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_store_read(spark, store).collect()
    }
    assert first == {(1, 1), (2, 1), (4, 1), (3, 3), (5, 3)}
    dedup.cluster_store_update(spark, pairs, nodes, store)  # redelivery
    second = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.cluster_store_read(spark, store).collect()
    }
    assert second == first


def test_cluster_init_refuses_sweep_on_corrupt_live_pointer(spark, tmp_path):
    """Re-init over a store whose manifest live pointer is corrupt
    (nested value) must not orphan-sweep — the corrupt value never
    string-equals a listdir entry, so the sweep would delete the
    genuinely live generation (round-10 review)."""
    import os

    from tabsketchfm_spark.operators import dedup
    from tabsketchfm_spark.sources import store_util as su

    labels = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id bigint, cluster_id bigint"
    )
    store = str(tmp_path / "cstore")
    dedup.cluster_store_init(spark, labels, store)
    m = su.read_manifest(store)
    live = m["state_dir"]
    su.write_manifest(store, {**m, "state_dir": f"{live}/nested"})
    dedup.cluster_store_init(spark, labels, store)
    assert os.path.isdir(os.path.join(store, live)), (
        "corrupt live pointer must not let re-init sweep the live state"
    )
    # and the unusable value must not be recorded as retired
    m2 = su.read_manifest(store)
    assert m2.get("retired_state_dir") is None


def test_ingest_ts_contract_rejects_wrong_store_type(spark, sf01, tmp_path):
    """append_signatures pointed at a NON-signature store (e.g. a
    cluster store manifest with no 'schema' key) must raise the loud
    wrong-store-type IOError, not a raw KeyError (ADVICE r9)."""
    import pytest as _pytest

    from tabsketchfm_spark.operators.dedup import append_signatures
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 5")
    store = str(tmp_path / "not_a_sig_store")
    su.write_manifest(
        store,
        {"format": "tsfm-cluster-store-v1", "n_updates": 0,
         "state_dir": "state_000000"},
    )
    with _pytest.raises(IOError, match="not a signature store"):
        append_signatures(docs, spark, store, ingest_ts=1)


def test_cluster_store_init_rejects_wrong_store_type(spark, tmp_path):
    """cluster_store_init pointed at a LIVE store of another family
    (signature / IVF-PQ) must refuse loudly instead of replacing that
    store's manifest and stranding its data (ADVICE r10). A corrupt
    (unparseable) manifest stays resettable — that is the documented
    recovery path."""
    import pytest as _pytest

    from tabsketchfm_spark.operators import dedup
    from tabsketchfm_spark.sources import store_util as su

    labels = spark.createDataFrame(
        [(1, 1)], "doc_id bigint, cluster_id bigint"
    )
    store = str(tmp_path / "sig_store_path")
    su.write_manifest(
        store, {"format": dedup._SIG_STORE_FORMAT, "schema": []}
    )
    with _pytest.raises(IOError, match="not a cluster store"):
        dedup.cluster_store_init(spark, labels, store)
    # the foreign manifest must be untouched
    assert su.read_manifest(store)["format"] == dedup._SIG_STORE_FORMAT
    # unparseable manifest → reset allowed
    store2 = str(tmp_path / "corrupt")
    import os

    os.makedirs(store2, exist_ok=True)
    with open(os.path.join(store2, "_manifest.json"), "w") as f:
        f.write("{not json")
    dedup.cluster_store_init(spark, labels, store2)
    assert su.read_manifest(store2)["format"] == dedup._CLUSTER_STORE_FORMAT


def test_incremental_cc_rejects_null_delta_node(spark):
    """A NULL id in delta_nodes would ride coalesce into a NULL label
    and silently vanish at the compose join — must raise (ADVICE r9)."""
    import pytest as _pytest

    from tabsketchfm_spark.operators.dedup import dedup_clusters_incremental

    labels_old = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id bigint, cluster_id bigint"
    )
    pairs = spark.createDataFrame([(1, 3)], "id_a bigint, id_b bigint")
    delta = spark.createDataFrame(
        [(3,), (None,)], "doc_id bigint"
    )
    with _pytest.raises(ValueError, match="NULL id"):
        dedup_clusters_incremental(labels_old, pairs, delta)


def test_bounded_gates_catch_out_of_slice_defects(spark):
    """The r9-verdict item-4 contract: registered store gates collect
    a SAMPLED slice + global checksums instead of O(corpus) rows — so
    a defect in a row OUTSIDE the slice must still change the gate
    output (via the checksums)."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import bounded_labels_gate
    from tabsketchfm_spark.operators.kmeans import bounded_assign_gate

    labels = spark.createDataFrame(
        [(i, i % 3, 4) for i in range(12)],
        "doc_id bigint, cluster_id bigint, cluster_size bigint",
    )
    base = {tuple(r) for r in bounded_labels_gate(labels, mod=13).collect()}
    # corrupt doc_id=7 (7 % 13 != 0 — outside the slice)
    bad = labels.withColumn(
        "cluster_id",
        F.when(F.col("doc_id") == 7, F.lit(99)).otherwise(F.col("cluster_id")),
    )
    got = {tuple(r) for r in bounded_labels_gate(bad, mod=13).collect()}
    assert base != got, "out-of-slice label defect escaped the checksums"
    # the slice itself stays row-exact and small
    assert all(r[0] % 13 == 0 for r in base)
    # SWAP blind spot (round-10 review): exchanging values between two
    # out-of-slice rows conserves every PLAIN sum — the id-weighted
    # checksum is what catches it
    swapped = labels.withColumn(
        "cluster_id",
        F.when(F.col("doc_id") == 7, F.lit(8 % 3))
        .when(F.col("doc_id") == 8, F.lit(7 % 3))
        .otherwise(F.col("cluster_id")),
    )
    got_s = {tuple(r) for r in bounded_labels_gate(swapped, mod=13).collect()}
    assert base != got_s, "pairwise swap escaped the weighted checksums"

    asg = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "vec_id bigint, cluster int"
    )
    base_a = {tuple(r) for r in bounded_assign_gate(asg, mod=17).collect()}
    bad_a = asg.withColumn(
        "cluster",
        F.when(F.col("vec_id") == 5, F.lit(3)).otherwise(F.col("cluster")),
    )
    got_a = {tuple(r) for r in bounded_assign_gate(bad_a, mod=17).collect()}
    assert base_a != got_a, "out-of-slice assign defect escaped the checksums"


def test_store_writer_lease_semantics(tmp_path):
    """The store family's multi-writer guard: exclusive create, loud
    conflict naming the holder, release on exit (incl. exceptions),
    and crashed-writer recovery only via explicit force_break."""
    import os

    import pytest as _pytest

    from tabsketchfm_spark.sources import store_util as su

    store = str(tmp_path / "anystore")
    with su.writer_lease(store, owner="writer-a"):
        assert os.path.exists(su.lease_path(store))
        with _pytest.raises(IOError, match="writer-a"):
            su.acquire_lease(store, owner="writer-b")
    assert not os.path.exists(su.lease_path(store))  # released

    # exception inside the context still releases
    with _pytest.raises(RuntimeError):
        with su.writer_lease(store):
            raise RuntimeError("writer crashed cleanly")
    assert not os.path.exists(su.lease_path(store))

    # crashed writer (process death): lease file left behind blocks
    # every writer until the operator breaks it explicitly
    su.acquire_lease(store, owner="dead-writer")
    with _pytest.raises(IOError, match="dead-writer"):
        su.acquire_lease(store, owner="writer-c")
    assert su.force_break_lease(store) is True
    assert su.force_break_lease(store) is False  # idempotent
    su.acquire_lease(store, owner="writer-c")  # now free
    su.release_lease(store)

    # a corrupt/unreadable lease file still blocks, loudly
    with open(su.lease_path(store), "w", encoding="utf-8") as f:
        f.write("not json")
    with _pytest.raises(IOError, match="unknown"):
        su.acquire_lease(store)
    su.force_break_lease(store)


def test_store_ops_respect_writer_lease(spark, sf01, tmp_path):
    """Every RMW maintenance op takes the lease: a concurrent holder
    makes them fail loudly instead of silently dropping a delta or
    orphan-sweeping a half-written commit."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.operators.dedup import (
        append_signatures,
        build_signature_store,
        compact_signature_store,
        ingest_dedup_commit,
    )
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 40")
    sig_store = str(tmp_path / "sig")
    build_signature_store(docs.where("doc_id < 20"), sig_store)
    su.acquire_lease(sig_store, owner="other-writer")
    for op in (
        lambda: ingest_dedup_commit(docs.where("doc_id >= 20"), spark, sig_store),
        lambda: append_signatures(docs.where("doc_id >= 20"), spark, sig_store),
        lambda: compact_signature_store(spark, sig_store),
    ):
        with _pytest.raises(IOError, match="other-writer"):
            op()
    su.release_lease(sig_store)
    # released: the same ops run clean (and release their own lease)
    ingest_dedup_commit(docs.where("doc_id >= 20"), spark, sig_store)
    compact_signature_store(spark, sig_store)
    assert not _os_exists(su.lease_path(sig_store))

    emb = load_table(spark, sf01, "embeddings").where("vec_id < 100")
    idx = str(tmp_path / "ivfpq")
    pq_op.save_ivfpq_index_cached(spark, emb, idx)
    su.acquire_lease(idx, owner="other-writer")
    with _pytest.raises(IOError, match="other-writer"):
        pq_op.ivfpq_store_append(spark, idx, emb)
    with _pytest.raises(IOError, match="other-writer"):
        pq_op.ivfpq_store_compact(spark, idx)
    su.release_lease(idx)
    pq_op.ivfpq_store_compact(spark, idx)
    assert not _os_exists(su.lease_path(idx))

    # maintenance ops on a mistyped path refuse BEFORE any mkdir —
    # no stray directory tree, no lease file left behind
    ghost = str(tmp_path / "no" / "such" / "store")
    with _pytest.raises(IOError, match="no store manifest"):
        compact_signature_store(spark, ghost)
    with _pytest.raises(IOError, match="no store manifest"):
        pq_op.ivfpq_store_append(spark, ghost, emb)
    assert not _os_exists(ghost)


def _os_exists(p):
    import os

    return os.path.exists(p)


def test_ivfpq_store_append_lifecycle(spark, sf01, tmp_path):
    """Append absorbs a delta without retraining: corpus codes are
    byte-identical before and after, appended codes equal an encode
    with the loaded (frozen) quantizers, repeat appends accumulate,
    and rebuilding into the same path GCs superseded generations."""
    import os

    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    store = str(tmp_path / "ivfpq_store")
    pq_op.save_ivfpq_index_cached(spark, emb.where(F.col("vec_id") < 400), store)
    mc, cb, codes0 = pq_op.load_ivfpq_index(spark, store)
    base = {r["cand_id"]: tuple(r) for r in codes0.collect()}

    d1 = emb.where((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    pq_op.ivfpq_store_append(spark, store, d1)
    _mc1, _cb1, codes1 = pq_op.load_ivfpq_index(spark, store)
    after1 = {r["cand_id"]: tuple(r) for r in codes1.collect()}
    assert {i: v for i, v in after1.items() if i < 400} == base
    want_d1 = {
        r["cand_id"]: tuple(r)
        for r in pq_op._ivfpq_cands(d1, mc, cb, "vec_id", "embedding").collect()
    }
    assert {i: v for i, v in after1.items() if i >= 400} == want_d1

    d2 = emb.where(F.col("vec_id") >= 450)
    pq_op.ivfpq_store_append(spark, store, d2)
    _mc2, _cb2, codes2 = pq_op.load_ivfpq_index(spark, store)
    assert codes2.count() == emb.count()

    # retried-batch guard: re-appending an already-absorbed delta must
    # not double-encode any id (duplicate cand_id rows would score
    # twice in the serving union and double-count in drift)
    pq_op.ivfpq_store_append(spark, store, d1)
    _mc2b, _cb2b, codes2b = pq_op.load_ivfpq_index(spark, store)
    assert codes2b.count() == emb.count()
    assert codes2b.select("cand_id").distinct().count() == emb.count()

    # compaction: the code-dir list collapses to one with the code SET
    # byte-identical; retired dirs are kept ONE cycle (a serve that
    # resolved the old list mid-flip may still be scanning them) and
    # swept by the next maintenance call
    from tabsketchfm_spark.sources.store_util import read_manifest

    before = {tuple(r) for r in codes2b.collect()}
    m_pre = read_manifest(store)
    pq_op.ivfpq_store_compact(spark, store)
    m_after = read_manifest(store)
    assert len(m_after["code_dirs"]) == 1
    # the LIVE dir must never be in the retired list (the next sweep
    # deletes retired dirs — this would destroy all codes), and the
    # retired set is exactly the pre-compact code dirs
    assert m_after["code_dirs"][0] not in m_after["retired_code_dirs"]
    assert sorted(m_after["retired_code_dirs"]) == sorted(m_pre["code_dirs"])
    gen_dir = os.path.join(store, m_after["data_dir"])
    for d in m_after["retired_code_dirs"]:  # deferred, not deleted yet
        assert os.path.isdir(os.path.join(gen_dir, d))
    _mc2c, _cb2c, codes2c = pq_op.load_ivfpq_index(spark, store)
    assert {tuple(r) for r in codes2c.collect()} == before

    # next maintenance call sweeps the retired dirs (and any orphan)
    pq_op.ivfpq_store_compact(spark, store)
    m_swept = read_manifest(store)
    assert m_swept["code_dirs"] == m_after["code_dirs"]
    assert m_swept["retired_code_dirs"] == []
    code_like = [e for e in os.listdir(gen_dir) if e.startswith("codes")]
    assert code_like == m_after["code_dirs"]
    assert {
        tuple(r) for r in pq_op.load_ivfpq_index(spark, store)[2].collect()
    } == before

    # DELETION (erasure half): remove ids >= 450 without retraining —
    # survivors byte-identical, deleted ids physically absent from the
    # live code set, serving no longer returns them, the op is
    # idempotent, and the superseded dirs follow the deferred one-cycle
    # GC rule
    pq_op.ivfpq_store_delete(spark, store, "cand_id >= 450")
    m_del = read_manifest(store)
    assert len(m_del["code_dirs"]) == 1
    assert m_del["code_dirs"][0] not in m_del["retired_code_dirs"]
    after_del = {
        r["cand_id"]: tuple(r)
        for r in pq_op.load_ivfpq_index(spark, store)[2].collect()
    }
    # `before` holds the full pre-delete code set; cand_id leads each row
    assert after_del == {t[0]: t for t in before if t[0] < 450}
    for d in m_del["retired_code_dirs"]:  # deferred, not deleted yet
        assert os.path.isdir(os.path.join(gen_dir, d))
    served = pq_op.ivfpq_stored_topk(spark, store, emb, 20, k=5).collect()
    assert served and all(r["cand_id"] < 450 for r in served)
    pq_op.ivfpq_store_delete(spark, store, "cand_id >= 450")  # idempotent
    assert {
        r["cand_id"]: tuple(r)
        for r in pq_op.load_ivfpq_index(spark, store)[2].collect()
    } == after_del
    # the second delete swept the first's retired dirs
    live_del = read_manifest(store)["code_dirs"]
    code_like = [e for e in os.listdir(gen_dir) if e.startswith("codes")]
    assert sorted(code_like) == sorted(
        set(live_del) | set(read_manifest(store)["retired_code_dirs"])
    )

    # rebuild into the same path: superseded generations are GC'd
    # (previous kept for crash recovery), and the append dirs of the
    # retired generation go with it. A 50-vector corpus exercises the
    # identical generation lifecycle at a fraction of the fit cost
    # (ids 0..7 still dense for the deterministic init).
    pq_op.save_ivfpq_index_cached(spark, emb.where(F.col("vec_id") < 50), store)
    pq_op.save_ivfpq_index_cached(spark, emb.where(F.col("vec_id") < 50), store)
    gens = [e for e in os.listdir(store) if e.startswith("gen_")]
    assert len(gens) <= 2, gens
    _mc3, _cb3, codes3 = pq_op.load_ivfpq_index(spark, store)
    assert codes3.count() == 50  # fresh build, appends retired


def test_ivfpq_store_reencode_lifecycle(spark, sf01, tmp_path):
    """Re-encode retargets the index after drift: warm-started
    centroids land in the fresh generation, codebooks stay FROZEN,
    and the stored code set equals the full encode under the new
    geometry (the composition theorem — codes depend only on (vector,
    its centroid, codebooks), so the verbatim-copy path cannot drift
    from the re-encode path). extra_iters=0 is the pure resync:
    equivalent to APPEND for a grown corpus — which drives the copy
    path for every stored vector with an independently-implemented
    expected value — and to DELETE for a shrunk one."""
    import os

    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.store_util import read_manifest
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    core = emb.where(F.col("vec_id") < 400)

    a = str(tmp_path / "via_append")
    b = str(tmp_path / "via_reencode")
    pq_op.save_ivfpq_index_cached(spark, core, a)
    pq_op.ivfpq_store_append(spark, a, emb.where(F.col("vec_id") >= 400))
    pq_op.save_ivfpq_index_cached(spark, core, b)
    mc_old, cb_old, _codes0 = pq_op.load_ivfpq_index(spark, b)
    pq_op.ivfpq_store_reencode(spark, b, emb, extra_iters=0)
    mc_b, cb_b, codes_b = pq_op.load_ivfpq_index(spark, b)
    assert mc_b == mc_old and cb_b == cb_old  # 0 rounds: geometry frozen
    set_a = {tuple(r) for r in pq_op.load_ivfpq_index(spark, a)[2].collect()}
    assert {tuple(r) for r in codes_b.collect()} == set_a

    # warm re-encode: centroids advance by exactly the warm Lloyd
    # rounds, codebooks frozen, stored set == full encode under the
    # new geometry. Expected centroids derived INDEPENDENTLY of
    # warm_start_centroids/_lloyd_centroids (round-11 ADVICE: pinning
    # via warm_start_centroids exercised the same init= code path as
    # the verb under test): the round algebra — cell_aggregate
    # assignment + floor-div half-up update, empty cell keeps its
    # centroid — spelled out inline, seeded from the stored centroids.
    from tabsketchfm_spark.operators.kmeans import (
        _quantized,
        cell_aggregate,
    )

    qf = _quantized(emb).persist()
    try:
        want_mc = {cid: list(v) for cid, v in mc_old.items()}
        for _ in range(2):
            nxt = dict(want_mc)
            for cid, (s, c) in cell_aggregate(
                qf, want_mc, pq_op.S_SUB * pq_op.D_SUB
            ).items():
                nxt[cid] = [(2 * sj + c) // (2 * c) for sj in s]
            want_mc = nxt
    finally:
        qf.unpersist()
    pq_op.ivfpq_store_reencode(spark, b, emb, extra_iters=2)
    mc2, cb2, codes2 = pq_op.load_ivfpq_index(spark, b)
    assert mc2 == want_mc
    assert cb2 == cb_old
    want = {
        tuple(r)
        for r in pq_op._ivfpq_cands(emb, mc2, cb2, "vec_id", "embedding").collect()
    }
    assert {tuple(r) for r in codes2.collect()} == want

    # resync to a SHRUNK corpus drops the absent ids (delete composed
    # in); survivors copy bit-for-bit (geometry unchanged)
    kept = emb.where(F.col("vec_id") % 3 != 0)
    pq_op.ivfpq_store_reencode(spark, b, kept, extra_iters=0)
    got3 = {
        tuple(r) for r in pq_op.load_ivfpq_index(spark, b)[2].collect()
    }
    assert got3 == {t for t in want if t[0] % 3 != 0}

    # generation lifecycle: fresh gen per re-encode, previous kept one
    # cycle for concurrent readers, older GC'd
    gens = [e for e in os.listdir(b) if e.startswith("gen_")]
    assert len(gens) <= 2
    assert read_manifest(b)["data_dir"] in gens


def test_ivfpq_autorefresh_branches(spark, sf01, tmp_path):
    """The closed maintenance loop takes the branch the exact-integer
    drift decision dictates: above threshold → warm retarget (stored
    centroids advance by exactly the warm Lloyd rounds), below →
    frozen append-only (geometry untouched), empty delta → never
    fires (the 0 >= 0 spurious-trigger guard)."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    core = emb.where(F.col("vec_id") < 400)
    delta = emb.where(F.col("vec_id") >= 400)

    hot = str(tmp_path / "hot")
    pq_op.save_ivfpq_index_cached(spark, core, hot)
    mc0 = pq_op.load_ivfpq_index(spark, hot)[0]
    assert pq_op.ivfpq_store_autorefresh(
        spark, hot, delta, emb, 100_000, extra_iters=2
    )
    assert pq_op.load_ivfpq_index(spark, hot)[0] == pq_op.warm_start_centroids(
        emb, mc0, 2
    )

    cold = str(tmp_path / "cold")
    pq_op.save_ivfpq_index_cached(spark, core, cold)
    assert not pq_op.ivfpq_store_autorefresh(
        spark, cold, delta, emb, 400_000, extra_iters=2
    )
    mc_cold, _cb, codes_cold = pq_op.load_ivfpq_index(spark, cold)
    assert mc_cold == mc0  # frozen: append-only
    # indexed population = rows surviving the degenerate-vector filter,
    # not the raw table (round-11 review: a gen_sf variant with one
    # NULL vector would otherwise false-alarm here)
    from tabsketchfm_spark.operators.kmeans import valid_rows

    assert codes_cold.count() == valid_rows(emb).count()

    # empty delta: even threshold 0 must not fire (0 >= 0 guard), and
    # no empty code dir may be appended (round-11 review, second pass)
    from tabsketchfm_spark.sources.store_util import read_manifest

    dirs_before = read_manifest(cold)["code_dirs"]
    assert not pq_op.ivfpq_store_autorefresh(
        spark, cold, delta.where(F.lit(False)), emb, 0, extra_iters=1
    )
    assert pq_op.load_ivfpq_index(spark, cold)[0] == mc0
    assert read_manifest(cold)["code_dirs"] == dirs_before

    # retry idempotence: redelivering the already-absorbed delta
    # measures D = 0 on the guarded slice — no trigger even at
    # threshold 0, no append, decision can never flip on a redelivery
    assert not pq_op.ivfpq_store_autorefresh(
        spark, cold, delta, emb, 0, extra_iters=1
    )
    assert read_manifest(cold)["code_dirs"] == dirs_before

    # destructive-resync floor guard: an empty corpus must refuse
    # loudly instead of silently erasing every stored code
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty corpus"):
        pq_op.ivfpq_store_reencode(
            spark, cold, emb.where(F.lit(False)), extra_iters=0
        )

    # the composite is ONE lease-guarded RMW (round-11 review): a
    # per-step lease would open a window where a concurrent writer's
    # commit lands between the append and the re-encode and is then
    # silently erased by the resync. Pin: exactly one acquisition per
    # composite call — on a FRESH store with an un-absorbed delta
    # above threshold, so the FIRING branch (append + warm re-encode)
    # actually executes under the held lease (a redelivered-delta call
    # measures D = 0 and would never reach the re-encode leg —
    # round-11 review, final pass).
    from tabsketchfm_spark.sources import store_util as su

    fresh_store = str(tmp_path / "lease_pin")
    pq_op.save_ivfpq_index_cached(spark, core, fresh_store)
    owners = []
    orig_acquire = su.acquire_lease
    su.acquire_lease = lambda path, owner="writer", require_store=False: (
        owners.append(owner),
        orig_acquire(path, owner, require_store=require_store),
    )[1]
    try:
        fired = pq_op.ivfpq_store_autorefresh(
            spark, fresh_store, delta, emb, 100_000, extra_iters=1
        )
    finally:
        su.acquire_lease = orig_acquire
    assert fired  # the pin must cover the re-encode leg
    assert owners == ["ivfpq_store_autorefresh"], owners


def test_ivfpq_autorefresh_rejects_duplicate_delta_ids(spark, sf01, tmp_path):
    """Intra-batch uniqueness is ENFORCED, not just documented
    (round-11 ADVICE): a delta carrying the same vec_id twice would be
    double-counted in the drift decision and double-appended (serving
    then scores the id twice) — the left_anti guard only covers ids
    already stored. The verb must fail loudly BEFORE any decision or
    write."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.store_util import read_manifest
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    store = str(tmp_path / "dup_delta")
    pq_op.save_ivfpq_index_cached(spark, emb.where(F.col("vec_id") < 400), store)
    dirs_before = read_manifest(store).get("code_dirs", ["codes"])
    dup_delta = emb.where(F.col("vec_id") >= 400).unionAll(
        emb.where(F.col("vec_id") == 450)
    )
    with _pytest.raises(ValueError, match="duplicate vec_id"):
        pq_op.ivfpq_store_autorefresh(
            spark, store, dup_delta, emb, 100_000, extra_iters=1
        )
    # fail-before-write: no code dir appended, geometry untouched
    assert read_manifest(store).get("code_dirs", ["codes"]) == dirs_before


def test_ivfpq_autorefresh_store_derived_corpus(spark, tmp_path):
    """corpus=None derives the retarget corpus FROM THE STORE (decoded
    codes — round-11 verdict item 5). On a corpus whose codes
    reconstruct it EXACTLY (zero quantization error by construction:
    8 one-hot vectors with duplicates → every point sits on its
    centroid, residuals all zero, codewords all zero), the default
    must equal the explicit-corpus call bit-for-bit: same fired
    decision, same warm centroids, same stored code set."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.operators.kmeans import _quantized

    def vec(i):
        v = [0.0] * 64
        v[i % 8] = 1.0
        return v

    # build: ids 0..39 uniform over the 8 axes; delta: ids 40..59 all
    # axis 3 — coarse drift ~1.75M ppm, far above the 500k threshold
    rows = [(i, vec(i)) for i in range(40)] + [
        (i, vec(3)) for i in range(40, 60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    core = emb.where(F.col("vec_id") < 40)
    delta = emb.where(F.col("vec_id") >= 40)

    a = str(tmp_path / "explicit")
    b = str(tmp_path / "derived")
    pq_op.save_ivfpq_index_cached(spark, core, a)
    pq_op.save_ivfpq_index_cached(spark, core, b)

    # precondition the equality claim rests on: decode == quantized
    # originals (zero reconstruction error on this corpus)
    dec = {
        (int(r["id"]), tuple(int(x) for x in r["qv"]))
        for r in pq_op.ivfpq_decode_stored(spark, a).collect()
    }
    orig = {
        (int(r["id"]), tuple(int(x) for x in r["qv"]))
        for r in _quantized(core).collect()
    }
    assert dec == orig

    assert pq_op.ivfpq_store_autorefresh(
        spark, a, delta, emb, 500_000, extra_iters=2
    )
    assert pq_op.ivfpq_store_autorefresh(
        spark, b, delta, None, 500_000, extra_iters=2
    )
    mc_a, cb_a, codes_a = pq_op.load_ivfpq_index(spark, a)
    mc_b, cb_b, codes_b = pq_op.load_ivfpq_index(spark, b)
    assert mc_a == mc_b
    assert cb_a == cb_b
    assert {tuple(r) for r in codes_a.collect()} == {
        tuple(r) for r in codes_b.collect()
    }


def test_ivfpq_rebuild_over_corrupt_manifest_keeps_generations(
    spark, sf01, tmp_path
):
    """A rebuild over a store whose manifest is CORRUPT (unreadable
    JSON) must keep every existing gen_* dir (round-11 ADVICE): with
    the manifest gone, the commit has no safe basis for GC — a corrupt
    SIGNATURE store at a mistyped path would otherwise lose all its
    data, and a corrupt ivfpq store's live generation would be swept
    out from under concurrent readers. The next HEALTHY commit
    collects the leftovers."""
    import os

    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.store_util import manifest_path, read_manifest
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    core = emb.where(F.col("vec_id") < 400)
    store = str(tmp_path / "corrupt_rebuild")
    pq_op.save_ivfpq_index_cached(spark, core, store)
    gen0 = read_manifest(store)["data_dir"]
    with open(manifest_path(store), "w", encoding="utf-8") as f:
        f.write("{ not json")
    pq_op.save_ivfpq_index_cached(spark, core, store)  # recovery rebuild
    gens = {e for e in os.listdir(store) if e.startswith("gen_")}
    assert gen0 in gens  # pre-corruption generation NOT deleted
    gen1 = read_manifest(store)["data_dir"]
    assert gen1 in gens and gen1 != gen0
    # the store serves from the fresh generation
    mc, _cb, codes = pq_op.load_ivfpq_index(spark, store)
    assert len(mc) > 0 and codes.count() > 0
    # the next healthy commit resumes GC: only (new, previous) survive
    pq_op.save_ivfpq_index_cached(spark, core, store)
    gens2 = {e for e in os.listdir(store) if e.startswith("gen_")}
    assert len(gens2) <= 2 and gen0 not in gens2


def test_ivfpq_rebuild_rejects_foreign_store(spark, sf01, tmp_path):
    """save_ivfpq_index pointed at a LIVE store of another family must
    refuse loudly: proceeding would overwrite that store's manifest
    AND the generation GC would delete its gen_* dirs (signature
    stores use the same naming) — the cluster_store_init guard class,
    applied to the rebuild verb (round-11 review, final pass). A
    corrupt manifest stays rebuildable (documented recovery)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import dedup, pq as pq_op
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings").where(F.col("vec_id") < 50)
    store = str(tmp_path / "foreign")
    os.makedirs(f"{store}/gen_sigdata", exist_ok=True)
    with open(f"{store}/gen_sigdata/marker", "w") as f:
        f.write("live signature data")
    su.write_manifest(
        store,
        {"format": dedup._SIG_STORE_FORMAT, "schema": [],
         "data_dir": "gen_sigdata"},
    )
    with _pytest.raises(IOError, match="not an ivfpq index"):
        pq_op.save_ivfpq_index_cached(spark, emb, store)
    # the foreign manifest AND its generation data must be untouched
    assert su.read_manifest(store)["format"] == dedup._SIG_STORE_FORMAT
    assert os.path.exists(f"{store}/gen_sigdata/marker")
    # unparseable manifest → rebuild allowed (recovery path)
    store2 = str(tmp_path / "corrupt")
    os.makedirs(store2, exist_ok=True)
    with open(os.path.join(store2, "_manifest.json"), "w") as f:
        f.write("{not json")
    pq_op.save_ivfpq_index_cached(spark, emb, store2)
    assert pq_op.load_ivfpq_index(spark, store2)[2].count() == 50


def test_reencode_keeps_previous_generation_for_readers(spark, sf01, tmp_path):
    """The store family's concurrent-reader invariant applied to the
    retarget verb: a reader's lazy frame pinned to the pre-re-encode
    generation must survive ONE maintenance cycle (the commit keeps
    the immediately previous generation), and the next cycle sweeps
    it. A 50-vector corpus exercises the identical lifecycle at a
    fraction of the fit cost."""
    import os

    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings").where(F.col("vec_id") < 50)
    store = str(tmp_path / "gen_reader")
    pq_op.save_ivfpq_index_cached(spark, emb, store)
    _mc, _cb, old_codes = pq_op.load_ivfpq_index(spark, store)  # lazy
    pq_op.ivfpq_store_reencode(spark, store, emb, extra_iters=1)
    # the old generation is still on disk — the pinned frame reads fine
    old_rows = old_codes.collect()
    assert len(old_rows) > 0
    gens1 = [e for e in os.listdir(store) if e.startswith("gen_")]
    assert len(gens1) == 2
    # the NEXT cycle sweeps it (keep = {new, previous})
    pq_op.ivfpq_store_reencode(spark, store, emb, extra_iters=0)
    gens2 = [e for e in os.listdir(store) if e.startswith("gen_")]
    assert len(gens2) == 2
    assert len(set(gens1) & set(gens2)) == 1  # only the middle gen survives


def test_perceptron_autorefresh_gates(spark, sf01, tmp_path):
    """Drift-gated continual learning: cold start always fires (zero
    weights misclassify everything), the registered sf0.01 trajectory
    is fire→hold→REFIRE at 100k ppm (bucket 2's decision measured
    against the bucket-0 weights — genuinely chained), and a skipped
    batch is a FULL no-op: no epochs, no store write, manifest
    untouched (threshold > 10^6 ppm can never fire — mis <= n — so
    the skip branch is pinned deterministically)."""
    from tabsketchfm_spark.operators import classifier as qclf
    from tabsketchfm_spark.sources.store_util import read_manifest
    from tabsketchfm_spark.sources.tables import load_table

    out = qclf.perceptron_store_autorefresh_run(spark, sf01)
    fired = {
        int(r["batch"]): bool(r["fired"])
        for r in out.select("batch", "fired").distinct().collect()
    }
    assert fired == {0: True, 1: False, 2: True}

    docs = (
        load_table(spark, sf01, "documents")
        .select("doc_id", "text")
        .where("doc_id < 100")
    )
    store = str(tmp_path / "percar")
    f1, w1 = qclf.perceptron_store_autorefresh(spark, docs, store, 100_000)
    assert f1  # cold start: y·0 <= 0 everywhere
    m1 = read_manifest(store)
    f2, w2 = qclf.perceptron_store_autorefresh(spark, docs, store, 1_000_001)
    assert not f2 and w2 == w1
    assert read_manifest(store) == m1


def test_recon_error_covers_unindexed_vectors(spark, sf01, tmp_path):
    """The staleness metric must not silently drop vectors absent from
    the index (round-9 review finding): recon over a subset store with
    on-the-fly encode of the rest == recon after APPENDING the rest
    (an append stores exactly the frozen-quantizer encode), and every
    vector is counted."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    s1 = str(tmp_path / "subset_store")
    pq_op.save_ivfpq_index_cached(spark, emb.where(F.col("vec_id") < 400), s1)
    r_subset = {
        r["s"]: (r["n"], r["err_sum"])
        for r in pq_op.ivfpq_reconstruction_error(spark, s1, emb).collect()
    }
    assert all(n == emb.count() for n, _ in r_subset.values())
    pq_op.ivfpq_store_append(spark, s1, emb.where(F.col("vec_id") >= 400))
    r_appended = {
        r["s"]: (r["n"], r["err_sum"])
        for r in pq_op.ivfpq_reconstruction_error(spark, s1, emb).collect()
    }
    assert r_subset == r_appended


def test_bpe_merge_artifact_roundtrip_drives_tokenization(spark, sf01, tmp_path):
    """Tokenizer learn→save→serve loop: merges saved to the hashed
    artifact and loaded back tokenize identically to the in-memory
    list; a tampered artifact fails loudly."""
    import json

    import pytest

    from tabsketchfm_spark.operators import bpe

    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe.bpe_learn(spark, sf01, n_merges=4).collect()
    ]
    assert merges
    path = str(tmp_path / "tok")
    bpe.save_merges(path, merges)
    assert bpe.load_merges(path) == merges
    direct = sorted(
        map(tuple, bpe.bpe_tokenize_with(spark, sf01, merges).collect())
    )
    served = sorted(
        map(
            tuple,
            bpe.bpe_tokenize_with(spark, sf01, bpe.load_merges(path)).collect(),
        )
    )
    assert served == direct

    m = json.load(open(path + ".json"))
    m["merges"][0][0] = m["merges"][0][0] + "x"
    json.dump(m, open(path + ".json", "w"))
    with pytest.raises(IOError):
        bpe.load_merges(path)


def test_signature_store_guards_and_cold_start(spark, sf01, tmp_path):
    """Store manifest semantics: a parameter mismatch fails LOUDLY
    (mismatched shingle settings would produce meaningless estimates
    silently), and an EMPTY corpus bootstraps — the first ingest runs
    against a zero-row store and accepts everything shingle-able."""
    from pyspark.sql import functions as F

    import pytest

    from tabsketchfm_spark.operators.dedup import (
        build_signature_store,
        dedup_incremental_lsh_stored,
        ingest_dedup_commit,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    store = str(tmp_path / "cold_store")
    build_signature_store(docs.where(F.lit(False)), store)  # EMPTY corpus

    with pytest.raises(IOError):
        dedup_incremental_lsh_stored(docs.limit(1), spark, store, n=4)

    batch = docs.where(F.col("doc_id") % 50 == 0)
    v = {r["delta_id"]: r for r in ingest_dedup_commit(batch, spark, store).collect()}
    assert len(v) == batch.count()
    # cold store: nothing to match except earlier docs of the batch
    for r in v.values():
        if not r["accepted"]:
            assert r["matched_corpus_id"] < r["delta_id"]


def test_ingest_rejects_intra_batch_near_dups(spark, sf01, tmp_path):
    """Same-batch near-dups (the common crawl arrival pattern): ingest
    a batch containing an exact copy pair into an empty store — the
    higher-id copy must be rejected against the lower-id one."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.dedup import (
        build_signature_store,
        ingest_dedup_commit,
    )
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    base = docs.orderBy("doc_id").limit(3)
    clone = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    store = str(tmp_path / "intra_store")
    build_signature_store(docs.where(F.lit(False)), store)
    v = {
        r["delta_id"]: r
        for r in ingest_dedup_commit(base.unionByName(clone), spark, store).collect()
    }
    originals = [i for i in v if i < 100000]
    for i in originals:
        assert v[i]["accepted"], "lower-id original must survive"
        c = v[i + 100000]
        assert not c["accepted"] and c["est_jaccard"] == 1.0
        assert c["matched_corpus_id"] == i


def test_snapshot_diff_classifies_all_change_types(spark, sf01):
    """The registered diff's synthetic v2 exercises all three change
    classes, and counts reconcile with the mutation rules (removed =
    doc_id%10==0, changed = %10==1, added = cloned %10==2 rows)."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.structural import snapshot_diff_documents
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    by_mod = {
        m: docs.where(F.col("doc_id") % 10 == m).count() for m in (0, 1, 2)
    }
    got = {r["change"]: r["n_rows"] for r in snapshot_diff_documents(
        spark, sf01).collect()}
    assert got == {
        "removed": by_mod[0],
        "changed": by_mod[1],
        "added": by_mod[2],
    }


def test_multiclass_perceptron_learns_and_matches_fold(spark, sf01):
    """The multi-class trainer demonstrably LEARNS (pocket accuracy
    well above the majority class on the length-tercile target) and
    its distributed loop produces IDENTICAL pocket weights to the
    plain python fold."""
    from collections import Counter

    from tabsketchfm_spark.operators import classifier as qc
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    W, feat = qc.train_langid_perceptron(
        docs, epochs=10, lang_col=qc.LENCLASS_EXPR, langs=qc.LENCLASS_LABELS
    )
    try:
        rows = [r.asDict() for r in feat.collect()]
    finally:
        feat.unpersist()
    assert qc.train_langid_perceptron_py(rows, epochs=10, n_classes=3) == W
    dim = qc.N_BUCKETS + 1
    correct = 0
    majority = Counter(r["y"] for r in rows).most_common(1)[0][1]
    for r in rows:
        x = [r[f"x{j}"] for j in range(dim)]
        s = [sum(W[c][j] * x[j] for j in range(dim)) for c in range(3)]
        if s.index(max(s)) == r["y"]:
            correct += 1
    assert correct / len(rows) > majority / len(rows) + 0.15, (
        correct, majority, len(rows)
    )


def test_margin_perceptron_matches_fold_and_averaged_is_stabler(spark, sf01):
    """The margin+averaged trainer pins to its python fold, and the
    AVERAGED decision is the stability story: at a long horizon the
    final-epoch weights oscillate below the majority baseline while
    the summed-snapshot decision holds it (Freund-Schapire's point,
    measured driver-side on the same feature rows — ep=40 final acc
    0.288 vs averaged 0.906 at sf0.01)."""
    from tabsketchfm_spark.operators import classifier as qc
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    w, wsum, feat = qc.train_quality_perceptron_margin(docs, epochs=4, margin=64)
    try:
        rows = [r.asDict() for r in feat.collect()]
    finally:
        feat.unpersist()
    assert qc.train_quality_perceptron_margin_py(rows, epochs=4, margin=64) == (
        w,
        wsum,
    )
    # margin=0 degenerates to the plain perceptron's update set —
    # the two trainers' final weights must agree exactly
    w0, _ = qc.train_quality_perceptron_margin_py(rows, epochs=6, margin=0)
    assert w0 == qc.train_quality_perceptron_py(rows, epochs=6)

    dim = qc.N_BUCKETS + 1

    def acc(wv):
        ok = sum(
            1
            for r in rows
            if (sum(wv[j] * r[f"x{j}"] for j in range(dim)) > 0) == (r["y"] == 1)
        )
        return ok / len(rows)

    wl, wsl = qc.train_quality_perceptron_margin_py(rows, epochs=40, margin=0)
    assert acc(wsl) > acc(wl), (acc(wsl), acc(wl))


def test_quality_tree_matches_fold_and_beats_majority(spark, sf01):
    """Tree-induction pin: the two-aggregate distributed trainer
    produces the IDENTICAL tree (splits + leaves) to the plain python
    fold, and the trained tree beats the majority baseline the linear
    perceptron cannot improve on (split semantics capture threshold
    structure)."""
    from tabsketchfm_spark.operators import tree as qt
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    t, feat = qt.train_quality_tree(docs)
    try:
        rows = [r.asDict() for r in feat.collect()]
    finally:
        feat.unpersist()
    assert qt.train_quality_tree_py(rows) == t

    n = len(rows)
    majority = max(
        sum(1 for r in rows if r["y"] == 1), sum(1 for r in rows if r["y"] == -1)
    ) / n

    def leaf_pred(r):
        j0, t0 = t["root"]
        jl, tl = t["left"]
        jr, tr = t["right"]
        if r[f"x{j0}"] <= t0:
            leaf = 0 if r[f"x{jl}"] <= tl else 1
        else:
            leaf = 2 if r[f"x{jr}"] <= tr else 3
        return t["leaves"][leaf]

    acc = sum(1 for r in rows if leaf_pred(r) == r["y"]) / n
    assert acc > majority + 0.01, (acc, majority)


def test_quality_boost_matches_fold_and_beats_majority(spark, sf01):
    """Booster pin: the broadcast-slot distributed trainer picks the
    IDENTICAL stump sequence to the plain python fold, and the
    majority vote beats the majority-class baseline (best of the three
    trained families at sf0.01)."""
    from tabsketchfm_spark.operators import tree as qt
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    stumps, feat = qt.train_quality_boost(docs)
    try:
        rows = [r.asDict() for r in feat.collect()]
    finally:
        feat.unpersist()
    assert qt.train_quality_boost_py(rows) == stumps

    n = len(rows)
    majority = max(
        sum(1 for r in rows if r["y"] == 1), sum(1 for r in rows if r["y"] == -1)
    ) / n
    acc = (
        sum(
            1
            for r in rows
            if (sum(qt._stump_pred(r, *s) for s in stumps) > 0) == (r["y"] == 1)
        )
        / n
    )
    assert acc > majority + 0.02, (acc, majority)


def test_cv_scores_match_independent_folds(spark, sf01):
    """CV pin for ALL THREE trained families: the per-fold held-out
    counts from the distributed CV queries equal a plain python replay
    (md5 fold split, python trainer twins, python scoring) — and the
    TREE beats the majority baseline on every held-out fold at sf0.01,
    the honest-metric claim the registry comment makes."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.functions.hashing import h32_sql
    from tabsketchfm_spark.operators import classifier as qc
    from tabsketchfm_spark.operators import tree as qt
    from tabsketchfm_spark.sources.tables import load_table

    k = 3
    docs = load_table(spark, sf01, "documents")
    feat = qt.tree_features(docs).withColumn(
        "fold", F.expr(h32_sql("id", "spark")) % k
    )
    rows = [r.asDict() for r in feat.collect()]

    def leaf_pred(t, r):
        j0, t0 = t["root"]
        jl, tl = t["left"]
        jr, tr = t["right"]
        if r[f"x{j0}"] <= t0:
            leaf = 0 if r[f"x{jl}"] <= tl else 1
        else:
            leaf = 2 if r[f"x{jr}"] <= tr else 3
        return t["leaves"][leaf]

    tree_rows = {
        r["fold"]: r.asDict()
        for r in qt.quality_tree_cv_scores(docs, k=k).collect()
    }
    perc_rows = {
        r["fold"]: r.asDict()
        for r in qc.quality_perceptron_cv_scores(docs, k=k).collect()
    }
    boost_rows = {
        r["fold"]: r.asDict()
        for r in qt.quality_boost_cv_scores(docs, k=k).collect()
    }
    dim = qc.N_BUCKETS + 1
    for f in range(k):
        train = [r for r in rows if r["fold"] != f]
        test = [r for r in rows if r["fold"] == f]
        maj = 1 if sum(1 for r in train if r["y"] == 1) > sum(
            1 for r in train if r["y"] == -1
        ) else -1
        maj_ok = sum(1 for r in test if r["y"] == maj)

        t = qt.train_quality_tree_py(train)
        expect = {
            "fold": f,
            "n_train": len(train),
            "n_test": len(test),
            "correct_cnt": sum(1 for r in test if leaf_pred(t, r) == r["y"]),
            "majority_cnt": maj_ok,
        }
        assert tree_rows[f] == expect, (f, tree_rows[f], expect)
        # held-out, the tree beats the majority baseline on EVERY fold
        assert tree_rows[f]["correct_cnt"] > tree_rows[f]["majority_cnt"]

        w = qc.train_quality_perceptron_py(train, epochs=6)
        correct = sum(
            1
            for r in test
            if (1 if sum(w[j] * r[f"x{j}"] for j in range(dim)) > 0 else -1)
            == r["y"]
        )
        expect_p = dict(expect, correct_cnt=correct)
        assert perc_rows[f] == expect_p, (f, perc_rows[f], expect_p)

        stumps = qt.train_quality_boost_py(train)
        correct_b = sum(
            1
            for r in test
            if (
                sum(qt._stump_pred(r, j, t, pol) for j, t, pol in stumps) > 0
            )
            == (r["y"] == 1)
        )
        expect_b = dict(expect, correct_cnt=correct_b)
        assert boost_rows[f] == expect_b, (f, boost_rows[f], expect_b)


def test_model_selection_matches_cv_totals_and_argmax(spark, sf01):
    """The model-selection capstone must equal the sum of the three
    standalone CV queries' per-fold hit counts (shared fold split and
    label algebra), and its winner must follow the documented rule:
    max total held-out hits, tie → lexicographically smallest family."""
    from tabsketchfm_spark.operators import classifier as qc
    from tabsketchfm_spark.operators import tree as qt
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents")
    sel = {r["family"]: r.asDict() for r in qt.quality_model_selection(docs).collect()}
    assert set(sel) == set(qt.FAMILIES)

    cv = {
        "perceptron": qc.quality_perceptron_cv_scores(docs).collect(),
        "tree": qt.quality_tree_cv_scores(docs).collect(),
        "boost": qt.quality_boost_cv_scores(docs).collect(),
    }
    n_test = sum(r["n_test"] for r in cv["perceptron"])
    for fam, rows in cv.items():
        assert sel[fam]["heldout_correct"] == sum(r["correct_cnt"] for r in rows), fam
        assert sel[fam]["n_test"] == n_test
    # majority baseline rides every CV identically
    maj = sum(r["majority_cnt"] for r in cv["tree"])
    assert sel["majority"]["heldout_correct"] == maj
    assert maj == sum(r["majority_cnt"] for r in cv["boost"])

    best = max(v["heldout_correct"] for v in sel.values())
    winner = min(f for f, v in sel.items() if v["heldout_correct"] == best)
    for fam, v in sel.items():
        assert v["selected"] == (fam == winner), (fam, v, winner)
    # exactly one winner
    assert sum(1 for v in sel.values() if v["selected"]) == 1


def test_sig_store_reshingle_lifecycle(spark, sf01, tmp_path):
    """Tokenizer-change maintenance on the signature store (round-12):
    (1) a changed merges artifact FIRES the re-shingle and the stored
    signatures equal a fresh build under the new scheme bit-for-bit;
    (2) an unchanged artifact is a retry-idempotent no-op — same
    generation dir, store byte-untouched; (3) the scheme contract is
    loud both ways (legacy reader over a reshingled store, and the
    serve path under a STALE artifact); (4) a concurrent writer's
    lease blocks the verb; (5) a corpus missing stored ids fails
    before any write."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import bpe
    from tabsketchfm_spark.operators.dedup import (
        _read_signature_store,
        bpe_segmented_sigs,
        build_signature_store,
        dedup_incremental_bpe_stored,
        sig_store_reshingle,
    )
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 80")
    corpus = docs.where("doc_id < 60")
    store = str(tmp_path / "resh_store")
    build_signature_store(corpus, store, num_perm=50)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe.bpe_learn(spark, sf01, 4).collect()
    ]
    art = str(tmp_path / "tok_v1")
    bpe.save_merges(art, merges)

    # lease conflict blocks the whole check→rebuild RMW
    su.acquire_lease(store, owner="other-writer")
    with _pytest.raises(IOError, match="other-writer"):
        sig_store_reshingle(corpus, spark, store, art)
    su.release_lease(store)

    # missing stored ids: loud, before any write
    gen_before = su.read_manifest(store)["data_dir"]
    with _pytest.raises(ValueError, match="absent from the supplied corpus"):
        sig_store_reshingle(corpus.where("doc_id < 30"), spark, store, art)
    assert su.read_manifest(store)["data_dir"] == gen_before

    # fires on tokenizer change; stored rows == fresh build under the
    # new scheme (population scoped to docs that still tokenize)
    assert sig_store_reshingle(corpus, spark, store, art)
    m = su.read_manifest(store)
    assert m["tokenizer_hash"] == bpe.merges_hash(merges)
    got = _read_signature_store(
        spark, store, 3, 50, tokenizer_hash=m["tokenizer_hash"]
    )
    want = bpe_segmented_sigs(corpus, merges, n=3, num_perm=50)
    try:
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in want.collect()
        }
    finally:
        got.unpersist()
        want.unpersist()

    # retry-idempotent no-op: same generation, nothing rewritten
    assert not sig_store_reshingle(corpus, spark, store, art)
    assert su.read_manifest(store)["data_dir"] == m["data_dir"]

    # scheme contract is loud: a legacy word-n-gram reader must refuse
    with _pytest.raises(IOError, match="tokenizer"):
        _read_signature_store(spark, store, 3, 50)
    # ... and serving under a DIFFERENT artifact must refuse too
    art2 = str(tmp_path / "tok_v2")
    bpe.save_merges(art2, merges[:2])
    with _pytest.raises(IOError, match="tokenizer"):
        dedup_incremental_bpe_stored(
            docs.where("doc_id >= 60"), spark, store, art2, num_perm=50
        )

    # a SECOND tokenizer change re-fires and re-keys the store
    assert sig_store_reshingle(corpus, spark, store, art2)
    assert su.read_manifest(store)["tokenizer_hash"] == bpe.merges_hash(
        merges[:2]
    )


def test_sig_store_reshingle_ts_carryover(spark, sf01, tmp_path):
    """Re-shingling a timestamp-TTL store preserves each id's LATEST
    ingest_ts (the rebuild is from current content — one row per id,
    duplicate appends compact last-seen-wins) so the TTL horizon
    stays meaningful across a tokenizer change."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import bpe
    from tabsketchfm_spark.operators.dedup import (
        _read_signature_store,
        append_signatures,
        build_signature_store,
        sig_store_reshingle,
    )
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 60")
    store = str(tmp_path / "resh_ts")
    build_signature_store(docs.where("doc_id < 40"), store, ingest_ts=0)
    # re-ingest a slice at ts=1 (duplicate rows for those ids) and
    # append a fresh slice at ts=1
    append_signatures(docs.where("doc_id < 10"), spark, store, ingest_ts=1)
    append_signatures(docs.where("doc_id >= 40"), spark, store, ingest_ts=1)

    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe.bpe_learn(spark, sf01, 4).collect()
    ]
    art = str(tmp_path / "tok")
    bpe.save_merges(art, merges)
    assert sig_store_reshingle(docs, spark, store, art)
    m = su.read_manifest(store)
    got = _read_signature_store(
        spark, store, 3, 100, tokenizer_hash=m["tokenizer_hash"]
    )
    try:
        ts_by_id = {
            int(r["id"]): int(r["ingest_ts"])
            for r in got.select("id", "ingest_ts").collect()
        }
    finally:
        got.unpersist()
    # one row per id; re-ingested + fresh ids carry ts=1, the rest 0
    for i, ts in ts_by_id.items():
        assert ts == (1 if (i < 10 or i >= 40) else 0), (i, ts)


def test_sig_store_reshingle_rejects_duplicate_corpus_rows(
    spark, sf01, tmp_path
):
    """Two corpus rows under one stored id would MIN-blend both texts'
    shingle hashes into a chimera signature belonging to neither
    (the round-9 compaction class) — the 'one current text per id'
    contract must be ENFORCED before any write, consistent with the
    family's other fail-loud preconditions."""
    import pytest as _pytest

    from tabsketchfm_spark.operators import bpe
    from tabsketchfm_spark.operators.dedup import (
        build_signature_store,
        sig_store_reshingle,
    )
    from tabsketchfm_spark.sources import store_util as su
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 40")
    store = str(tmp_path / "dup_corpus")
    build_signature_store(docs, store, num_perm=50)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe.bpe_learn(spark, sf01, 2).collect()
    ]
    art = str(tmp_path / "tok")
    bpe.save_merges(art, merges)
    gen_before = su.read_manifest(store)["data_dir"]
    dup_corpus = docs.unionAll(docs.where("doc_id = 5"))
    with _pytest.raises(ValueError, match="duplicate row"):
        sig_store_reshingle(dup_corpus, spark, store, art)
    # fail-before-write: generation untouched, store still legacy
    m = su.read_manifest(store)
    assert m["data_dir"] == gen_before and "tokenizer_hash" not in m


def test_crawl_consistency_audit_survives_reshingle(spark, sf01, tmp_path):
    """crawl_store_consistency only reads ids — scheme-AGNOSTIC like
    compaction — so it must keep working on a store that has
    undergone tokenizer maintenance (review finding: the audit
    defaulted to the legacy scheme and raised on any re-shingled
    store)."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import bpe, dedup
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf01, "documents").where("doc_id < 40")
    sig = str(tmp_path / "sig")
    cl = str(tmp_path / "cl")
    dedup.build_signature_store(docs, sig)
    dedup.cluster_store_init(
        spark, docs.select("doc_id", F.col("doc_id").alias("cluster_id")), cl
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe.bpe_learn(spark, sf01, 2).collect()
    ]
    art = str(tmp_path / "tok")
    bpe.save_merges(art, merges)
    assert dedup.sig_store_reshingle(docs, spark, sig, art)
    ok = dedup.crawl_store_consistency(spark, sig, cl).first()
    assert ok["n_orphan_sigs"] == 0 and ok["n_labels"] == 40


def test_ivfpq_store_reencode_store_derived_corpus(spark, tmp_path):
    """emb=None on ivfpq_store_reencode derives the retarget corpus
    from the stored codes (the autorefresh twin's default, same
    _decode_codes seam). On a zero-quantization-error corpus (one-hot
    axes with duplicates: every point sits on its centroid) the
    default must equal the explicit-corpus resync bit-for-bit."""
    from tabsketchfm_spark.operators import pq as pq_op

    def vec(i):
        v = [0.0] * 64
        v[i % 8] = 1.0
        return v

    rows = [(i, vec(i)) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    a = str(tmp_path / "explicit")
    b = str(tmp_path / "derived")
    pq_op.save_ivfpq_index_cached(spark, emb, a)
    pq_op.save_ivfpq_index_cached(spark, emb, b)
    pq_op.ivfpq_store_reencode(spark, a, emb, extra_iters=2)
    pq_op.ivfpq_store_reencode(spark, b, None, extra_iters=2)
    mc_a, cb_a, codes_a = pq_op.load_ivfpq_index(spark, a)
    mc_b, cb_b, codes_b = pq_op.load_ivfpq_index(spark, b)
    assert mc_a == mc_b and cb_a == cb_b
    assert {tuple(r) for r in codes_a.collect()} == {
        tuple(r) for r in codes_b.collect()
    }


def test_save_ivfpq_index_cached_template(spark, sf01, tmp_path):
    """The base-store template cache: (1) a cached copy equals a
    direct build bit-for-bit (same manifest pointers, same artifacts
    — the build is a pure function of the corpus plan); (2) mutating
    one copy (append) leaves a later copy PRISTINE — consumers own
    their copies, the template is immutable."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.sources.store_util import read_manifest
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    core = emb.where(F.col("vec_id") < 400)
    direct = str(tmp_path / "direct")
    c1 = str(tmp_path / "cached1")
    c2 = str(tmp_path / "cached2")
    pq_op.save_ivfpq_index(spark, core, direct)  # DIRECT on purpose
    pq_op.save_ivfpq_index_cached(spark, core, c1)
    pq_op.save_ivfpq_index_cached(spark, core, c2)
    md, mc1, mc2 = (read_manifest(p) for p in (direct, c1, c2))
    # copies share the template's generation name; the direct build's
    # differs (fresh uuid) — compare CONTENT, not pointer strings
    assert mc1 == mc2
    drop = lambda m: {k: v for k, v in m.items() if k != "data_dir"}
    assert drop(md) == drop(mc1)
    a_d = pq_op.load_ivfpq_index(spark, direct)
    a_1 = pq_op.load_ivfpq_index(spark, c1)
    assert a_d[0] == a_1[0] and a_d[1] == a_1[1]
    assert {tuple(r) for r in a_d[2].collect()} == {
        tuple(r) for r in a_1[2].collect()
    }
    # mutate c1; c2 (and a THIRD copy) stay at the base state
    pq_op.ivfpq_store_append(spark, c1, emb.where(F.col("vec_id") >= 400))
    c3 = str(tmp_path / "cached3")
    pq_op.save_ivfpq_index_cached(spark, core, c3)
    n_base = a_1[2].count()  # collected above, pre-append
    for p in (c2, c3):
        assert pq_op.load_ivfpq_index(spark, p)[2].count() == n_base
    assert pq_op.load_ivfpq_index(spark, c1)[2].count() > n_base


def test_save_ivfpq_index_cached_delegates_on_existing_store(
    spark, sf01, tmp_path
):
    """The cached copy path is for FRESH dirs only: a target that
    already holds a manifest delegates to the guarded direct writer —
    a foreign-family store refuses loudly (the round-11 guard; a bare
    copytree would have overwritten its manifest and the next commit
    would GC its generations), and a live ivfpq store rebuilds under
    the fresh-generation atomic-flip protocol (previous generation
    kept one cycle)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators import pq as pq_op
    from tabsketchfm_spark.operators.dedup import build_signature_store
    from tabsketchfm_spark.sources.store_util import read_manifest
    from tabsketchfm_spark.sources.tables import load_table

    emb = load_table(spark, sf01, "embeddings")
    core = emb.where(F.col("vec_id") < 400)
    docs = load_table(spark, sf01, "documents").where("doc_id < 30")

    sig = str(tmp_path / "sig_store")
    build_signature_store(docs, sig)
    m_before = read_manifest(sig)
    with _pytest.raises(IOError, match="refusing to rebuild over it"):
        pq_op.save_ivfpq_index_cached(spark, core, sig)
    assert read_manifest(sig) == m_before  # untouched

    idx = str(tmp_path / "idx")
    pq_op.save_ivfpq_index_cached(spark, core, idx)
    gen0 = read_manifest(idx)["data_dir"]
    pq_op.save_ivfpq_index_cached(spark, core, idx)  # rebuild path
    gen1 = read_manifest(idx)["data_dir"]
    gens = {e for e in os.listdir(idx) if e.startswith("gen_")}
    assert gen1 != gen0 and gens == {gen0, gen1}  # previous kept one cycle


def test_crawl_tokenizer_rollout_phase_semantics(spark, sf01):
    """The rollout composite's PHASE structure is load-bearing, not
    decorative: at threshold 0.9 the pair (87, 134) — both arriving
    BEFORE the rollout — has word-scheme estimate 0.86 (no phase-A
    pair) and tokenizer-scheme estimate 0.96, so a naive one-shot
    recompute under the NEW scheme would merge them while the
    mid-crawl composite must NOT (the rollout re-shingles signatures,
    it does not retroactively re-pair the pre-rollout era). The
    composite at 0.9 must (1) equal its own closed-form union oracle
    bit-for-bit and (2) DIFFER from the pure-scheme-B closure."""
    from tabsketchfm_spark.operators import dedup
    from tabsketchfm_spark.plans.registry import _crawl_tokenizer_rollout
    from tests.oracle_util import canon, run_oracle

    out = _crawl_tokenizer_rollout(spark, sf01, threshold=0.9).toPandas()
    want = run_oracle(
        dedup.crawl_tokenizer_rollout_oracle_sql(
            "documents", 150, num_perm=50, bands=10, threshold=0.9
        ),
        sf01,
    )
    assert canon(out).equals(canon(want))
    # pure-B one-shot closure (no phase structure) differs: it merges
    # (87, 134); the composite keeps them separate
    pure_b_pairs = (
        "SELECT delta_id AS id_a, corpus_id AS id_b FROM ("
        + dedup.dedup_incremental_bpe_oracle_sql(
            "documents",
            "TRUE",
            n=3,
            n_merges=8,
            num_perm=50,
            bands=10,
            threshold=0.9,
            corpus_pred="TRUE",
        )
        + ") t WHERE delta_id <> corpus_id"
    )
    pure_b = run_oracle(
        dedup._cc_closure_sql(pure_b_pairs, "documents", "doc_id")
        + "\nSELECT doc_id, cluster_id FROM labels "
        "WHERE doc_id IN (87, 134)",
        sf01,
    )
    b_cids = dict(zip(pure_b["doc_id"], pure_b["cluster_id"]))
    assert b_cids[87] == b_cids[134]  # naive recompute WOULD merge
    comp = run_oracle(
        dedup.crawl_tokenizer_rollout_oracle_sql(
            "documents", 150, num_perm=50, bands=10, threshold=0.9,
            bounded_mod=1,  # full projection: every doc in the slice
        ),
        sf01,
    )
    c_cids = dict(
        zip(comp["doc_id"], comp["cluster_id"])
    )
    assert c_cids[87] != c_cids[134]  # the composite preserves eras
