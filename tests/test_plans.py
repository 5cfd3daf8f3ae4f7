"""Physical-plan quality assertions: the optimizations the engine
depends on at 100 TB must actually appear in the executed plans."""

from __future__ import annotations

from tabsketchfm_spark.operators.setsim import jaccard_containment
from tabsketchfm_spark.operators.minhash import joinability_search_oph
from tabsketchfm_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_setsim_prunes_to_single_column(spark, sf01):
    """Column pruning must reach the parquet scan: a set-similarity
    query over one column per side reads exactly that column."""
    orders = load_table(spark, sf01, "orders")
    cust = load_table(spark, sf01, "customer")
    p = _plan(
        jaccard_containment(
            orders, ("orders", "o_custkey"), cust, ("customer", "c_custkey")
        )
    )
    assert "ReadSchema: struct<o_custkey:bigint>" in p
    assert "ReadSchema: struct<c_custkey:bigint>" in p


def test_joinability_broadcasts_query_side(spark, sf01):
    """The tiny query-signature relation must broadcast — candidate
    sketches never shuffle for the comparison."""
    from tabsketchfm_spark.plans.registry import JOIN_CANDIDATES, JOIN_QUERY

    p = _plan(joinability_search_oph(spark, sf01, JOIN_QUERY, JOIN_CANDIDATES))
    assert "BroadcastHashJoin" in p


def test_filter_pushdown_reaches_scan(spark, sf01):
    """A status filter must appear as a parquet PushedFilters entry."""
    orders = load_table(spark, sf01, "orders").where("o_orderstatus = 'F'")
    p = _plan(orders.select("o_orderkey"))
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in p


def test_salted_join_shape(spark, sf01):
    """The salted fact-orders join must be a shuffle join on the
    composite (key, salt) — NOT a broadcast of the replicated build
    side — while the customer dim still broadcasts."""
    from tabsketchfm_spark.operators.analytics import salted_join_agg

    p = _plan(salted_join_agg(spark, sf01))
    assert "BroadcastHashJoin" in p  # customer dim
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)  # salted join


def test_connected_components_transitive(spark):
    """a-b + b-c (no a-c edge) must land in ONE cluster labeled min."""
    from tabsketchfm_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id bigint"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_raises_past_max_iter(spark):
    """A component deeper than the round budget must fail LOUD (the
    silent-truncation contract fix): a 16-hop chain cannot converge in
    5 rounds; with enough rounds the same chain labels to min."""
    import pytest

    from tabsketchfm_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "id_a bigint, id_b bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(17)], "doc_id bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, nodes, max_iter=5)
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(chain, nodes, max_iter=20).collect()
    }
    assert got == {i: 0 for i in range(17)}


def test_dedup_clusters_incremental_composition(spark):
    """Incremental CC folds delta pairs into stored labels and must
    equal the full recompute — exercised on the interesting paths: a
    delta pair MERGING two old components, a new node attaching to an
    old component, re-crawled old-old pairs, isolated old and new
    nodes. Plus the label-closure contract is loud."""
    import pytest as _pytest

    from tabsketchfm_spark.operators.dedup import (
        connected_components_star,
        dedup_clusters_incremental,
    )

    # old graph: {1,2,3} (min 1), {5,6} (min 5), isolated 7, 8
    old_nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 5, 6, 7, 8)], "doc_id bigint"
    )
    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint"
    )
    labels_old = connected_components_star(
        old_pairs, old_nodes, node_col="doc_id"
    ).select("doc_id", "cluster_id")
    # delta: new node 9 attaches to comp1 via node 2; a re-crawled
    # old-old pair (3,5) merges the two old components; 10 is isolated
    delta_nodes = spark.createDataFrame([(9,), (10,)], "doc_id bigint")
    delta_pairs = spark.createDataFrame(
        [(9, 2), (3, 5)], "id_a bigint, id_b bigint"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters_incremental(
            labels_old, delta_pairs, delta_nodes
        ).collect()
    }
    want_cluster = {1: 1, 2: 1, 3: 1, 5: 1, 6: 1, 9: 1, 7: 7, 8: 8, 10: 10}
    assert {k: v[0] for k, v in got.items()} == want_cluster
    assert got[1][1] == 6 and got[7][1] == 1 and got[10][1] == 1

    # label-closure contract: a label table whose cluster_id is not a
    # self-labelled node (e.g. remapped ids) must be rejected loudly
    bad = spark.createDataFrame(
        [(2, 1), (3, 1)], "doc_id bigint, cluster_id bigint"  # 1 missing
    )
    with _pytest.raises(ValueError, match="label-closed"):
        dedup_clusters_incremental(bad, delta_pairs, delta_nodes)
    # a duplicated self-row must not mask the missing closure row
    # (review finding: a row-count check was bypassable)
    dup = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 3)], "doc_id bigint, cluster_id bigint"
    )
    with _pytest.raises(ValueError, match="duplicate node"):
        dedup_clusters_incremental(dup, delta_pairs, delta_nodes)
    # max-labelled components (closed, but not component-MIN) are the
    # unprovable-composition case — rejected by the lbl<=node check
    maxlbl = spark.createDataFrame(
        [(1, 2), (2, 2)], "doc_id bigint, cluster_id bigint"
    )
    with _pytest.raises(ValueError, match="component-MIN"):
        dedup_clusters_incremental(maxlbl, delta_pairs, delta_nodes)
    # a NULL cluster_id would silently DROP its node at the compose
    # join — rejected up front (review finding)
    nulllbl = spark.createDataFrame(
        [(1, 1), (2, None)], "doc_id bigint, cluster_id bigint"
    )
    with _pytest.raises(ValueError, match="NULL"):
        dedup_clusters_incremental(nulllbl, delta_pairs, delta_nodes)


def test_dedup_clusters_incremental_random_graphs(spark):
    """Randomized composition property: for seeded random graphs and
    random old/delta node splits, incremental CC over (labels(old),
    delta-touching edges) equals the one-shot CC over the full graph —
    clusters AND sizes. Catches composition bugs the hand-built case
    misses (multi-way merges, delta-delta chains, old components
    absorbed through several hops)."""
    import random

    from tabsketchfm_spark.operators.dedup import (
        connected_components_star,
        dedup_clusters_incremental,
    )

    rng = random.Random(427)
    # 3 trials (r9 verdict suite-budget item): the property space each
    # trial samples (multi-way merges, delta-delta chains, multi-hop
    # absorption) is covered by trial 1-2 already; trial count is a
    # wall-time knob, the seed keeps the cases pinned
    for trial in range(3):
        n = rng.randint(12, 28)
        nodes = list(range(n))
        edges = {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(rng.randint(n // 2, 2 * n))
        }
        old_set = set(rng.sample(nodes, rng.randint(n // 3, 2 * n // 3)))
        delta_set = [v for v in nodes if v not in old_set]
        old_edges = [(a, b) for a, b in edges if a in old_set and b in old_set]
        delta_edges = [
            (a, b) for a, b in edges if a not in old_set or b not in old_set
        ]
        nodes_df = lambda ids: spark.createDataFrame(  # noqa: E731
            [(i,) for i in ids] or [(None,)], "doc_id bigint"
        ).where("doc_id IS NOT NULL")
        pairs_df = lambda ps: spark.createDataFrame(  # noqa: E731
            ps or [(None, None)], "id_a bigint, id_b bigint"
        ).where("id_a IS NOT NULL")
        labels_old = connected_components_star(
            pairs_df(old_edges), nodes_df(sorted(old_set)), node_col="doc_id"
        ).select("doc_id", "cluster_id")
        got = {
            (r["doc_id"], r["cluster_id"], r["cluster_size"])
            for r in dedup_clusters_incremental(
                labels_old, pairs_df(delta_edges), nodes_df(delta_set)
            ).collect()
        }
        full = connected_components_star(
            pairs_df(sorted(edges)), nodes_df(nodes), node_col="doc_id"
        )
        sizes: dict = {}
        rows = [(r["doc_id"], r["cluster_id"]) for r in full.collect()]
        for _, c in rows:
            sizes[c] = sizes.get(c, 0) + 1
        want = {(d, c, sizes[c]) for d, c in rows}
        assert got == want, f"trial {trial}: composition != one-shot CC"


def test_connected_components_star_matches_label_prop(spark):
    """Star contraction (O(log n) rounds) and min-label propagation
    must produce IDENTICAL clusters: random multi-component graphs, a
    16-hop chain (where star needs ~log rounds, label prop needs 17 —
    run with max_iter=12 to prove the round-count advantage), and
    isolated nodes."""
    import random

    from tabsketchfm_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    for seed in (7, 23, 51):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(40), rng.randrange(40)) for _ in range(45)
        ] + [(100, 101), (101, 102)]
        edges = [(a, b) for a, b in edges if a != b]
        node_ids = sorted({n for e in edges for n in e} | {500, 501})
        pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        nodes = spark.createDataFrame(
            [(n,) for n in node_ids], "doc_id bigint"
        )
        lbl = {
            r.doc_id: r.cluster_id
            for r in connected_components(pairs, nodes, max_iter=40).collect()
        }
        star = {
            r.doc_id: r.cluster_id
            for r in connected_components_star(pairs, nodes).collect()
        }
        assert star == lbl, f"seed {seed}"
    # the deep chain: star converges well inside 12 alternations
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "id_a bigint, id_b bigint"
    )
    cnodes = spark.createDataFrame([(i,) for i in range(17)], "doc_id bigint")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components_star(chain, cnodes, max_iter=12).collect()
    }
    assert got == {i: 0 for i in range(17)}


def test_range_join_has_no_nested_loop(spark, sf01):
    """Binned range join must stay an equi-join: no
    BroadcastNestedLoopJoin / CartesianProduct from the range
    predicate."""
    from tabsketchfm_spark.operators.windows import range_join_follow_counts

    events = load_table(spark, sf01, "events")
    p = _plan(range_join_follow_counts(events))
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_asof_join_is_single_window_pass(spark, sf01):
    """Merge-based as-of: no join operator at all on the left-right
    match — one union + one window sort carries the payload."""
    from tabsketchfm_spark.operators.windows import event_hourly_asof

    events = load_table(spark, sf01, "events")
    p = _plan(event_hourly_asof(events))
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "Window" in p


def test_simhash_pairs_has_no_cartesian(spark, sf01):
    """Pigeonhole chunk equi-join must plan as a hash join on
    (chunk_index, chunk_value) — no CartesianProduct anywhere."""
    from tabsketchfm_spark.operators.dedup import simhash_near_dups

    docs = load_table(spark, sf01, "documents")
    p = _plan(simhash_near_dups(docs, max_hamming=3))
    assert "Cartesian" not in p and "NestedLoop" not in p


def test_simhash_pigeonhole_matches_bruteforce(spark, sf01):
    """The chunked candidate generator is exact: identical pair set to
    the all-pairs crossJoin form (pigeonhole guarantees recall; the
    bit_count verify guarantees precision)."""
    from tabsketchfm_spark.operators.dedup import (
        simhash_near_dups,
        simhash_near_dups_bruteforce,
    )

    docs = load_table(spark, sf01, "documents").limit(400)
    fast = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dups(docs, max_hamming=4).collect()
    }
    slow = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dups_bruteforce(docs, max_hamming=4).collect()
    }
    assert fast == slow and len(slow) > 0


def test_embedding_near_dups_has_no_cartesian(spark, sf01):
    """LSH-bucketed near-dup: candidate generation must be a hash join
    on (table, bucket) — no CartesianProduct in the plan."""
    from tabsketchfm_spark.operators.vector import embedding_near_dups

    emb = load_table(spark, sf01, "embeddings")
    p = _plan(embedding_near_dups(emb, threshold=0.4))
    assert "Cartesian" not in p and "NestedLoop" not in p


def test_embedding_near_dups_precision_and_recall(spark, sf01):
    """Against the all-pairs form: every emitted pair is a true pair
    with the identical cosine (exact precision — the verify stage is an
    exact dot), and recall at the default (planes=3, tables=12) config
    clears 0.8 on the sf0.01 pair set."""
    from tabsketchfm_spark.operators.vector import (
        embedding_near_dups,
        embedding_near_dups_bruteforce,
    )

    emb = load_table(spark, sf01, "embeddings")
    fast = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_near_dups(emb, threshold=0.35).collect()
    }
    slow = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_near_dups_bruteforce(emb, threshold=0.35).collect()
    }
    assert len(slow) > 0
    assert all(slow[k] == v for k, v in fast.items())  # precision: subset, same cos
    assert len(fast) / len(slow) >= 0.8


def test_ngram_jaccard_df_cap_prune_matches_oracle(spark, sf01):
    """Force the high-DF shingle prune to actually fire (cap=3 < max DF
    7 at sf0.01) and check the pruned-space Jaccard still matches the
    mirrored DuckDB oracle bit-exactly."""
    from tabsketchfm_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_oracle_sql,
    )
    from tests.oracle_util import assert_match, run_oracle

    docs = load_table(spark, sf01, "documents")
    sdf = ngram_jaccard_pairs(docs, threshold=0.5, df_cap=3)
    opdf = run_oracle(
        ngram_jaccard_oracle_sql("documents", threshold=0.5, df_cap=3), sf01
    )
    assert_match(sdf, opdf, "ngram_df_cap")


def test_grouping_sets_single_scan_single_shuffle(spark, sf01):
    """GROUPING SETS must compile to ONE scan + Expand + one aggregate
    exchange — not three separate groupBy scans."""
    from tabsketchfm_spark.operators.analytics import grouping_sets_order_stats

    p = _plan(grouping_sets_order_stats(spark, sf01))
    assert "Expand" in p
    assert p.count("Scan parquet") == 1


def test_pivot_pinned_values_no_distinct_scan(spark, sf01):
    """A pivot with a PINNED value list must not run the extra
    distinct-discovery pass: exactly one scan of events."""
    from tabsketchfm_spark.operators.analytics import pivot_event_counts

    p = _plan(pivot_event_counts(spark, sf01))
    assert p.count("Scan parquet") == 1


def test_exact_substring_dedup_plan_shape(spark, sf01):
    """ExactSubstr stays linear: every join is an equi-join (no
    Cartesian/NestedLoop) and column pruning reaches the scan — the
    gram stage reads exactly (doc_id, text)."""
    from tabsketchfm_spark.operators.text import exact_substring_dedup

    docs = load_table(spark, sf01, "documents")
    p = _plan(exact_substring_dedup(docs))
    assert "Cartesian" not in p and "NestedLoop" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_exact_substring_dedup_chars_plan_shape(spark, sf01):
    """The char-granularity variant keeps the same linear shape."""
    from tabsketchfm_spark.operators.text import exact_substring_dedup_chars

    docs = load_table(spark, sf01, "documents")
    p = _plan(exact_substring_dedup_chars(docs))
    assert "Cartesian" not in p and "NestedLoop" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_exact_substring_pins_survive_profile_cache(spark, sf01):
    """Round-6 regression (VERDICT r6 item 1): profiling `documents`
    used to persist the FULL-WIDTH spread(df), leaving a bare
    `Repartition(documents)` in the CacheManager; any later query with
    the identical subtree (ExactSubstr token + char) got the full-width
    InMemoryRelation substituted before column pruning, un-pruning its
    scan. Fixed two ways (both must hold): profile_table persists the
    PROJECTED spread frame, and ExactSubstr projects before spread.
    This test reproduces the pollution order inside one session."""
    from tabsketchfm_spark.operators.text import (
        exact_substring_dedup,
        exact_substring_dedup_chars,
    )
    from tabsketchfm_spark.plans import registry

    try:
        # build + materialize the registered documents profile — its
        # lazy persists stay live in the CacheManager, as in the suite
        registry.queries()["a1a8_profile_documents"](spark, sf01).collect()
        docs = load_table(spark, sf01, "documents")
        for op in (exact_substring_dedup, exact_substring_dedup_chars):
            p = _plan(op(docs))
            assert "ReadSchema: struct<doc_id:bigint,text:string>" in p, (
                f"{op.__name__} scan un-pruned under a cached documents "
                f"profile"
            )
    finally:
        spark.catalog.clearCache()


def test_setsim_pin_survives_fd_cache(spark, sf01):
    """Round-7 regression: functional_dependencies used to persist a
    FULL-WIDTH `select(*all_columns)` — a no-op projection that
    canonicalizes like the bare table, so once the registered
    p13_functional_deps_customer was merely BUILT (persist() registers
    in the CacheManager eagerly, before any materialization), setsim's
    pruned single-column customer scan got the full-width
    InMemoryRelation substituted. Fixed by persisting the DEDUPLICATED
    projection (a semantic no-op for FD's distinct-count consumers,
    and a cached-plan root nothing else can match)."""
    from tabsketchfm_spark.operators.setsim import jaccard_containment
    from tabsketchfm_spark.plans import registry

    try:
        # building alone pollutes — no collect needed for the repro
        registry.queries()["p13_functional_deps_customer"](spark, sf01)
        p = _plan(
            jaccard_containment(
                load_table(spark, sf01, "orders"),
                ("orders", "o_custkey"),
                load_table(spark, sf01, "customer"),
                ("customer", "c_custkey"),
            )
        )
        assert "ReadSchema: struct<c_custkey:bigint>" in p, (
            "setsim customer scan un-pruned under a cached FD frame"
        )
    finally:
        spark.catalog.clearCache()


def test_winnow_pairs_has_no_cartesian(spark, sf01):
    """Winnowing near-dup candidates come from the fingerprint
    equi-join — no CartesianProduct."""
    from tabsketchfm_spark.operators.text import winnow_near_dups

    docs = load_table(spark, sf01, "documents")
    p = _plan(winnow_near_dups(docs))
    assert "Cartesian" not in p and "NestedLoop" not in p


def test_lsh_bucket_cap_subset_and_vacuous(spark, sf01):
    """Hot-bucket cap (operators/lsh.py): a small cap yields a SUBSET
    of the uncapped pair set with identical estimates (re-splitting
    only ever drops cross-sub-bucket pairs), and a cap above the
    largest testdata bucket is vacuous — bit-identical output. The
    capped plan stays Cartesian-free."""
    from tabsketchfm_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf01, "documents")
    full = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    capped_df = minhash_lsh_pairs(docs, threshold=0.5, bucket_cap=2)
    p = _plan(capped_df)
    assert "Cartesian" not in p and "NestedLoop" not in p
    capped = {(r.id_a, r.id_b): r.est_jaccard for r in capped_df.collect()}
    assert set(capped) <= set(full)
    assert all(full[k] == v for k, v in capped.items())
    vacuous = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.5, bucket_cap=10**6).collect()
    }
    assert vacuous == full


def test_embedding_cap_subset_and_vacuous(spark, sf01):
    """Same contract for the RH-LSH embedding near-dup cap."""
    from tabsketchfm_spark.operators.vector import embedding_near_dups

    emb = load_table(spark, sf01, "embeddings")
    full = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_near_dups(emb, threshold=0.35).collect()
    }
    capped_df = embedding_near_dups(emb, threshold=0.35, bucket_cap=32)
    p = _plan(capped_df)
    assert "Cartesian" not in p and "NestedLoop" not in p
    capped = {(r.id_a, r.id_b): r.cos for r in capped_df.collect()}
    assert set(capped) <= set(full)
    assert all(full[k] == v for k, v in capped.items())
    vacuous = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_near_dups(emb, threshold=0.35, bucket_cap=10**6).collect()
    }
    assert vacuous == full


def test_adaptive_salt_only_on_hot_keys(spark, sf01):
    """Skew-adaptive salting: only keys over the heavy-hitter threshold
    are salted — the build side carries (n_salts−1)×|hot| extra rows,
    not (n_salts−1)×|orders| — and the aggregate is bit-identical to
    the fixed-salt form. Join stays a shuffle join on the composite
    key with the dims broadcast."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.operators.analytics import (
        salted_join_agg,
        salted_join_agg_adaptive,
    )
    from tabsketchfm_spark.sources.tables import load_table as lt

    n_salts, thr = 8, 5
    adf = salted_join_agg_adaptive(spark, sf01, n_salts=n_salts, hot_threshold=thr)
    p = _plan(adf)
    assert "BroadcastHashJoin" in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)
    assert "Cartesian" not in p and "NestedLoop" not in p

    fixed = {tuple(r) for r in salted_join_agg(spark, sf01).collect()}
    adaptive = {tuple(r) for r in adf.collect()}
    assert adaptive == fixed

    # replication accounting: hot keys measured independently
    li = lt(spark, sf01, "lineitem")
    n_hot = (
        li.groupBy("l_orderkey").count().where(F.col("count") > thr).count()
    )
    n_orders = lt(spark, sf01, "orders").count()
    hot = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_kc"))
        .where(F.col("_kc") > thr)
        .select("l_orderkey", F.lit(True).alias("is_hot"))
    )
    build = (
        lt(spark, sf01, "orders")
        .join(
            F.broadcast(hot.withColumnRenamed("l_orderkey", "o_orderkey")),
            "o_orderkey",
            "left",
        )
        .withColumn(
            "salt",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.when(F.col("is_hot"), F.lit(n_salts - 1)).otherwise(F.lit(0)),
                )
            ),
        )
    )
    assert n_hot > 0  # threshold actually splits the testdata key set
    assert build.count() == n_orders + (n_salts - 1) * n_hot


def test_registry_invariants():
    """Contract-surface guards for future rounds: every oracle key has
    a query, the driver window is exactly the first 50 registered
    names with no duplicates, and every window entry is oracle-checked
    (the window exists to produce bit-exact CORRECTNESS rows)."""
    from tabsketchfm_spark.plans import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    assert set(oracles) <= set(qs)
    window = registry._DRIVER_WINDOW
    assert len(window) == 50 and len(set(window)) == 50
    assert list(qs)[:50] == window
    missing = [n for n in window if n not in oracles]
    assert not missing, f"window entries without oracles: {missing}"


def _walk_jplan(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk_jplan(node.children().apply(i))


def _subtree_has_limit(node) -> bool:
    return any(
        ("TakeOrderedAndProject" in n.getClass().getSimpleName())
        or ("Limit" in n.getClass().getSimpleName())
        for n in _walk_jplan(node)
    )


def _partitionless_window_violations(df) -> list[str]:
    """Partition-less WindowExec nodes whose input is NOT capped by a
    limit — the single-partition anti-pattern. Uses sparkPlan (pre-AQE
    wrapping) so the whole tree is traversable."""
    bad = []
    for n in _walk_jplan(df._jdf.queryExecution().sparkPlan()):
        cls = n.getClass().getSimpleName()
        if cls != "WindowExec":
            continue
        spec = n.partitionSpec()
        # an all-FOLDABLE partition spec (e.g. lit(0)) is semantically
        # partition-less — every row hashes to one partition; treat it
        # exactly like an empty spec so the ranked_topk idiom can't be
        # copied over an unlimited input unnoticed
        foldable_only = all(
            spec.apply(i).foldable() for i in range(spec.size())
        )
        if foldable_only and not _subtree_has_limit(n):
            bad.append(n.toString().splitlines()[0])
    return bad


# Building these triggers full execution (stream runs, MLlib fits,
# driver-side training loops) — each returns a local/driver-assembled
# result whose plan is a LocalTableScan, so there is nothing to guard
# and no reason to pay their runtime twice per test session.
_PLAN_GUARD_SKIP_PREFIXES = ("stream_",)
_PLAN_GUARD_SKIP = {
    "j4_mllib_minhash_dedup",
    "k6_ivf_kmeans_ann",
    "k6_mllib_brp_ann",
    "m4m_mllib_mlp_length",
    "m5_pretrain_curve",
    "m5f_pretrain_curve_full",
    "m6_finetune_eval",
    "m6t_pair_scores_trained_customer",
    # eager at plan-BUILD time (driver loops / per-round collects /
    # localCheckpoint jobs) — building them IS running them, and the
    # result is a LocalTableScan or a checkpoint-rooted plan with
    # nothing left to guard; their window hygiene is covered by their
    # own operator tests
    "bpe_merges_documents",
    "bpe_token_counts_documents",
    "bpe_vocab_curve_documents",
    "k1t_embeddings_trained_customer",
    "k4_unionability_trained_customer",
    "layout_zone_map_audit",
    "k3g_table_pagerank",
    "k3h_table_communities",
    "dedup_clusters_documents",
    "dedup_clusters_labelprop_documents",
    "dedup_clusters_incremental_documents",
    "store_clusters_update_documents",
    "store_clusters_compact_documents",
    "crawl_retention_sweep_documents",
    # round-7 eager additions: perceptron training runs its epoch
    # collects at build; the cluster split runs the full star-
    # contraction clustering (checkpoint jobs) at build
    "quality_perceptron_scores_documents",
    "mix_classifier_guided_documents",
    "multiclass_perceptron_lenclass_documents",
    "s9c_split_by_cluster_documents",
    # round-7 session-2: margin/averaged perceptron and tree induction
    # run their training aggregates at build
    "quality_perceptron_margin_documents",
    "quality_tree_scores_documents",
    "quality_boost_scores_documents",
    "quality_perceptron_cv_documents",
    "quality_tree_cv_documents",
    "quality_boost_cv_documents",
    "quality_model_selection_documents",
    "cluster_kmeans_k_selection_embeddings",
    # round-8: the store-backed learners loop buckets and read/write
    # their persisted state at build; the stored-index serve
    # materializes its bounded top-k before dropping the store dir
    "store_kmeans_update_embeddings",
    "store_perceptron_update_documents",
    # round-11: the gated run loops buckets with per-batch decision
    # collects + store writes at build — eager by lifecycle
    "store_perceptron_autorefresh_documents",
    "ann_ivfpq_stored_topk",
    "ann_ivfpq_index_drift",
    # round-9 store maintenance: append encodes + collects the stored
    # codes, compaction rewrites the store, both before dropping the
    # temp store dir — eager by lifecycle, window hygiene covered by
    # their operator tests and the shared search/dedup plans
    "ann_ivfpq_store_append",
    "ann_ivfpq_store_delete",
    # round-11: re-encode warm-fits + rewrites the store, autorefresh
    # additionally collects its N_CELLS-row drift decision — all
    # before dropping the temp store dir; eager by lifecycle, same as
    # the append/delete siblings
    "ann_ivfpq_store_reencode",
    "ann_ivfpq_autorefresh_hot",
    "ann_ivfpq_autorefresh_cold",
    "sig_store_compact_documents",
    "sig_store_ttl_ts_documents",
    # round-12 maintenance composites: the kmeans autorefresh folds +
    # retargets its k-row persisted state (decision collect + store
    # write at build), the re-shingle learns merges driver-side and
    # rebuilds the signature store before dropping the temp dir —
    # eager by lifecycle, same as their store-family siblings
    "store_kmeans_autorefresh_hot",
    "store_kmeans_autorefresh_cold",
    "sig_store_reshingle_documents",
    # round-12: two store lifecycles + a driver-side merge learn +
    # a reshingle, all folded before the temp dirs drop — eager
    "crawl_tokenizer_rollout_documents",
    "pipeline_rag_topk_documents",
    "stream_ivfpq_append_embeddings",
    "stream_crawl_clusters_documents",
    "ann_ivfpq_recon_error",
    # SCHEMA-derived driver-local frames (createDataFrame over static
    # schema constants — python createDataFrame plans as an RDD scan
    # of literal rows): no data computation, nothing to guard. Found
    # by the is-eager probe below.
    "t1_sorted_columns",
    "sk5_aug_column_order",
}

# SCHEMA-BOUNDED exemptions: these queries number ONE table's token
# sequence (input rows = Σ column-name tokens over the profiled
# schema — a function of column COUNT, not row count, so the window
# input does not grow with data volume; the reference's tokenizer is
# likewise per-table). Lake-wide token assembly goes through the
# per-table applyInPandas path (ml/mlm.mlm_batches), never these
# global windows.
_PLAN_GUARD_SCHEMA_BOUNDED = {
    "m8_mask_plan_customer",
    "m8a_mlm_batch_customer",
    "m9_token_features_customer",
    "m9_token_features_subword_customer",
    "m8_mask_plan_subword_customer",
    "m10_pair_tokens_customer_supplier",
    "m10_pair_tokens_subword_customer_supplier",
    "m9_token_features_hv_customer",
    "m10_pair_tokens_hv_customer_supplier",
}


def test_no_registered_query_plans_unbounded_global_window(spark, sf01):
    """Registry-wide scale guard (round-4 verdict): NO registered query
    may plan a partition-less row_number window over an input that is
    not already capped by a limit/TakeOrderedAndProject. ranked_topk's
    post-limit window passes; a bare global sort window fails.

    Each guarded query's returned plan is also checked by an IS-EAGER
    PROBE: a plan whose every LEAF is materialized (LocalTableScan /
    RDD scan) AND that does no distributed work on top (no Exchange,
    no Window) means the build already RAN the computation — the
    window check on it is vacuous, so the query BELONGS in
    _PLAN_GUARD_SKIP with a reason. The distributed-work condition
    keeps localCheckpoint-rooted lazy plans (RDD-scan leaves, real
    computation above) guarded rather than funneled into the skip
    list. The probe makes the
    hand list verified-complete: a new fully-eager registration left
    off the list fails here loudly instead of passing silently (and
    costing the suite its training runtime every guard run). Queries
    with build-time calibration collects but a real distributed result
    plan (threshold probes, bloom builds, split boundaries) are NOT
    flagged — their returned plan is exactly what the guard exists to
    check."""
    from concurrent.futures import ThreadPoolExecutor

    from tabsketchfm_spark.plans import registry

    failures = {}
    unmarked_eager = {}

    from tests.oracle_util import built_query

    def _check(item):
        name, fn = item
        # shared build cache with the parity sweep (suite-budget item):
        # same (name, sf) plan either way, analyzed once per session
        df = built_query(spark, sf01, name)
        nodes = list(_walk_jplan(df._jdf.queryExecution().sparkPlan()))
        leaves = [n for n in nodes if n.children().size() == 0]
        mat = [
            n.getClass().getSimpleName()
            for n in leaves
            if n.getClass().getSimpleName() in ("LocalTableScanExec", "RDDScanExec")
            or "ExistingRDD" in n.getClass().getSimpleName()
        ]
        # RDDScanExec leaves are NOT proof of driver materialization:
        # a localCheckpoint()ed distributed frame (the lineage-control
        # pattern) also plans as an RDD scan, and anything built on it
        # is exactly what the window guard exists to check. A plan is
        # vacuously-checked only when every leaf is materialized AND
        # nothing distributed (Exchange/Window) runs on top.
        distributed_work = any(
            "Exchange" in n.getClass().getSimpleName()
            or "Window" in n.getClass().getSimpleName()
            for n in nodes
        )
        eager = (
            sorted(set(mat))
            if leaves and len(mat) == len(leaves) and not distributed_work
            else None
        )
        return name, eager, _partitionless_window_violations(df)

    todo = [
        (name, fn)
        for name, fn in registry.queries().items()
        if not (
            name in _PLAN_GUARD_SKIP
            or name in _PLAN_GUARD_SCHEMA_BOUNDED
            or name.startswith(_PLAN_GUARD_SKIP_PREFIXES)
        )
    ]
    # thread pool: the per-query work is Catalyst analysis + py4j plan
    # walks (JVM-side, GIL released) — serial, this test was the
    # suite's single most expensive item (144s; round-8 verdict item
    # 4). Build-time fit memos may double-fit under a race, which is
    # deterministic-identical wasted work, never a wrong result.
    with ThreadPoolExecutor(max_workers=12) as pool:
        for name, eager, bad in pool.map(_check, todo):
            if eager is not None:
                unmarked_eager[name] = eager
            if bad:
                failures[name] = bad
    assert not failures, f"unbounded global windows: {failures}"
    assert not unmarked_eager, (
        "these queries returned fully driver-materialized plans (eager "
        "build) but are not in _PLAN_GUARD_SKIP — add them with a "
        f"reason: {unmarked_eager}"
    )


def test_plan_guard_skip_list_is_not_stale():
    """Every hand-listed skip entry must still name a registered query
    — a rename or deregistration must clean its skip row, or the guard
    silently guards less than the list claims."""
    from tabsketchfm_spark.plans import registry

    names = set(registry.queries())
    stale = (_PLAN_GUARD_SKIP | _PLAN_GUARD_SCHEMA_BOUNDED) - names
    assert not stale, f"skip-list entries no longer registered: {stale}"
    for p in _PLAN_GUARD_SKIP_PREFIXES:
        assert any(n.startswith(p) for n in names), f"stale skip prefix: {p}"


def test_pmi_topk_uses_distributed_topk(spark, sf01):
    """Regression (round-4 review): the PMI ranking must compile to a
    TakeOrdered, not a single-partition global-sort window."""
    from tabsketchfm_spark.operators.text import pmi_topk

    p = _plan(pmi_topk(load_table(spark, sf01, "documents")))
    assert "TakeOrdered" in p


def test_rows_only_set_is_pinned():
    """Every query without an oracle is one of the DOCUMENTED
    rows-only cases (RNG-seeded MLlib twins, the mapInPandas model and
    media stages, the HLL approx twin). A new unoracled registration
    must be a conscious decision, not an accidental drop."""
    from tabsketchfm_spark.plans import registry

    rows_only = set(registry.queries()) - set(registry.oracle_sql())
    assert rows_only == {
        "a2s_approx_distinct_lineitem",
        "j4_mllib_minhash_dedup",
        "k1_embeddings_customer",
        "k2_merged_embeddings_customer",
        "k6_ivf_kmeans_ann",
        "k6_mllib_brp_ann",
        "mm_media_features",
        # the numpy model stack: inference/training outputs are not
        # SQL-expressible (M4's closed-form forward IS, and is oracled)
        "m3_mlm_eval_tables",
        "m5_pretrain_curve",
        "m5f_pretrain_curve_full",
        "k1t_embeddings_trained_customer",
        "k4_unionability_trained_customer",
        "m6_finetune_eval",
        "m4m_mllib_mlp_length",  # MLlib MLP: seeded RNG init
        # trained-head pair scoring: the head forward runs on trained
        # (non-closed-form) weights; its SQL-expressible pooled-feature →
        # linear-head algebra stage is oracle-pinned separately
        # (m6h_head_scores_customer)
        "m6t_pair_scores_trained_customer",
    }


def test_registered_queries_are_run_deterministic(spark, sf01):
    """The partition-order-free claim, executed: representative
    registered queries produce IDENTICAL row sets across two runs in
    one session (float sums via exact decimals / sorted aggregates,
    hashes seeded — nothing may depend on task scheduling)."""
    from concurrent.futures import ThreadPoolExecutor

    from tabsketchfm_spark.plans import registry

    qs = registry.queries()

    def _twice(name):
        r1 = {tuple(r) for r in qs[name](spark, sf01).collect()}
        r2 = {tuple(r) for r in qs[name](spark, sf01).collect()}
        return name, r1 == r2

    names = [
        "a1a8_profile_customer",
        "dedup_minhash_lsh_documents",
        "text_unigram_logppl",
        "k3c_join_cardinality_estimate",
        "k3g_table_pagerank",
        "cdc_latest_state_events",
        # rows-only queries get only a weak driver check — determinism
        # across runs is their main reproducibility claim
        "m3_mlm_eval_tables",
    ]
    # concurrent queries in one local session are independent Spark
    # jobs — run-determinism is exactly what the test asserts, so
    # concurrency only ever makes it STRICTER
    with ThreadPoolExecutor(max_workers=4) as pool:
        for name, same in pool.map(_twice, names):
            assert same, name


def test_cdc_compaction_semantics(spark):
    """Tombstone users vanish from the latest state; SCD2 intervals
    tile each user's timeline and tombstones only CLOSE intervals."""
    from tabsketchfm_spark.operators.structural import (
        cdc_latest_state,
        cdc_scd2_history,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
        (2, "2024-01-02 00:00:00", 10, "click", 2.0, None),
        (3, "2024-01-01 00:00:00", 20, "view", 3.0, None),
        (4, "2024-01-03 00:00:00", 20, "error", None, None),  # tombstone last
        (5, "2024-01-02 00:00:00", 30, "error", None, None),
        (6, "2024-01-04 00:00:00", 30, "purchase", 4.0, None),  # resurrected
    ]
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    latest = {r["user_id"]: r for r in cdc_latest_state(ev).collect()}
    assert set(latest) == {10, 30}  # 20 deleted, 30 resurrected
    assert latest[10]["last_type"] == "click"
    assert latest[30]["last_type"] == "purchase"
    hist = cdc_scd2_history(ev).collect()
    by_user = {}
    for r in hist:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 20: one interval, CLOSED by the tombstone, not current
    (u20,) = by_user[20]
    assert u20["valid_to"] is not None and not u20["is_current"]
    # user 10: click interval open
    assert sum(1 for r in by_user[10] if r["is_current"]) == 1


def test_table_pagerank_ranks_hub_tables(spark, sf01):
    """The joinability graph's hubs (key-rich fact/dim tables) must
    outrank leaf tables; ranks are the full table set, all positive."""
    from tabsketchfm_spark.plans import registry

    rows = registry.queries()["k3g_table_pagerank"](spark, sf01).collect()
    pr = {r["table_name"]: r["pagerank"] for r in rows}
    assert len(pr) == 8  # ALL_PAIR_TABLES
    assert all(v > 0 for v in pr.values())
    # orders shares keys with customer AND lineitem — it must beat the
    # region leaf
    assert pr["orders"] > pr["region"]
