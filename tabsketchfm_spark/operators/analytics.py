"""Multi-join analytical queries over the star schema.

The reference performs no relational joins over data rows (SURVEY
§2.5) — these queries exist to exercise the ENGINE's join planning at
scale: dimension tables broadcast, the fact table never shuffles for
them, AQE picks the final shapes. Revenue math is exact decimal
(order-free, oracle-identical).

Also here: Bloom-filter semi-join pruning — at 100 TB the win is
filtering the fact scan BEFORE the shuffle with a compact filter built
from the dimension side (Spark's bloom_filter_agg / might_contain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tabsketchfm_spark.sources.tables import load_table


def shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING") -> DataFrame:
    """TPC-H Q3 shape: revenue of unshipped orders for one market
    segment. customer (dim) broadcasts into orders; lineitem joins on
    the shuffled order key; top-10 by revenue."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == segment
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    rev = (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.sum(p * (F.lit(1).cast("decimal(18,2)") - d))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    from tabsketchfm_spark.functions.ranking import ranked_topk

    top = ranked_topk(rev, [F.desc("revenue"), F.asc("o_orderkey")], 10)
    return top.select("rank", "o_orderkey", "o_orderpriority", "revenue", "n_items")


def shipping_priority_oracle_sql(segment: str = "BUILDING") -> str:
    return f"""
WITH rev AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
              AS DOUBLE) AS revenue,
         count(*) AS n_items
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = '{segment}'
  GROUP BY 1, 2)
SELECT CAST(row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS INTEGER) AS rank,
       o_orderkey, o_orderpriority, revenue, n_items
FROM rev
QUALIFY rank <= 10
"""


def nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by customer nation (4-way join; every
    dimension broadcasts, lineitem shuffles once on its join key)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
                            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
                            .select("o_orderkey", "n_name")),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.sum(p * (F.lit(1).cast("decimal(18,2)") - d)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def nation_volume_oracle_sql() -> str:
    return """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


BLOOM_BITS = 1 << 18  # 262,144 bits = 4,096 words
BLOOM_K = 3


def _bloom_positions(key_expr: str, dialect: str) -> list[str]:
    """k bit positions for a key — md5-seeded, identical cross-engine."""
    from tabsketchfm_spark.functions.hashing import h32_sql

    cast_t = "STRING" if dialect == "spark" else "VARCHAR"
    out = []
    for j in range(BLOOM_K):
        seeded = "concat('b" + str(j) + "|', CAST(" + key_expr + f" AS {cast_t}))"
        out.append(f"({h32_sql(seeded, dialect)} % {BLOOM_BITS})")
    return out


def bloom_prejoin_count(
    spark: SparkSession,
    sf_dir: str,
    status: str = "F",
) -> DataFrame:
    """Bloom-filter pre-join pruning, built in pure SQL: the dimension
    side's keys set k md5-derived bits in a 2^18-bit filter (bit_or
    aggregate over 64-bit words), the filter ships to the fact scan as
    a literal array, and rows failing any bit are dropped BEFORE any
    join/shuffle. At 100 TB this is the broadcast-filter-into-the-scan
    pattern that cuts the fact shuffle by the join's selectivity.

    Deterministic by construction (unlike Spark's internal
    bloom_filter_agg), so the DuckDB oracle reproduces the exact
    counts. Output: (bloom_pruned_cnt, exact_cnt, fp_overhead).
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == status
    )
    li = load_table(spark, sf_dir, "lineitem")

    # build: (word_idx, word) rows — tiny aggregate, collected once
    # 63 usable bits per word: bit 63 would overflow DuckDB's checked
    # left shift (and flip the sign bit JVM-side)
    pos_union = None
    for p in _bloom_positions("o_orderkey", "spark"):
        d = orders.select(F.expr(p).alias("pos"))
        pos_union = d if pos_union is None else pos_union.unionByName(d)
    words = (
        pos_union.groupBy((F.col("pos") / 63).cast("int").alias("w"))
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 63 as int)))").alias("bits"))
        .collect()
    )
    word_arr = [0] * (BLOOM_BITS // 63 + 1)
    for r in words:
        word_arr[r.w] = r.bits

    bf = F.array(*[F.lit(x) for x in word_arr])
    checks = None
    for p in _bloom_positions("l_orderkey", "spark"):
        c = F.expr(
            f"(bf[cast(({p}) / 63 as int)] >> cast(({p}) % 63 as int)) & 1 = 1"
        )
        checks = c if checks is None else (checks & c)
    pruned_cnt = (
        li.withColumn("bf", bf)
        .where(checks)
        .agg(F.count(F.lit(1)).alias("bloom_pruned_cnt"))
    )
    exact_cnt = li.join(
        orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    ).agg(F.count(F.lit(1)).alias("exact_cnt"))
    return pruned_cnt.crossJoin(exact_cnt).select(
        "bloom_pruned_cnt",
        "exact_cnt",
        F.round(
            (F.col("bloom_pruned_cnt") - F.col("exact_cnt")) / F.col("exact_cnt"), 6
        ).alias("fp_overhead"),
    )


def bloom_prejoin_oracle_sql(status: str = "F") -> str:
    opos = _bloom_positions("o_orderkey", "duckdb")
    lpos = _bloom_positions("l_orderkey", "duckdb")
    pos_union = "\nUNION ALL\n".join(
        f"SELECT {p} AS pos FROM orders WHERE o_orderstatus = '{status}'" for p in opos
    )
    checks = " AND ".join(
        f"coalesce((SELECT bits FROM words WHERE w = CAST(({p}) // 63 AS INTEGER)), 0)"
        f" >> CAST(({p}) % 63 AS INTEGER) & 1 = 1"
        for p in lpos
    )
    return f"""
WITH pos AS ({pos_union}),
words AS (SELECT CAST(pos // 63 AS INTEGER) AS w,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
          FROM pos GROUP BY 1),
pruned AS (SELECT count(*) AS bloom_pruned_cnt FROM lineitem WHERE {checks}),
exact AS (SELECT count(*) AS exact_cnt FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                               WHERE o_orderstatus = '{status}'))
SELECT bloom_pruned_cnt, exact_cnt,
       round((bloom_pruned_cnt - exact_cnt) / CAST(exact_cnt AS DOUBLE), 6)
         AS fp_overhead
FROM pruned, exact
"""


def salted_join_agg(
    spark: SparkSession, sf_dir: str, n_salts: int = 8
) -> DataFrame:
    """Skew-proof large-large join: revenue per customer market
    segment via lineitem ⋈ orders ⋈ customer, with the
    lineitem→orders join SALTED.

    The skew pattern at 100 TB: a handful of hot join keys overload
    single reducers. Salting splits each hot key's rows across
    ``n_salts`` reducers: the FACT side gets a deterministic salt
    derived from a non-join column (xxhash64 of line number — no
    rand(), so retries/speculative tasks recompute identically,
    SURVEY §7.5 risk 6), the BUILD side is replicated n_salts× with
    explode(sequence(...)), and the join key becomes (key, salt). The
    aggregate after it is unchanged — results are bit-identical to the
    unsalted plan, which is exactly what the DuckDB oracle runs.
    AQE's skewedJoin handles moderate skew automatically; explicit
    salting is the deterministic fallback for pathological keys.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(18,2)")
                - F.col("l_discount").cast("decimal(18,2)")
            )
        ).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    fact = lineitem.withColumn(
        "salt", F.pmod(F.xxhash64("l_linenumber"), F.lit(n_salts)).cast("int")
    )
    build = orders.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # salting only matters when the build side is beyond broadcast
    # size; the merge hint pins that scale shape (shuffle on the
    # composite key) so the plan exercised here is the 100 TB plan,
    # not the small-data broadcast Catalyst would pick at sf0.01
    joined = fact.join(
        build.hint("merge"),
        (fact["l_orderkey"] == build["o_orderkey"]) & (fact["salt"] == build["salt"]),
    )
    return (
        joined.join(F.broadcast(customer), joined["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
        .select("c_mktsegment", "revenue", "line_cnt")
    )


def salted_join_agg_adaptive(
    spark: SparkSession,
    sf_dir: str,
    n_salts: int = 8,
    hot_threshold: int = 5,
    sample_mod: int = 1,
) -> DataFrame:
    """Skew-ADAPTIVE salted join: the salt width follows the measured
    skew instead of a fixed factor. A cheap heavy-hitter pre-pass
    (deterministic hash-sample of the fact side — ``sample_mod=1``
    reads everything, at 100 TB set ~100 for a 1% sample) finds join
    keys with more than ``hot_threshold`` (sampled) rows; ONLY those
    keys get salted. Cold keys keep salt 0, so the build side is
    replicated just (n_salts−1)×|hot keys| extra rows instead of
    (n_salts−1)×|orders| — the fixed-salt variant's cost — while hot
    keys still fan across ``n_salts`` reducers. The hot-key set is a
    heavy-hitter relation by construction (tiny), so it broadcasts to
    tag both sides. Results are bit-identical to the unsalted join —
    the same DuckDB oracle as the fixed-salt query.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(18,2)")
                - F.col("l_discount").cast("decimal(18,2)")
            )
        ).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    sample = lineitem
    if sample_mod > 1:
        # deterministic row sample — retries recompute the same set
        sample = lineitem.where(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(sample_mod)) == 0
        )
    hot = (
        sample.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_kc"))
        .where(F.col("_kc") > hot_threshold)
        .select("l_orderkey", F.lit(True).alias("is_hot"))
    )

    fact = lineitem.join(F.broadcast(hot), "l_orderkey", "left").withColumn(
        "salt",
        F.when(
            F.col("is_hot"),
            F.pmod(F.xxhash64("l_linenumber"), F.lit(n_salts)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    build = (
        orders.join(
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
        .drop("is_hot")
    )
    joined = fact.join(
        build.hint("merge"),
        (fact["l_orderkey"] == build["o_orderkey"]) & (fact["salt"] == build["salt"]),
    )
    return (
        joined.join(F.broadcast(customer), joined["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
        .select("c_mktsegment", "revenue", "line_cnt")
    )


def salted_join_agg_oracle_sql() -> str:
    """The UNSALTED equivalent — salting must not change results."""
    return """
SELECT c_mktsegment,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       count(*) AS line_cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def large_order_customers(
    spark: SparkSession, sf_dir: str, min_qty: int = 250
) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed min_qty total
    quantity. The HAVING filter runs on the lineitem aggregate BEFORE
    any join, so only qualifying orderkeys (a tiny set at any scale —
    the predicate is selective by construction) reach the join; that
    set broadcasts against orders, and the customer dim broadcasts
    last. lineitem shuffles exactly once, on its group key."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"))
        .where(F.col("_sq") > min_qty)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("_sq").cast("double").alias("sum_qty"),
        )
    )


def large_order_customers_oracle_sql(min_qty: int = 250) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {min_qty})
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
       CAST(sq AS DOUBLE) AS sum_qty
FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


def returned_item_revenue(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue on returned items.
    Ranking happens on the EXACT decimal revenue with a c_custkey
    tie-break (double cast only in the final projection) so the top-k
    cut is partition-order-free. ranked_topk keeps the cut distributed
    (TakeOrderedAndProject heaps) — the per-customer aggregate is one
    row per customer, which at lake scale is far too many for a bare
    global window."""
    from tabsketchfm_spark.functions.ranking import ranked_topk

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    rev = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(p * (F.lit(1).cast("decimal(18,2)") - d)).alias("_r"))
    )
    top = ranked_topk(rev, [F.desc("_r"), F.asc("o_custkey")], k)
    return top.join(F.broadcast(cust), top.o_custkey == cust.c_custkey).select(
        "c_custkey", "c_name", "rank", F.col("_r").cast("double").alias("revenue")
    )


def returned_item_revenue_oracle_sql(k: int = 20) -> str:
    return f"""
WITH rev AS (
  SELECT o.o_custkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
           AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R' GROUP BY 1),
ranked AS (
  SELECT o_custkey, r,
         CAST(row_number() OVER (ORDER BY r DESC, o_custkey) AS INTEGER) AS rank
  FROM rev)
SELECT c.c_custkey, c.c_name, rank, CAST(r AS DOUBLE) AS revenue
FROM ranked JOIN customer c ON ranked.o_custkey = c.c_custkey
WHERE rank <= {k}
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts widened into one column per event
    type. The value list is PINNED (not discovered) — with an explicit
    list Spark skips the extra distinct-scan job and the output schema
    is stable at any scale; the physical plan is a single hash
    aggregate over pivot-conditional counts, same as the oracle's
    conditional-aggregation form."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


def pivot_event_counts_oracle_sql() -> str:
    cols = ",\n       ".join(
        f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY user_id
"""


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations in
    one pass — Spark expands to a single Expand+hash-aggregate, the
    partial aggregation still map-side-combines before the shuffle.
    Exact decimal money sums (grouped double sums are partition-order
    nondeterministic)."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(tp).cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("o_orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


def cube_order_stats_oracle_sql() -> str:
    return """
SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
       coalesce(o_orderpriority, '<all>') AS o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set algebra over derived keysets: users who purchased
    INTERSECT users who errored, plus purchasers EXCEPT error-ers —
    labeled and unioned into one frame. Spark plans INTERSECT/EXCEPT
    as left-semi/left-anti hash joins over pre-aggregated (distinct)
    sides, so each input shuffles once on the key."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    err = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    both = purch.intersect(err).select(F.lit("purchase_and_error").alias("segment"), "user_id")
    only = purch.exceptAll(err).select(F.lit("purchase_no_error").alias("segment"), "user_id")
    return both.unionByName(only)


def user_set_ops_oracle_sql() -> str:
    return """
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT 'purchase_and_error' AS segment, user_id FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
UNION ALL
SELECT 'purchase_no_error' AS segment, user_id FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
"""


def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the two one-dimension marginals plus
    the grand total in ONE pass, WITHOUT the pairwise cells a CUBE
    would also compute: ((status), (priority), ()). Spark plans this
    as a single Expand (3 projections per input row) + hash aggregate
    with map-side partial combine — one scan, one shuffle, vs three
    separate groupBys each rescanning at 100 TB. SQL-expressed: the
    DataFrame API exposes cube/rollup but not arbitrary grouping
    sets."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
       coalesce(o_orderpriority, '<all>') AS o_orderpriority,
       count(1) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM _gs_orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""
    )


def grouping_sets_order_stats_oracle_sql() -> str:
    return """
SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
       coalesce(o_orderpriority, '<all>') AS o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


FUNNEL_STEPS = ["view", "click", "signup", "purchase"]


def funnel_counts(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Ordered funnel analysis with earliest-completion semantics: a
    user is at step k if they performed step k at-or-after their
    earliest completion of step k-1 (ties allowed — simultaneous
    events count, matching the SQL twin's >=). The product-analytics
    staple, as k tiny per-user aggregates chained by broadcastable
    joins: each stage is a conditional MIN over the user's events on
    the epoch-seconds axis (exact micros/1e6, the toolkit identity),
    so no window function and no per-user event sorting is needed.
    Output: (step, step_name, n_users) — monotonically non-increasing.
    """
    steps = steps or FUNNEL_STEPS
    e = events.select(
        F.col("user_id").alias("uid"),
        F.col("event_type").alias("et"),
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0)).alias("es"),
    )
    cur = None
    stage_counts = []
    for i, s in enumerate(steps):
        part = e.where(F.col("et") == s)
        if cur is None:
            cur = part.groupBy("uid").agg(F.min("es").alias("t"))
        else:
            cur = (
                part.join(cur.select("uid", F.col("t").alias("t_prev")), "uid")
                .where(F.col("es") >= F.col("t_prev"))
                .groupBy("uid")
                .agg(F.min("es").alias("t"))
            )
        # each stage frame feeds TWO subtrees (its count + the next
        # stage); unpersisted, stage 1 would re-execute k times and the
        # union would do O(k²) stage work
        cur = cur.persist()
        stage_counts.append(
            cur.agg(F.count(F.lit(1)).cast("int").alias("n_users")).select(
                F.lit(i + 1).alias("step"), F.lit(s).alias("step_name"), "n_users"
            )
        )
    out = stage_counts[0]
    for sc in stage_counts[1:]:
        out = out.unionByName(sc)
    return out


def funnel_counts_oracle_sql(steps: list[str] | None = None) -> str:
    steps = steps or FUNNEL_STEPS
    ctes = [
        "e AS (SELECT user_id AS uid, event_type AS et, epoch(ts) AS es FROM events)"
    ]
    prev = None
    selects = []
    for i, s in enumerate(steps):
        name = f"s{i + 1}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT uid, min(es) AS t FROM e WHERE et = '{s}' GROUP BY uid)"
            )
        else:
            ctes.append(
                f"""{name} AS (SELECT e.uid, min(es) AS t
  FROM e JOIN {prev} USING (uid)
  WHERE et = '{s}' AND es >= {prev}.t GROUP BY e.uid)"""
            )
        selects.append(
            f"SELECT {i + 1} AS step, '{s}' AS step_name, "
            f"CAST(count(*) AS INTEGER) AS n_users FROM {name}"
        )
        prev = name
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the epoch-week of
    their FIRST event; for each (cohort_week, activity_week), how many
    of the cohort were active. Weeks are arithmetic epoch buckets
    (floor(epoch/604800)) — identical in any engine and timezone,
    unlike date_trunc('week') whose week-start convention varies.
    Two shuffles: first-event per user, then the cohort×week count.
    Output: (cohort_week, activity_week, n_users)."""
    wk = (
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp"))
            / F.lit(1000000.0)
            / F.lit(604800.0)
        )
        .cast("int")
        .alias("wk")
    )
    e = events.select(F.col("user_id").alias("uid"), wk)
    first = e.groupBy("uid").agg(F.min("wk").alias("cohort_week"))
    return (
        e.join(first, "uid")
        .select("uid", "cohort_week", F.col("wk").alias("activity_week"))
        .distinct()
        .groupBy("cohort_week", "activity_week")
        .agg(F.count(F.lit(1)).cast("int").alias("n_users"))
    )


def cohort_retention_oracle_sql() -> str:
    return """
WITH e AS (SELECT user_id AS uid,
                  CAST(floor(epoch(ts) / 604800.0) AS INTEGER) AS wk
           FROM events),
first AS (SELECT uid, min(wk) AS cohort_week FROM e GROUP BY uid),
act AS (SELECT DISTINCT uid, cohort_week, wk AS activity_week
        FROM e JOIN first USING (uid))
SELECT cohort_week, activity_week, CAST(count(*) AS INTEGER) AS n_users
FROM act GROUP BY 1, 2
"""


def cooccurrence_pairs(
    spark: SparkSession,
    sf_dir: str,
    min_support: int = 2,
    k: int = 50,
) -> DataFrame:
    """Frequent item-pair mining (the A-priori L2 pass / market-basket
    staple) over order baskets: parts co-purchased in one order. The
    pair space is a SELF-JOIN WITHIN BASKETS — O(Σ basket²) with
    baskets bounded by construction (a lineitem order holds ≤7 items),
    the same bounded-block cost argument as LSH buckets and linkage
    blocks; never O(parts²). Distinct items per basket first (a
    repeated part in one order is one co-occurrence), one grouped
    count, support filter, deterministic top-k.
    Output: (part_a, part_b, n_orders, rank)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = li.select("ok", F.col("pk").alias("part_a"))
    b = li.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= min_support)
    )
    from tabsketchfm_spark.functions.ranking import ranked_topk

    return ranked_topk(
        pairs, [F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")], k
    ).select("part_a", "part_b", "n_orders", "rank")


def cooccurrence_pairs_oracle_sql(min_support: int = 2, k: int = 50) -> str:
    return f"""
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
p AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
      FROM b a JOIN b b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING count(*) >= {min_support}),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY n_orders DESC, part_a, part_b) AS INTEGER) AS rank
      FROM p)
SELECT part_a, part_b, n_orders, rank FROM r WHERE rank <= {k}
"""
