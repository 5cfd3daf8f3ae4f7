"""Window / ranking / top-k operators on the events + lineitem tables.

Covers the reference's window-shaped computations (SURVEY §2.6/§2.7):
W1/W2 running counts and per-partition positions (reference
tabular_tokenizer.py:77-80, 154-173), W4 first-match-per-group
(embedding_search.py:134-141), T4 ranked top-k
(embedding_search.py:159-161), T7 self-removal, plus the standard
analytic aggregation the bench exercises.

Timestamps are projected onto the epoch-seconds axis (exact integer
micros / 1e6) so outputs are engine-neutral doubles. Money aggregates
are summed as decimals (exact, order-independent) then cast to double
— float-sum nondeterminism across partition orders never reaches the
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch(col: str) -> F.Column:
    return F.unix_micros(F.col(col).cast("timestamp")) / F.lit(1000000.0)


def first_event_per_user(events: DataFrame) -> DataFrame:
    """W4: first event of every user (row_number == 1 by time)."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", _epoch("ts").alias("ts_epoch"), "event_type")
    )


def first_event_per_user_oracle_sql() -> str:
    return """
SELECT user_id, event_id, epoch(ts) AS ts_epoch, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events) t
WHERE rn = 1
"""


def running_user_totals(events: DataFrame, max_user: int = 20) -> DataFrame:
    """W1/W2: per-user running event count and running value sum in
    time order (the reference's cumulative column-position encodings
    are exactly this shape)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.where(F.col("user_id") < max_user).select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("running_cnt"),
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


def running_user_totals_oracle_sql(max_user: int = 20) -> str:
    return f"""
SELECT user_id, event_id,
       count(*) OVER w AS running_cnt,
       round(sum(value) OVER w, 6) AS running_value
FROM events WHERE user_id < {max_user}
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def top_users_by_value(events: DataFrame, k: int = 10) -> DataFrame:
    """T4-shape ranked top-k with an exact decimal sum."""
    totals = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    from tabsketchfm_spark.functions.ranking import ranked_topk

    top = ranked_topk(totals, [F.desc("total_value"), F.asc("user_id")], k)
    return top.select("rank", "user_id", "total_value", "n_events")


def top_users_by_value_oracle_sql(k: int = 10) -> str:
    return f"""
WITH totals AS (
  SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(*) AS n_events
  FROM events GROUP BY user_id)
SELECT CAST(row_number() OVER (ORDER BY total_value DESC, user_id) AS INTEGER) AS rank,
       user_id, total_value, n_events
FROM totals
QUALIFY rank <= {k}
"""


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation — the bench's scan+agg
    headline. Decimal sums for exactness, avg counts exact by
    sum/count of decimals."""
    d = F.col("l_discount").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    q = F.col("l_quantity").cast("decimal(18,2)")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(q).cast("double").alias("sum_qty"),
            F.sum(p).cast("double").alias("sum_base_price"),
            F.sum((p * (F.lit(1).cast("decimal(18,2)") - d))).cast("double").alias("sum_disc_price"),
            (F.sum(q).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(p).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def pricing_summary_oracle_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def serial_key_detection(df: DataFrame, table_name: str, columns: list[str]) -> DataFrame:
    """P6/W3: flag integer columns that look like serial keys —
    near-unique and correlation > 0.99 with row position (reference
    data_prep.py:218-229). Row position is the ordering by the column
    itself joined with a monotonic id is unstable under distribution;
    the engine instead defines position by value rank, making the
    statistic deterministic and shuffle-minimal."""
    from tabsketchfm_spark.functions.ranking import global_rank

    out = None
    for c in columns:
        # position = global rank by value (distributed two-phase rank;
        # tie order within equal values is arbitrary but the corr sums
        # below are invariant to permutations inside a tie group)
        d = global_rank(
            df.select(F.col(c).cast("double").alias("v")).where(F.col("v").isNotNull()),
            [F.asc("v")],
            rank_name="pos_i",
        ).withColumn("pos", F.col("pos_i").cast("double"))
        # corr from exact decimal sums: F.corr's streaming-moment merge
        # is partition-order dependent (same hardening as the profiler)
        dx = F.col("v").cast("decimal(19,6)")
        dy = F.col("pos").cast("decimal(19,6)")
        r = d.agg(
            F.lit(table_name).alias("table_name"),
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("v").alias("n_distinct"),
            F.sum(dx).cast("double").alias("sx"),
            F.sum(dy).cast("double").alias("sy"),
            F.sum(dx * dx).cast("double").alias("sxx"),
            F.sum(dy * dy).cast("double").alias("syy"),
            F.sum(dx * dy).cast("double").alias("sxy"),
        ).select(
            "table_name",
            "column_name",
            "n",
            "n_distinct",
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                ),
                6,
            ).alias("corr_with_position"),
        ).select(
            "*",
            (
                (F.col("n_distinct") / F.col("n") > 0.95)
                & (F.col("corr_with_position") > 0.99)
            ).alias("is_serial_key"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def serial_key_detection_oracle_sql(table: str, columns: list[str]) -> str:
    parts = []
    for c in columns:
        corr = (
            "(n * sxy - sx * sy) / "
            "(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        )
        parts.append(
            f"""SELECT table_name, column_name, n, n_distinct,
              round({corr}, 6) AS corr_with_position,
              (n_distinct / CAST(n AS DOUBLE) > 0.95
               AND round({corr}, 6) > 0.99) AS is_serial_key
            FROM (
              SELECT '{table}' AS table_name, '{c}' AS column_name,
                count(*) AS n, count(DISTINCT v) AS n_distinct,
                CAST(sum(CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS sx,
                CAST(sum(CAST(pos AS DECIMAL(19,6))) AS DOUBLE) AS sy,
                CAST(sum(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
                CAST(sum(CAST(pos AS DECIMAL(19,6)) * CAST(pos AS DECIMAL(19,6))) AS DOUBLE) AS syy,
                CAST(sum(CAST(v AS DECIMAL(19,6)) * CAST(pos AS DECIMAL(19,6))) AS DOUBLE) AS sxy
              FROM (SELECT CAST({c} AS DOUBLE) AS v,
                           CAST(row_number() OVER (ORDER BY {c}) AS DOUBLE) AS pos
                    FROM {table} WHERE {c} IS NOT NULL) t
            ) agg"""
        )
    return "\nUNION ALL\n".join(parts)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, the right row with the
    largest right_ts <= left_ts within the same key (the
    ticks-to-latest-quote shape). An operator Spark lacks natively —
    built MERGE-style, not as a range crossJoin: both sides union into
    one frame, one shuffle on the key, and a running last-non-null
    window carries each right payload forward to the left rows it
    covers. Cost = sort within key partitions; a naive range join is
    |L|x|R| per key. Right rows must be unique per (key, right_ts).

    Output: all left columns + matched right ``payload`` columns
    (NULL when no right row precedes the left row).
    """
    lt = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__r_{p}") for p in payload],
    )
    rt = right.select(
        *[
            (
                F.col(key)
                if c == key
                else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(p).alias(f"__r_{p}") for p in payload],
    )
    u = lt.unionByName(rt)
    # right (__tag 0) sorts before left at equal ts => right_ts == left_ts matches
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *left.columns,
        "__tag",
        *[
            F.last(f"__r_{p}", ignorenulls=True).over(w).alias(p)
            for p in payload
        ],
    )
    return carried.where(F.col("__tag") == 1).drop("__tag")


def event_hourly_asof(events: DataFrame) -> DataFrame:
    """As-of query: each event joined to the latest CLOSED hourly
    per-type snapshot (hour stats become visible at hour end — the
    feature-freshness contract of a streaming feature store). First
    hour's events have no closed snapshot => NULL."""
    hourly = events.groupBy(
        "event_type",
        (F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")).alias(
            "avail_ts"
        ),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count("value")
        ).alias("hourly_avg")
    ).withColumn("snap_ts", _epoch("avail_ts"))
    out = asof_join(
        events.select("event_id", "event_type", "ts"),
        hourly,
        key="event_type",
        left_ts="ts",
        right_ts="avail_ts",
        payload=["snap_ts", "hourly_avg"],
    )
    return out.select("event_id", "event_type", "snap_ts", "hourly_avg")


def event_hourly_asof_oracle_sql() -> str:
    return """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) + INTERVAL 1 HOUR AS avail_ts,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
           AS hourly_avg
  FROM events GROUP BY 1, 2)
SELECT e.event_id, e.event_type, epoch(h.avail_ts) AS snap_ts, h.hourly_avg
FROM events e
ASOF LEFT JOIN hourly h ON e.event_type = h.event_type AND e.ts >= h.avail_ts
"""


def range_join_follow_counts(
    events: DataFrame, window_minutes: int = 10, anchor_type: str = "error"
) -> DataFrame:
    """Binned range join: for each anchor event (event_type =
    ``anchor_type``), how many same-user events fall in
    (ts, ts + window]? The naive plan is an inequality join — a
    per-user crossJoin. BINNING makes it an equi-join: bucket both
    sides to window-sized bins; a follower of an anchor in bin b can
    only be in bin b or b+1, so the anchor side explodes to those two
    bucket keys, the join runs on (user_id, bucket), and the exact
    range predicate filters the 2x-bounded candidates. Shuffle is on
    (user, bucket) — hot users split across buckets; at 100 TB shrink
    the bin (more buckets per window => wider explode but finer
    keys) or salt inside a bucket.

    Output: (event_id, ts_epoch, n_follow) for every anchor event.
    """
    win_us = window_minutes * 60 * 1_000_000
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    anchors = ev.where(F.col("event_type") == anchor_type).select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("us").alias("a_us"),
        F.floor(F.col("us") / win_us).alias("b0"),
    )
    a2 = anchors.select(
        "a_id",
        "user_id",
        "a_us",
        F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
    )
    followers = ev.select(
        "user_id",
        F.col("us").alias("b_us"),
        F.floor(F.col("us") / win_us).alias("bucket"),
    )
    hits = (
        a2.join(followers, ["user_id", "bucket"])
        .where(
            (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") <= F.col("a_us") + win_us)
        )
        .groupBy("a_id")
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )
    # USING-style join: hits derives from anchors, so an explicit
    # anchors["a_id"] == hits["a_id"] predicate resolves to the same
    # attribute (trivially true); the name-based join disambiguates
    return (
        anchors.join(hits, "a_id", "left")
        .select(
            F.col("a_id").alias("event_id"),
            (F.col("a_us") / F.lit(1000000.0)).alias("ts_epoch"),
            F.coalesce(F.col("n_follow"), F.lit(0)).alias("n_follow"),
        )
    )


def range_join_follow_counts_oracle_sql(
    window_minutes: int = 10, anchor_type: str = "error"
) -> str:
    return f"""
SELECT a.event_id, epoch(a.ts) AS ts_epoch, count(b.event_id) AS n_follow
FROM events a
LEFT JOIN events b ON b.user_id = a.user_id
  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL {window_minutes} MINUTE
WHERE a.event_type = '{anchor_type}'
GROUP BY a.event_id, a.ts
"""


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch sessionization — the window-function face of the
    streaming applyInPandasWithState sessionizer (same semantics, ALL
    sessions emitted): per user, an event more than ``gap_s`` after
    its predecessor starts a new session; session_idx = running count
    of gap breaks. One shuffle on user_id; the cumulative sum is a
    per-user running window, never a global sort.

    Output: (user_id, session_idx, start_epoch, end_epoch, n_events).
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    marked = events.select(
        "user_id",
        "event_id",
        "ts",
        us.alias("us"),
        F.when(
            (us - F.lag(us).over(w)) > gap_s * 1_000_000, 1
        ).otherwise(0).alias("brk"),
    )
    sess = marked.withColumn("session_idx", F.sum("brk").over(wc).cast("int"))
    return sess.groupBy("user_id", "session_idx").agg(
        (F.min("us") / 1e6).alias("start_epoch"),
        (F.max("us") / 1e6).alias("end_epoch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_batch_oracle_sql(gap_s: int = 1800) -> str:
    return f"""
WITH marked AS (
  SELECT user_id, epoch(ts) AS e,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > {gap_s} THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, e,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY e
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS INTEGER) AS session_idx
  FROM marked)
SELECT user_id, session_idx, min(e) AS start_epoch, max(e) AS end_epoch,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_idx
"""


def cusum_drift(
    events: DataFrame,
    k: float = 50.0,
    h: float = 200.0,
) -> DataFrame:
    """Per-user CUSUM drift detection over the event value stream.

    The textbook recursion s_i = max(0, s_{i-1} + (x_i - k)) looks
    irreducibly stateful, but the reflected-walk identity makes it
    pure window algebra: with S_i the running sum of (x_i - k),
    s_i = S_i - least(0, running_min(S_i)) — two window passes over
    one (user, time) ordering, no recursion, no UDF. An alarm fires
    when s crosses h from below (lag-based edge detection). One
    shuffle on user_id, per-user window state O(1). Both engines
    evaluate the same double sums in the same (ts, event_id) order,
    so values are bit-identical cross-engine.

    Output: (user_id, n_alarms, max_s).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = F.col("value").cast("double") - F.lit(k)
    cum = (
        events.where(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", d.alias("d"))
        .withColumn("S", F.sum("d").over(w))
        .withColumn("runmin", F.min("S").over(w))
        .withColumn("s", F.col("S") - F.least(F.col("runmin"), F.lit(0.0)))
        .withColumn("s_prev", F.lag("s", 1, 0.0).over(wlag))
        .withColumn(
            "alarm",
            ((F.col("s") > h) & (F.col("s_prev") <= h)).cast("int"),
        )
    )
    return cum.groupBy("user_id").agg(
        F.sum("alarm").alias("n_alarms"),
        F.round(F.max("s"), 6).alias("max_s"),
    )


def cusum_drift_oracle_sql(table: str, k: float = 50.0, h: float = 200.0) -> str:
    return f"""
WITH c AS (
  SELECT user_id, ts, event_id,
         sum(CAST(value AS DOUBLE) - {k})
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
  FROM {table} WHERE value IS NOT NULL),
x AS (
  SELECT user_id, ts, event_id,
         S - least(min(S) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   0.0) AS s
  FROM c),
a AS (
  SELECT user_id, s,
         coalesce(lag(s) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS s_prev
  FROM x)
SELECT user_id,
       CAST(sum(CASE WHEN s > {h} AND s_prev <= {h} THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       round(max(s), 6) AS max_s
FROM a GROUP BY user_id
"""


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user OLS trend of the event value over time — the
    engagement-drift analytic (is this user's metric rising or
    decaying?): slope/intercept from the closed-form normal equations,
    with every Σ an EXACT decimal sum (float aggregate merges are
    partition-order dependent; exact sums are not), so the derived
    doubles are bit-identical cross-engine. One grouped aggregate, no
    window, no second pass. x is the epoch-seconds axis offset to the
    user's first event (keeps x² within decimal range and the
    intercept meaningful as 'level at first event').

    Output: (user_id, n, slope_per_day, intercept) rounded; users
    with a single event report NULL slope.
    """
    e = (
        events.where(F.col("value").isNotNull())
        .select("user_id", _epoch("ts").alias("x0"), F.col("value").cast("double").alias("y"))
    )
    base = e.groupBy("user_id").agg(F.min("x0").alias("xmin"))
    ex = e.join(base, "user_id").select(
        "user_id", (F.col("x0") - F.col("xmin")).alias("x"), "y"
    )
    d = lambda c: c.cast("decimal(38,6)")
    agg = ex.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x"))).cast("double").alias("sx"),
        F.sum(d(F.col("y"))).cast("double").alias("sy"),
        F.sum(d(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(d(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
    )
    den = agg["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (agg["n"] * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    intercept = (F.col("sy") - slope * F.col("sx")) / agg["n"]
    return agg.select(
        "user_id",
        F.col("n").cast("int").alias("n"),
        F.round(
            F.when(den != 0, slope * 86400.0), 9
        ).alias("slope_per_day"),
        F.round(F.when(den != 0, intercept), 6).alias("intercept"),
    )


def user_value_trend_oracle_sql(table: str = "events") -> str:
    return """
WITH e AS (SELECT user_id, epoch(ts) AS x0, CAST(value AS DOUBLE) AS y
           FROM events WHERE value IS NOT NULL),
b AS (SELECT user_id, min(x0) AS xmin FROM e GROUP BY 1),
ex AS (SELECT e.user_id, x0 - xmin AS x, y FROM e JOIN b USING (user_id)),
agg AS (SELECT user_id, count(*) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
        FROM ex GROUP BY 1)
SELECT user_id, CAST(n AS INTEGER) AS n,
       round(CASE WHEN n * sxx - sx * sx <> 0
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0 END, 9)
         AS slope_per_day,
       round(CASE WHEN n * sxx - sx * sx <> 0
                  THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n END, 6)
         AS intercept
FROM agg
"""
