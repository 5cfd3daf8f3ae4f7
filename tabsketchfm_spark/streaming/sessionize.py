"""Custom stateful streaming operator: event sessionization via
``applyInPandasWithState`` (SURVEY §2.11 extension — the
arbitrary-stateful-op face of the engine).

Semantics: per user, events more than ``gap_s`` apart start a new
session. A session is EMITTED when a later event closes it; the
still-open session stays in state (and is never emitted by an
availableNow run — bounded-state streaming semantics). The batch
oracle is therefore "all sessions except each user's last", which a
lag/cumsum SQL window computes exactly.

State per key is three scalars (start, last, count, index) — the
bounded-state shape that scales to any key cardinality on a real
cluster's state store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tabsketchfm_spark.streaming.profile_stream import _events_stream, _run_to_memory

GAP_S = 86400.0

OUT_SCHEMA = (
    "user_id bigint, session_idx int, start_epoch double, end_epoch double, "
    "n_events bigint"
)
STATE_SCHEMA = "start double, last double, n bigint, idx int"


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # epoch seconds via integer micros (ns/1e9 rounds differently than
    # the oracle's micros/1e6 — last-ulp mismatch); normalize to [us]
    # at the numpy level so the pandas datetime unit (ns or us) doesn't
    # matter AND pandas 1.x (which only supports ns Series) still works
    import numpy as np

    ts = np.asarray(rows["ts"]).astype("datetime64[us]").astype("int64") / 1e6
    if state.exists:
        start, last, n, idx = state.get
    else:
        start, last, n, idx = None, None, 0, 0
    out = []
    for t in ts:
        if last is not None and t - last > GAP_S:
            idx += 1
            out.append((user_id, idx, start, last, n))
            start, n = t, 0
        if start is None:
            start = t
        last = t
        n += 1
    state.update((start, last, n, idx))
    yield pd.DataFrame(
        out, columns=["user_id", "session_idx", "start_epoch", "end_epoch", "n_events"]
    )


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    s = _events_stream(spark, sf_dir)
    sess = s.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(sess, "append")


def streaming_sessionize_oracle_sql() -> str:
    return f"""
WITH e AS (SELECT user_id, event_id, epoch(ts) AS t FROM events),
s AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > {GAP_S}
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM s),
agg AS (SELECT user_id, sid, min(t) AS start_epoch, max(t) AS end_epoch,
               count(*) AS n_events
        FROM g GROUP BY 1, 2),
last AS (SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY 1)
SELECT a.user_id, CAST(a.sid AS INTEGER) AS session_idx,
       a.start_epoch, a.end_epoch, a.n_events
FROM agg a JOIN last l ON a.user_id = l.user_id AND a.sid < l.last_sid
"""


CUSUM_K = 50.0
CUSUM_H = 200.0

CUSUM_OUT_SCHEMA = "user_id bigint, n_alarms bigint, max_s double"
# (S_last, runmin_last, s_last, n_alarms, max_s): the reflected-walk
# identity s = S - least(runmin, 0) is MERGEABLE across batches — the
# stored cumulative sum and running minimum continue the walk exactly
CUSUM_STATE_SCHEMA = "S double, runmin double, s_last double, n_alarms bigint, max_s double"


def _cusum(key, pdfs, state):
    """Per-user CUSUM kept as streaming state. Inside the batch the
    SAME reflected-walk algebra as the batch operator runs over the
    (ts, event_id)-sorted rows — numpy cumsum adds left-to-right in
    the identical order as the SQL running-sum window, so a completed
    availableNow run is bit-equal to batch cusum_drift (the oracle)."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    rows = rows[rows["value"].notna()]
    if state.exists:
        S0, rm0, s_prev, n_alarms, max_s = state.get
    else:
        S0, rm0, s_prev, n_alarms, max_s = 0.0, np.inf, 0.0, 0, -np.inf
    d = rows["value"].astype("float64").to_numpy() - CUSUM_K
    S = S0 + np.cumsum(d)
    runmin = np.minimum.accumulate(np.minimum(S, rm0))
    s = S - np.minimum(runmin, 0.0)
    prev = np.concatenate(([s_prev], s[:-1]))
    n_alarms = int(n_alarms + int(np.sum((s > CUSUM_H) & (prev <= CUSUM_H))))
    if len(s):
        max_s = max(max_s, float(s.max()))
        state.update((float(S[-1]), float(runmin[-1]), float(s[-1]), n_alarms, max_s))
    if not np.isfinite(max_s):
        # user contributed no non-null values yet — nothing to report
        # (the batch oracle has no row for them either)
        yield pd.DataFrame(columns=["user_id", "n_alarms", "max_s"])
        return
    yield pd.DataFrame(
        [(user_id, n_alarms, round(max_s, 6))],
        columns=["user_id", "n_alarms", "max_s"],
    )


def streaming_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming drift detection: the W5 CUSUM as an
    applyInPandasWithState operator with O(1) per-user state — the
    always-on monitor version of the batch window query."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    s = _events_stream(spark, sf_dir)
    out = s.groupBy("user_id").applyInPandasWithState(
        _cusum,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # each microbatch emits the user's CUMULATIVE counters; under a
    # multi-batch source (maxFilesPerTrigger, split files) earlier
    # batches' rows remain in the sink, so reduce to the final state —
    # both counters are monotone nondecreasing, making MAX exact
    return _run_to_memory(out, "append").groupBy("user_id").agg(
        F.max("n_alarms").alias("n_alarms"), F.max("max_s").alias("max_s")
    )
