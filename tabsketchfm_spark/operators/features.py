"""Tokenizer feature generation (M9): the sketch→tensor alignment
pipeline as DataFrame ops.

Re-designs the reference tokenizer's feature assembly
(tabular_tokenizer.py:149-274): the token sequence
[CLS, col1 name tokens, SEP, col2 name tokens, SEP, ...] with
- W1 column-position encoding: running count of SEPs + 1, zeroed on
  special tokens (tabular_tokenizer.py:77-80),
- W2 token-position-in-column: counter resetting per column
  (tabular_tokenizer.py:154-173),
- z-scored 13-slot quantile features scaled by 1e-8
  (tabular_tokenizer.py:177,231-235) aligned to each token.

Everything is window/array expressions over the profile relation —
the model-side collate (padding, masking M8) consumes this Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tabsketchfm_spark.functions.vector import zscore_sql


DEFAULT_TK_EXPR = (
    "concat(filter(split(column_name, '_'), t -> t <> ''), array('[SEP]'))"
)


def subword_tk_expr(
    merges: list[tuple[str, ...]], max_col_tokens: int = 5
) -> str:
    """Wordpiece-parity column-name tokenization (reference
    tabular_tokenizer.py:155-160 runs the pretrained AutoTokenizer over
    column names, capped at MAX_COL_TOKENS=5 at :49-62): a SQL
    expression segmenting each '_'-word of ``column_name`` under a
    learned BPE merge list (bpe.learn_merges_py over the lake's own
    column-name corpus), flattening in word order, capping at
    ``max_col_tokens``, then appending [SEP]. Pure expression — the
    chained replace() is the same oracle-exact double-space replay the
    BPE family uses, so the DuckDB twin can re-derive the merges
    itself and still match bit-for-bit."""
    enc = "concat(' ', concat_ws('  ', split(w, '')), '  </w> ')"
    chain = enc
    for s1, s2, *_ in merges:
        chain = f"replace({chain}, ' {s1}  {s2} ', ' {s1}{s2} ')"
    seg = (
        f"transform(filter(split(trim({chain}), '  '), s -> s <> '</w>'), "
        "s -> replace(s, '</w>', ''))"
    )
    words = "filter(split(column_name, '_'), t -> t <> '')"
    return (
        f"concat(slice(flatten(transform({words}, w -> {seg})), "
        f"1, {max_col_tokens}), array('[SEP]'))"
    )


def token_features(
    profile: DataFrame, tk_expr: str | None = None, keep_name: bool = False
) -> DataFrame:
    """profile (one row per column: column_name, col_idx, col_type,
    q10..q90, mean_v, std_v, min_v, max_v) → token rows:

    (position_id, token, col_encoding, token_position, type_id,
     zq_first, zq_last)

    zq_* are the first/last slots of the z-scored, 1e-8-scaled 13-slot
    quantile vector (NULL for non-numeric columns) — the scalar
    projection of the value_ids tensor the driver can hash-check.

    ``tk_expr`` overrides the column-name tokenizer (a SQL expression
    over ``column_name`` yielding the token array INCLUDING the
    trailing [SEP]); default splits on '_', subword_tk_expr() gives
    the BPE-segmented wordpiece-parity variant. ``keep_name`` appends
    the source ``column_name`` (NULL on the [CLS] row) — the join key
    the HV variant aligns per-column hashing vectors on.
    """
    qvec = (
        "array(q10, q20, q30, q40, q50, q60, q70, q80, q90, "
        "mean_v, std_v, min_v, max_v)"
    )
    z = zscore_sql(qvec)
    zscaled = f"transform({z}, x -> x / cast(100000000.0 as double))"
    toks = (
        profile.select(
            "column_name",
            "col_idx",
            "col_type",
            F.expr(
                "CASE WHEN std_v IS NULL OR std_v <= 0 THEN NULL "
                f"ELSE {zscaled} END"
            ).alias("zq"),
            F.expr(tk_expr or DEFAULT_TK_EXPR).alias("tk"),
        )
        .select(
            "column_name",
            "col_idx",
            "col_type",
            "zq",
            F.posexplode("tk").alias("tok_pos", "token"),
        )
    )
    cls = toks.sparkSession.createDataFrame(
        [(-1, "[CLS]", -1, "special", None, None, None)],
        "col_idx int, token string, tok_pos int, col_type string, "
        "zq_first double, zq_last double, column_name string",
    ).select(
        "col_idx",
        "token",
        "tok_pos",
        "col_type",
        F.col("zq_first").cast("double"),
        F.col("zq_last").cast("double"),
        "column_name",
    )
    body = toks.select(
        "col_idx",
        "token",
        "tok_pos",
        "col_type",
        F.round(F.expr("zq[0]"), 10).alias("zq_first"),
        F.round(F.expr("zq[12]"), 10).alias("zq_last"),
        "column_name",
    )
    seq = cls.unionByName(body)
    # one table's token sequence (≤ cols × 5 tokens) — bounded input,
    # so the single-partition window is the intended plan
    order = Window.orderBy(F.asc("col_idx"), F.asc("tok_pos"))
    w_run = order.rowsBetween(Window.unboundedPreceding, 0)
    out = (
        seq.withColumn("position_id", F.row_number().over(order) - 1)
        .withColumn(
            "sep_run",
            F.sum(F.when(F.col("token") == "[SEP]", 1).otherwise(0)).over(w_run),
        )
        # W1: tokens of column i carry i+1; CLS and SEP themselves carry 0
        .withColumn(
            "col_encoding",
            F.when(
                F.col("token").isin("[CLS]", "[SEP]"), F.lit(0)
            ).otherwise(F.col("sep_run") + 1),
        )
        # W2: position within the column's token run (CLS/SEP → 0)
        .withColumn(
            "token_position",
            F.when(F.col("token").isin("[CLS]", "[SEP]"), F.lit(0)).otherwise(
                F.col("tok_pos") + 1
            ),
        )
        .withColumn(
            "type_id",
            F.when(F.col("col_type") == "string", 1)
            .when(F.col("col_type") == "integer", 2)
            .when(F.col("col_type") == "float", 3)
            .when(F.col("col_type") == "date", 4)
            .otherwise(0),
        )
    )
    return out.select(
        "position_id",
        "token",
        "col_encoding",
        "token_position",
        "type_id",
        "zq_first",
        "zq_last",
        *(["column_name"] if keep_name else []),
    )


def token_features_oracle_sql(
    profile_sql: str,
    prefix_ctes: str = "",
    ntk_sql: str | None = None,
    keep_name: bool = False,
) -> str:
    """DuckDB mirror over the same profile relation (passed as SQL).

    ``ntk_sql`` overrides the column-name tokenizer: a SELECT producing
    (column_name, tk) for every profile row — used by the subword
    variant, whose tk needs a join against the BPE-segmented vocabulary
    rather than a scalar expression. ``prefix_ctes`` prepends extra
    CTEs (e.g. the merge-learning replay) to the WITH chain."""
    # LEFT join + [SEP] fallback: a column name with zero '_'-words
    # (e.g. '_') yields no ntk row but must still emit its [SEP] token
    # (the Spark side's concat over an empty word list does)
    tk_join = f"LEFT JOIN ({ntk_sql}) ntk USING (column_name)" if ntk_sql else ""
    tk_expr = (
        "coalesce(tk, ['[SEP]'])"
        if ntk_sql
        else "list_concat(list_filter(string_split(column_name, '_'), "
        "t -> t <> ''),\n                            ['[SEP]'])"
    )
    name_out = ", column_name" if keep_name else ""
    return f"""
WITH {prefix_ctes}prof AS ({profile_sql}),
qv AS (SELECT column_name, col_idx, col_type,
              [q10,q20,q30,q40,q50,q60,q70,q80,q90,mean_v,std_v,min_v,max_v] AS q,
              std_v
       FROM prof),
zs AS (SELECT *,
              list_sum(q) / 13.0 AS m,
              sqrt(list_sum(list_transform(q, x -> (x - list_sum(q)/13.0) * (x - list_sum(q)/13.0))) / 13.0) AS s
       FROM qv),
ztok AS (SELECT column_name, col_idx, col_type,
                CASE WHEN std_v IS NULL OR std_v <= 0 THEN NULL
                     ELSE list_transform(q, x -> ((x - m) / s) / 100000000.0) END AS zq,
                {tk_expr} AS tk
         FROM zs {tk_join}),
toks AS (SELECT column_name, col_idx, col_type, zq,
                unnest(tk) AS token,
                generate_subscripts(tk, 1) - 1 AS tok_pos
         FROM ztok),
seq AS (
  SELECT -1 AS col_idx, '[CLS]' AS token, -1 AS tok_pos, 'special' AS col_type,
         CAST(NULL AS DOUBLE) AS zq_first, CAST(NULL AS DOUBLE) AS zq_last,
         CAST(NULL AS VARCHAR) AS column_name
  UNION ALL
  SELECT col_idx, token, tok_pos, col_type,
         round(zq[1], 10), round(zq[13], 10), column_name
  FROM toks),
pos AS (SELECT *,
               CAST(row_number() OVER (ORDER BY col_idx, tok_pos) - 1 AS INTEGER) AS position_id,
               sum(CASE WHEN token = '[SEP]' THEN 1 ELSE 0 END)
                 OVER (ORDER BY col_idx, tok_pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sep_run
        FROM seq)
SELECT position_id, token,
       CAST(CASE WHEN token IN ('[CLS]', '[SEP]') THEN 0 ELSE sep_run + 1 END AS BIGINT)
         AS col_encoding,
       CAST(CASE WHEN token IN ('[CLS]', '[SEP]') THEN 0 ELSE tok_pos + 1 END AS INTEGER)
         AS token_position,
       CAST(CASE col_type WHEN 'string' THEN 1 WHEN 'integer' THEN 2
                          WHEN 'float' THEN 3 WHEN 'date' THEN 4 ELSE 0 END AS INTEGER)
         AS type_id,
       zq_first, zq_last{name_out}
FROM pos
"""


def mask_plan(profile: DataFrame, tk_expr: str | None = None) -> DataFrame:
    """M8 (reference tabular_tokenizer.py:82-144): the MLM masking
    policy as a deterministic plan. Column-name tokens are masked with
    probability 100% when the column run has <5 tokens, 60% when <10,
    else 15%; masked positions sub-roll 80/10/10 into
    mask/random/keep. All "randomness" is md5 of (position, token) —
    partition-order-free and SQL-reproducible (the reference relied on
    torch RNG; SURVEY §7.5 risk 6).

    Output: (position_id, token, col_encoding, mask_prob, masked, action).

    ``tk_expr`` swaps the column-name tokenizer (the subword M9 seam);
    the policy algebra is tokenizer-agnostic.
    """
    from tabsketchfm_spark.functions.hashing import h32_sql

    t = token_features(profile, tk_expr)
    wcol = Window.partitionBy("col_encoding")
    t = t.withColumn(
        "col_len",
        F.max(F.when(F.col("col_encoding") > 0, F.col("token_position"))).over(wcol),
    )
    r = F.expr(h32_sql("concat(cast(position_id as string), '|', token)", "spark")) % 100
    r2 = (
        F.expr(h32_sql("concat('sub|', cast(position_id as string), '|', token)", "spark"))
        % 10
    )
    prob = (
        F.when(F.col("col_encoding") == 0, F.lit(0))
        .when(F.col("col_len") < 5, F.lit(100))
        .when(F.col("col_len") < 10, F.lit(60))
        .otherwise(F.lit(15))
    )
    masked = r < prob
    action = (
        F.when(~masked, F.lit("none"))
        .when(r2 < 8, F.lit("[MASK]"))
        .when(r2 == 8, F.lit("random"))
        .otherwise(F.lit("keep"))
    )
    return t.select(
        "position_id",
        "token",
        "col_encoding",
        prob.alias("mask_prob"),
        masked.alias("masked"),
        action.alias("action"),
    )


def mask_plan_oracle_sql(
    profile_sql: str,
    subword_n_merges: int | None = None,
    max_col_tokens: int = 5,
) -> str:
    """``subword_n_merges`` swaps the token-stream CTE for the subword
    M9 oracle built from the SAME profile_sql (the
    pair_token_features_oracle_sql seam shape — no way to pass a
    mismatched token stream) — the policy algebra is
    tokenizer-agnostic."""
    from tabsketchfm_spark.functions.hashing import h32_sql

    if subword_n_merges is not None:
        base = subword_token_features_oracle_sql(
            profile_sql, subword_n_merges, max_col_tokens
        )
    else:
        base = token_features_oracle_sql(profile_sql)
    r = h32_sql("concat(CAST(position_id AS VARCHAR), '|', token)", "duckdb")
    r2 = h32_sql("concat('sub|', CAST(position_id AS VARCHAR), '|', token)", "duckdb")
    return f"""
WITH toks AS ({base}),
wl AS (SELECT *, max(CASE WHEN col_encoding > 0 THEN token_position END)
                  OVER (PARTITION BY col_encoding) AS col_len
       FROM toks),
rolled AS (SELECT *, {r} % 100 AS r, {r2} % 10 AS r2,
                  CASE WHEN col_encoding = 0 THEN 0
                       WHEN col_len < 5 THEN 100
                       WHEN col_len < 10 THEN 60
                       ELSE 15 END AS mask_prob
           FROM wl)
SELECT position_id, token, col_encoding, mask_prob,
       r < mask_prob AS masked,
       CASE WHEN NOT (r < mask_prob) THEN 'none'
            WHEN r2 < 8 THEN '[MASK]'
            WHEN r2 = 8 THEN 'random'
            ELSE 'keep' END AS action
FROM rolled
"""


def pair_token_features(
    profile1: DataFrame, profile2: DataFrame, tk_expr: str | None = None
) -> DataFrame:
    """M10 (tabular_dataset.py:168-192): the cross-encoder pair layout —
    table1's token sequence followed by table2's (CLS kept once),
    positions renumbered globally, table_id marking the side.
    ``tk_expr`` swaps the column-name tokenizer on BOTH sides (the
    subword M9 seam)."""
    s1 = token_features(profile1, tk_expr).withColumn("table_id", F.lit(1))
    s2 = (
        token_features(profile2, tk_expr)
        .where(F.col("token") != "[CLS]")
        .withColumn("table_id", F.lit(2))
    )
    u = s1.unionByName(s2)
    w = Window.orderBy(F.asc("table_id"), F.asc("position_id"))
    return (
        u.withColumn("pair_position", F.row_number().over(w) - 1)
        .select(
            "pair_position",
            "table_id",
            "token",
            "col_encoding",
            "token_position",
            "type_id",
        )
    )


def pair_token_features_oracle_sql(
    profile1_sql: str,
    profile2_sql: str,
    subword_n_merges: int | None = None,
    max_col_tokens: int = 5,
) -> str:
    """``subword_n_merges`` mirrors the subword tokenizer on both
    sides: each side's CTE carries its own merge-learning replay
    (duplicated — tiny, schema-sized)."""
    if subword_n_merges is not None:
        t1 = subword_token_features_oracle_sql(
            profile1_sql, subword_n_merges, max_col_tokens
        )
        t2 = subword_token_features_oracle_sql(
            profile2_sql, subword_n_merges, max_col_tokens
        )
    else:
        t1 = token_features_oracle_sql(profile1_sql)
        t2 = token_features_oracle_sql(profile2_sql)
    return f"""
WITH s1 AS ({t1}), s2 AS ({t2}),
u AS (
  SELECT 1 AS table_id, position_id, token, col_encoding, token_position, type_id FROM s1
  UNION ALL
  SELECT 2 AS table_id, position_id, token, col_encoding, token_position, type_id
  FROM s2 WHERE token <> '[CLS]')
SELECT CAST(row_number() OVER (ORDER BY table_id, position_id) - 1 AS INTEGER)
         AS pair_position,
       table_id, token, col_encoding, token_position, type_id
FROM u
"""


def hashing_vector(
    df: DataFrame,
    columns: list[str],
    n_features: int = 30000,
) -> DataFrame:
    """SK4 (reference data_prep.py:251-261): the table-as-document
    hashing vectorizer. Every value of every column is whitespace-
    tokenized into one bag; each token hashes to a feature index with
    a sign bit (sklearn's alternate_sign), counts are signed-summed
    and L2-normalized. Output: sparse rows (feature_idx, tf) — only
    non-zero features, which is also the right storage at 30k width
    (SURVEY §7.5 risk 4).
    """
    from tabsketchfm_spark.functions.hashing import h32_sql
    from tabsketchfm_spark.operators.melt import melt_values

    m = melt_values(df, columns)
    tok = m.select(F.explode(F.split("v", r"\s+")).alias("t")).where(F.col("t") != "")
    h = F.expr(h32_sql("t", "spark"))
    signed = tok.select(
        (h % n_features).cast("int").alias("feature_idx"),
        F.when((F.shiftright(h, 31).bitwiseAND(F.lit(1))) == 1, -1)
        .otherwise(1)
        .alias("sign"),
    )
    counts = signed.groupBy("feature_idx").agg(F.sum("sign").alias("c"))
    counts = counts.where(F.col("c") != 0)
    norm = counts.agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("l2"))
    return (
        counts.crossJoin(F.broadcast(norm))
        .select(
            "feature_idx",
            F.round(F.col("c") / F.col("l2"), 10).alias("tf"),
        )
    )


def hashing_vector_oracle_sql(
    table: str, columns: list[str], n_features: int = 30000
) -> str:
    from tabsketchfm_spark.functions.hashing import h32_sql

    h = h32_sql("t", "duckdb")
    vals = " UNION ALL ".join(
        f"SELECT nullif(CAST({c} AS VARCHAR), '') AS v FROM {table}" for c in columns
    )
    return f"""
WITH vals AS ({vals}),
tok AS (SELECT unnest(string_split_regex(v, '\\s+')) AS t FROM vals WHERE v IS NOT NULL),
signed AS (SELECT CAST(h % {n_features} AS INTEGER) AS feature_idx,
                  CASE WHEN (h >> 31) & 1 = 1 THEN -1 ELSE 1 END AS sign
           FROM (SELECT {h} AS h FROM tok WHERE t <> '') hs),
counts AS (SELECT feature_idx, sum(sign) AS c FROM signed GROUP BY 1 HAVING sum(sign) <> 0),
norm AS (SELECT sqrt(sum(c * c)) AS l2 FROM counts)
SELECT feature_idx, round(c / l2, 10) AS tf FROM counts, norm
"""


def column_hashing_vectors(
    df: DataFrame,
    columns: list[str] | None = None,
    n_features: int = 30000,
) -> DataFrame:
    """Per-COLUMN hashing vectorizer (reference data_prep.py:251-261:
    one document per column — the space-join of its values — through
    HashingVectorizer(n_features=30000), stored as cols[col]['hv']).
    Sparse rows (column_name, feature_idx, tf): signed token counts
    (sign bit from the hash — sklearn's alternate_sign) L2-normalized
    PER COLUMN. Same md5-based h32 + whitespace tokenization as the
    table-level SK4 sketch (documented murmurhash divergence, SURVEY
    §7.5 risk 1); zero-cancelled features are dropped, matching
    sklearn's sparse storage."""
    from tabsketchfm_spark.functions.hashing import h32_sql
    from tabsketchfm_spark.operators.melt import melt_values

    m = melt_values(df, columns)
    tok = m.select(
        "column_name", F.explode(F.split("v", r"\s+")).alias("t")
    ).where(F.col("t") != "")
    h = F.expr(h32_sql("t", "spark"))
    signed = tok.select(
        "column_name",
        (h % n_features).cast("int").alias("feature_idx"),
        F.when((F.shiftright(h, 31).bitwiseAND(F.lit(1))) == 1, -1)
        .otherwise(1)
        .alias("sign"),
    )
    counts = signed.groupBy("column_name", "feature_idx").agg(
        F.sum("sign").alias("c")
    )
    counts = counts.where(F.col("c") != 0)
    norm = counts.groupBy("column_name").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("l2")
    )
    # norm is schema-sized (one row per column) — broadcast it; the
    # counts subtree recomputes once for the norm pass (the SK4 shape)
    return counts.join(F.broadcast(norm), "column_name").select(
        "column_name",
        "feature_idx",
        F.round(F.col("c") / F.col("l2"), 10).alias("tf"),
    )


def token_features_hv(
    profile: DataFrame,
    df: DataFrame,
    columns: list[str] | None = None,
    n_features: int = 30000,
    tk_expr: str | None = None,
) -> DataFrame:
    """Tokenizer_HV (reference
    tabular_tokenizer_hashing_vectorizer.py:12-54): the M9 token
    stream with each column's hashing vector aligned at its name
    tokens IN PLACE OF the minhash block — [CLS]/[SEP] and untyped
    positions carry zeros (:25,:35,:43), a typed column
    (string/date/integer/float, :40) carries its hv at every token of
    its run (:48-52). Emitted SPARSE — (position_id, token,
    col_encoding, token_position, type_id, feature_idx, tf) — a
    30k-wide dense array per token would be the wrong storage (SURVEY
    §7.5 risk 4); absent rows ARE the zeros, so the special-token and
    untyped cases emit nothing.

    Shape at scale: hv is a per-(column, feature) aggregate (bounded
    by n_cols × n_features, not row count) and the token stream is
    schema-sized — the alignment join broadcasts the token side."""
    tf = token_features(profile, tk_expr, keep_name=True)
    toks = tf.where(~F.col("token").isin("[CLS]", "[SEP]")).where(
        F.col("type_id").isin(1, 2, 3, 4)
    )
    hv = column_hashing_vectors(df, columns, n_features)
    return hv.join(F.broadcast(toks), "column_name").select(
        "position_id",
        "token",
        "col_encoding",
        "token_position",
        "type_id",
        "feature_idx",
        "tf",
    )


def _column_hv_ctes(
    table: str, columns: list[str], n_features: int, tag: str = ""
) -> str:
    """The DuckDB per-column hv chain (vals→tok→signed→counts→norm→hv),
    CTE names suffixed with ``tag`` so the pair oracle can carry one
    chain per side."""
    from tabsketchfm_spark.functions.hashing import h32_sql

    h = h32_sql("t", "duckdb")
    vals = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, nullif(CAST({c} AS VARCHAR), '') AS v "
        f"FROM {table}"
        for c in columns
    )
    return f"""vals{tag} AS ({vals}),
tok{tag} AS (SELECT column_name, unnest(string_split_regex(v, '\\s+')) AS t
             FROM vals{tag} WHERE v IS NOT NULL),
signed{tag} AS (SELECT column_name, CAST(h % {n_features} AS INTEGER) AS feature_idx,
                       CASE WHEN (h >> 31) & 1 = 1 THEN -1 ELSE 1 END AS sign
                FROM (SELECT column_name, {h} AS h FROM tok{tag} WHERE t <> '') hs),
counts{tag} AS (SELECT column_name, feature_idx, sum(sign) AS c
                FROM signed{tag} GROUP BY 1, 2 HAVING sum(sign) <> 0),
nrm{tag} AS (SELECT column_name, sqrt(sum(c * c)) AS l2 FROM counts{tag} GROUP BY 1),
hv{tag} AS (SELECT column_name, feature_idx, round(c / l2, 10) AS tf
            FROM counts{tag} JOIN nrm{tag} USING (column_name))"""


def token_features_hv_oracle_sql(
    profile_sql: str,
    table: str,
    columns: list[str],
    n_features: int = 30000,
) -> str:
    """DuckDB mirror: the keep_name token stream joined to the
    identical per-column hv chain."""
    base = token_features_oracle_sql(profile_sql, keep_name=True)
    hv = _column_hv_ctes(table, columns, n_features)
    return f"""
WITH tfeat AS ({base}),
{hv}
SELECT position_id, token, col_encoding, token_position, type_id, feature_idx, tf
FROM tfeat JOIN hv USING (column_name)
WHERE token NOT IN ('[CLS]', '[SEP]') AND type_id IN (1, 2, 3, 4)
"""


def pair_token_features_hv(
    profile1: DataFrame,
    df1: DataFrame,
    profile2: DataFrame,
    df2: DataFrame,
    columns1: list[str] | None = None,
    columns2: list[str] | None = None,
    n_features: int = 30000,
    tk_expr: str | None = None,
) -> DataFrame:
    """M10 ∘ Tokenizer_HV (reference TableSimilarityTokenizer_HV,
    tabular_tokenizer_hashing_vectorizer.py:57-60, layered on
    tabular_dataset.py:168-192): the cross-encoder pair layout with
    each SIDE's per-column hv aligned at its name tokens. Output:
    (pair_position, table_id, token, col_encoding, token_position,
    type_id, feature_idx, tf); the hv join keys on (table_id,
    column_name) so same-named columns across the two tables cannot
    cross-pollinate."""
    s1 = token_features(profile1, tk_expr, keep_name=True).withColumn(
        "table_id", F.lit(1)
    )
    s2 = (
        token_features(profile2, tk_expr, keep_name=True)
        .where(F.col("token") != "[CLS]")
        .withColumn("table_id", F.lit(2))
    )
    u = s1.unionByName(s2)
    w = Window.orderBy(F.asc("table_id"), F.asc("position_id"))
    toks = (
        u.withColumn("pair_position", F.row_number().over(w) - 1)
        .where(~F.col("token").isin("[CLS]", "[SEP]"))
        .where(F.col("type_id").isin(1, 2, 3, 4))
    )
    hv = (
        column_hashing_vectors(df1, columns1, n_features)
        .withColumn("table_id", F.lit(1))
        .unionByName(
            column_hashing_vectors(df2, columns2, n_features).withColumn(
                "table_id", F.lit(2)
            )
        )
    )
    return hv.join(F.broadcast(toks), ["table_id", "column_name"]).select(
        "pair_position",
        "table_id",
        "token",
        "col_encoding",
        "token_position",
        "type_id",
        "feature_idx",
        "tf",
    )


def pair_token_features_hv_oracle_sql(
    profile1_sql: str,
    table1: str,
    columns1: list[str],
    profile2_sql: str,
    table2: str,
    columns2: list[str],
    n_features: int = 30000,
) -> str:
    t1 = token_features_oracle_sql(profile1_sql, keep_name=True)
    t2 = token_features_oracle_sql(profile2_sql, keep_name=True)
    hv1 = _column_hv_ctes(table1, columns1, n_features, tag="1")
    hv2 = _column_hv_ctes(table2, columns2, n_features, tag="2")
    return f"""
WITH s1 AS ({t1}), s2 AS ({t2}),
u AS (
  SELECT 1 AS table_id, position_id, token, col_encoding, token_position,
         type_id, column_name FROM s1
  UNION ALL
  SELECT 2 AS table_id, position_id, token, col_encoding, token_position,
         type_id, column_name
  FROM s2 WHERE token <> '[CLS]'),
p AS (SELECT CAST(row_number() OVER (ORDER BY table_id, position_id) - 1 AS INTEGER)
               AS pair_position,
             table_id, token, col_encoding, token_position, type_id, column_name
      FROM u),
{hv1},
{hv2},
hv AS (SELECT 1 AS table_id, * FROM hv1 UNION ALL SELECT 2 AS table_id, * FROM hv2)
SELECT pair_position, p.table_id, token, col_encoding, token_position, type_id,
       feature_idx, tf
FROM p JOIN hv ON hv.table_id = p.table_id AND hv.column_name = p.column_name
WHERE token NOT IN ('[CLS]', '[SEP]') AND type_id IN (1, 2, 3, 4)
"""


def sep_group_pooling(profile: DataFrame, dim: int = 4) -> DataFrame:
    """The K1 POOLING stage, SQL-expressible: SEP-group mean pooling
    (reference extract_embeddings.py find_table_col, :16-73) over
    FIXED closed-form per-token vectors, so DuckDB can certify the
    pooling algebra bit-exactly while the real M1 forward (seeded
    Gaussians, ml/reference_forward.py) keeps a rows-only check.

    Token j's fixed vector component: md5(token|position_id|j) first 8
    hex digits as a bigint — summed EXACTLY as int64 per group, divided
    once at the end, so float accumulation order can't perturb the
    result. Output: one row per column group (group = col_encoding,
    i.e. 1-based column index) plus the table row (group 0, mean over
    ALL non-special tokens):
    (grp, n_tokens, e0..e{dim-1})."""
    tf = token_features(profile)
    comps = [
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("token"),
                        F.col("position_id").cast("string"),
                        F.lit(str(j)),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias(f"h{j}")
        for j in range(dim)
    ]
    toks = tf.where(~F.col("token").isin("[CLS]", "[SEP]")).select(
        F.col("col_encoding").cast("int").alias("grp"), *comps
    )
    toks = toks.persist()  # two consumers: per-column groups + table row
    scale = float(1 << 32)

    def pooled(grouped):
        return grouped.agg(
            F.count(F.lit(1)).alias("n_tokens"),
            *[F.sum(f"h{j}").alias(f"s{j}") for j in range(dim)],
        ).select(
            "grp",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            *[
                F.round(F.col(f"s{j}") / F.col("n_tokens") / scale, 12).alias(f"e{j}")
                for j in range(dim)
            ],
        )

    cols = pooled(toks.groupBy("grp"))
    table = pooled(toks.withColumn("grp", F.lit(0)).groupBy("grp"))
    return cols.unionByName(table)


def sep_group_pooling_oracle_sql(profile_sql: str, dim: int = 4) -> str:
    """DuckDB mirror: identical fixed vectors via the md5-prefix bigint
    toolkit, identical exact-int64 pooling."""
    tf = token_features_oracle_sql(profile_sql)
    comps = ", ".join(
        f"('0x' || substring(md5(token || '|' || CAST(position_id AS VARCHAR) || '|{j}'), 1, 8))::BIGINT AS h{j}"
        for j in range(dim)
    )
    sums = ", ".join(f"sum(h{j}) AS s{j}" for j in range(dim))
    means = ", ".join(
        f"round(CAST(s{j} AS DOUBLE) / n_tokens / {float(1 << 32)}, 12) AS e{j}"
        for j in range(dim)
    )
    return f"""
WITH tf AS ({tf}),
toks AS (SELECT CAST(col_encoding AS INTEGER) AS grp, {comps}
         FROM tf WHERE token NOT IN ('[CLS]', '[SEP]')),
bycol AS (SELECT grp, CAST(count(*) AS INTEGER) AS n_tokens, {sums} FROM toks GROUP BY grp),
bytab AS (SELECT 0 AS grp, CAST(count(*) AS INTEGER) AS n_tokens, {sums} FROM toks)
SELECT grp, n_tokens, {means} FROM bycol
UNION ALL
SELECT grp, n_tokens, {means} FROM bytab
"""


def mlm_batch(profile: DataFrame) -> DataFrame:
    """M8 APPLIED — the collate step that turns the masking plan into
    an actual training example (reference tabular_tokenizer.py:82-144
    performs plan + application together with torch RNG; here both
    halves are deterministic relational ops): join the M9 token stream
    with the M8 plan, rewrite masked positions per their action
    ([MASK] literal / deterministic random vocab token / keep), and
    emit the MLM label (the original token) exactly at masked
    positions. The random-replacement token is drawn from the table's
    own non-special vocabulary by md5 index — reproducible by any
    engine, no RNG state. Output: (position_id, input_token, label,
    col_encoding, token_position, type_id)."""
    from tabsketchfm_spark.functions.hashing import h32_sql

    tf = token_features(profile)
    mp = mask_plan(profile).select("position_id", "masked", "action")
    vocab = (
        tf.where(~F.col("token").isin("[CLS]", "[SEP]"))
        .select("token")
        .distinct()
        .withColumn(
            "vidx",
            F.row_number().over(Window.orderBy("token")) - 1,
        )
        .withColumnRenamed("token", "rnd_token")
    )
    nv = vocab.agg(F.count(F.lit(1)).alias("nv"))
    ridx = (
        F.expr(h32_sql("concat('rnd|', cast(position_id as string), '|', token)", "spark"))
        % F.col("nv")
    ).cast("int")
    j = (
        tf.join(mp, "position_id")
        .crossJoin(F.broadcast(nv))
        .withColumn(
            "ridx", F.when(F.col("action") == "random", ridx).otherwise(F.lit(None))
        )
        .join(F.broadcast(vocab), F.col("ridx") == F.col("vidx"), "left")
    )
    input_token = (
        F.when(~F.col("masked"), F.col("token"))
        .when(F.col("action") == "[MASK]", F.lit("[MASK]"))
        .when(F.col("action") == "random", F.col("rnd_token"))
        .otherwise(F.col("token"))  # keep
    )
    return j.select(
        "position_id",
        input_token.alias("input_token"),
        F.when(F.col("masked"), F.col("token")).alias("label"),
        "col_encoding",
        "token_position",
        "type_id",
    )


def mlm_batch_oracle_sql(profile_sql: str) -> str:
    from tabsketchfm_spark.functions.hashing import h32_sql

    tf = token_features_oracle_sql(profile_sql)
    mp = mask_plan_oracle_sql(profile_sql)
    # tf.token: the USING join leaves both sides' token columns visible
    ridx = h32_sql(
        "concat('rnd|', CAST(position_id AS VARCHAR), '|', tf.token)", "duckdb"
    )
    return f"""
WITH tf AS ({tf}),
mp AS ({mp}),
vocab AS (SELECT token AS rnd_token,
                 CAST(row_number() OVER (ORDER BY token) - 1 AS INTEGER) AS vidx
          FROM (SELECT DISTINCT token FROM tf
                WHERE token NOT IN ('[CLS]', '[SEP]')) d),
nv AS (SELECT count(*) AS nv FROM vocab),
j AS (SELECT tf.*, mp.masked, mp.action,
             CASE WHEN mp.action = 'random'
                  THEN CAST({ridx} % nv AS INTEGER) END AS ridx
      FROM tf JOIN mp USING (position_id), nv)
SELECT position_id,
       CASE WHEN NOT masked THEN token
            WHEN action = '[MASK]' THEN '[MASK]'
            WHEN action = 'random' THEN v.rnd_token
            ELSE token END AS input_token,
       CASE WHEN masked THEN token END AS label,
       col_encoding, token_position, type_id
FROM j LEFT JOIN vocab v ON j.ridx = v.vidx
"""


def subword_token_features_oracle_sql(
    profile_sql: str, n_merges: int, max_col_tokens: int = 5
) -> str:
    """Oracle for the BPE-subword M9 variant: DuckDB re-derives the
    merge list itself (the full learning replay over the lake's
    column-name corpus, via DESCRIBE — no schema hardcoded on either
    side), then segments the PROFILE'S OWN name-words through the same
    m1..m{n} replace chain (so a word absent from the lake corpus
    still segments exactly like Spark's chained-replace expression),
    and rebuilds the token sequence; the gate therefore pins the whole
    learn→segment→assemble trajectory, not just the token algebra."""
    from tabsketchfm_spark.operators.bpe import name_corpus_learning_ctes

    prefix = ",\n".join(name_corpus_learning_ctes(n_merges)) + ",\n"
    # per-word segmentation replay over the profile's words: same
    # sentinel-coalesced scalar subqueries as the learning chain's
    # r{k} CTEs (an exhausted m{k} is a no-op round on both engines)
    sq = [
        """sqw AS (SELECT DISTINCT
           unnest(list_filter(string_split(column_name, '_'), t -> t <> '')) AS w
         FROM prof)""",
        "sq0 AS (SELECT w, ' ' || array_to_string(string_split(w, ''), '  ')"
        f" || '  </w> ' AS seq FROM sqw)",
    ]
    for k in range(1, n_merges + 1):
        sq.append(
            f"""sq{k} AS (SELECT w, replace(seq,
        coalesce((SELECT ' ' || s1 || '  ' || s2 || ' ' FROM m{k}), chr(1)),
        coalesce((SELECT ' ' || s1 || s2 || ' ' FROM m{k}), chr(1))) AS seq
      FROM sq{k - 1})"""
        )
    sq_ctes = ",\n  ".join(sq)
    ntk = f"""
  WITH {sq_ctes}
  SELECT column_name,
         list_concat(flatten(list(subs ORDER BY wi))[1:{max_col_tokens}],
                     ['[SEP]']) AS tk
  FROM (
    SELECT nw.column_name, nw.wi,
           list_transform(
             list_filter(string_split(trim(r.seq), '  '), s -> s <> '</w>'),
             s -> replace(s, '</w>', '')) AS subs
    FROM (
      SELECT column_name, generate_subscripts(ws, 1) AS wi, unnest(ws) AS w
      FROM (SELECT column_name,
                   list_filter(string_split(column_name, '_'), t -> t <> '') AS ws
            FROM prof) t0) nw
    JOIN sq{n_merges} r ON r.w = nw.w) sw
  GROUP BY column_name
"""
    return token_features_oracle_sql(profile_sql, prefix_ctes=prefix, ntk_sql=ntk)
