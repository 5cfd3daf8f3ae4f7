"""Text-analysis operators over the documents table (north-star ops).

Token statistics, quality scoring, n-gram/stopword language ID, and
document fingerprinting — the per-document profiling a training-data
pipeline runs before dedup/filtering. All pure column expressions
(one scan, no shuffle except the final nothing — these are row-local),
mirrored in the DuckDB oracle.

The reference's corresponding primitives: whitespace word tokens
(data_prep.py:213), stringified value docs for the hashing vectorizer
(data_prep.py:251-261), content-addressed identity (data_prep.py:298).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tabsketchfm_spark.functions.hashing import h64_sql

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "en", "es"],
    "fr": ["le", "la", "de", "et", "en", "est"],
    "de": ["der", "die", "das", "und", "in", "ist"],
    "zh": ["de", "shi", "zai", "he"],
}

_ALL_STOP = sorted({w for ws in STOPWORDS.values() for w in ws})


def _toks_spark(text_col: str) -> str:
    return f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"


def _toks_duckdb(text_col: str) -> str:
    return f"list_filter(string_split_regex({text_col}, '\\s+'), t -> t <> '')"


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_uniq_tokens, avg_token_len) — whitespace tokens
    plus a BPE-ish subword proxy count (ceil(bytes/4) per token)."""
    toks = _toks_spark(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_uniq_tokens"),
        F.round(
            F.expr(
                f"aggregate({toks}, cast(0.0 as double), (acc, t) -> acc + length(t))"
                f" / greatest(size({toks}), 1)"
            ),
            6,
        ).alias("avg_token_len"),
        F.expr(
            f"aggregate({toks}, 0L, (acc, t) -> acc + cast(ceil(octet_length(t) / 4.0) as bigint))"
        ).alias("n_subwords"),
    )


def token_stats_oracle_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = _toks_duckdb(text_col)
    return f"""
WITH t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})
SELECT id,
       CAST(len(tk) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(tk)) AS INTEGER) AS n_uniq_tokens,
       round(list_sum(list_transform(tk, t -> CAST(length(t) AS DOUBLE)))
             / greatest(len(tk), 1), 6) AS avg_token_len,
       CAST(list_sum(list_transform(tk, t -> CAST(ceil(strlen(t) / 4.0) AS BIGINT)))
            AS BIGINT) AS n_subwords
FROM t
"""


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: length saturation, vocabulary
    diversity, and (1 - stopword density), equally weighted — the
    standard cheap pre-filter shape for corpus curation.
    Output: (id, n_tokens, uniq_ratio, stop_ratio, score)."""
    toks = _toks_spark(text_col)
    stop_list = ", ".join(f"'{w}'" for w in _ALL_STOP)
    n = f"size({toks})"
    uniq = f"(size(array_distinct({toks})) / cast(greatest({n}, 1) as double))"
    stop = (
        f"(size(filter({toks}, t -> t in ({stop_list}))) "
        f"/ cast(greatest({n}, 1) as double))"
    )
    score = f"0.4 * least({n} / 100.0, 1.0) + 0.3 * {uniq} + 0.3 * (1.0 - {stop})"
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(n).alias("n_tokens"),
        F.round(F.expr(uniq), 6).alias("uniq_ratio"),
        F.round(F.expr(stop), 6).alias("stop_ratio"),
        F.round(F.expr(score), 6).alias("score"),
    )


def quality_score_oracle_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = _toks_duckdb(text_col)
    stop_list = ", ".join(f"'{w}'" for w in _ALL_STOP)
    return f"""
WITH t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
m AS (SELECT id, CAST(len(tk) AS INTEGER) AS n_tokens,
             len(list_distinct(tk)) / CAST(greatest(len(tk), 1) AS DOUBLE) AS uniq_ratio,
             len(list_filter(tk, t -> t IN ({stop_list})))
               / CAST(greatest(len(tk), 1) AS DOUBLE) AS stop_ratio
      FROM t)
SELECT id, n_tokens, round(uniq_ratio, 6) AS uniq_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * uniq_ratio
             + 0.3 * (1.0 - stop_ratio), 6) AS score
FROM m
"""


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: count tokens from each language's
    marker list; highest count wins (fixed precedence on ties).
    Output: (id, {lang}_hits..., pred_lang)."""
    toks = _toks_spark(text_col)
    hits = {}
    for lang, words in STOPWORDS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        hits[lang] = f"size(filter({toks}, t -> t in ({wl})))"
    langs = list(STOPWORDS)
    # fixed-precedence argmax: first language whose count >= all later ones
    pred = "CASE "
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"{hits[lang]} >= {hits[other]}" for other in langs[i + 1 :]
        )
        pred += f"WHEN {conds} THEN '{lang}' "
    pred += f"ELSE '{langs[-1]}' END"
    return df.select(
        F.col(id_col).alias("id"),
        *[F.expr(hits[lang]).cast("int").alias(f"{lang}_hits") for lang in langs],
        F.expr(pred).alias("pred_lang"),
    )


def lang_id_oracle_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = _toks_duckdb(text_col)
    hit_defs = []
    for lang, words in STOPWORDS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        hit_defs.append(
            f"CAST(len(list_filter(tk, t -> t IN ({wl}))) AS INTEGER) AS {lang}_hits"
        )
    langs = list(STOPWORDS)
    pred = "CASE "
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{lang}_hits >= {o}_hits" for o in langs[i + 1 :])
        pred += f"WHEN {conds} THEN '{lang}' "
    pred += f"ELSE '{langs[-1]}' END"
    return f"""
WITH t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
h AS (SELECT id, {", ".join(hit_defs)} FROM t)
SELECT id, {", ".join(f"{lang}_hits" for lang in langs)}, {pred} AS pred_lang
FROM h
"""


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 25
) -> DataFrame:
    """Corpus-level vocabulary statistics: the k most frequent tokens
    with counts and corpus share. The classic first look at a training
    corpus; one explode + one shuffle on the token key (map-side
    combine collapses the heavy hitters before the exchange).
    Output: (rank, token, cnt, share)."""
    from tabsketchfm_spark.functions.ranking import ranked_topk

    toks = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("t"))
        .where(F.col("t") != "")
    )
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    cnt = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    top = ranked_topk(cnt, [F.desc("cnt"), F.asc("t")], k)
    return top.crossJoin(F.broadcast(total)).select(
        "rank",
        F.col("t").alias("token"),
        "cnt",
        F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
    )


def vocab_topk_oracle_sql(table: str, text_col: str = "text", k: int = 25) -> str:
    return f"""
WITH toks AS (SELECT unnest(string_split_regex({text_col}, '\\s+')) AS t FROM {table}),
nz AS (SELECT t FROM toks WHERE t <> ''),
cnt AS (SELECT t AS token, count(*) AS cnt FROM nz GROUP BY 1),
total AS (SELECT count(*) AS total FROM nz)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank,
       token, cnt, round(cnt / CAST(total AS DOUBLE), 6) AS share
FROM cnt, total
QUALIFY rank <= {k}
"""


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Repetition signal for corpus filtering: the share of the
    document taken by its single most-repeated word n-gram (high →
    boilerplate / template text). One explode + one grouped max.
    Output: (id, n_shingles, max_repeat, rep_ratio)."""
    from tabsketchfm_spark.operators.dedup import _shingles

    sh = _shingles(df, id_col, text_col, n, dedupe=False)
    per = sh.groupBy("id", "shingle").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("id").agg(
        F.sum("c").alias("n_shingles"),
        F.max("c").alias("max_repeat"),
        F.round(F.max("c") / F.sum("c"), 6).alias("rep_ratio"),
    )


def repetition_score_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> str:
    from tabsketchfm_spark.operators.dedup import _shingles_cte_duckdb

    cte = _shingles_cte_duckdb(table, id_col, text_col, n).replace(
        "SELECT DISTINCT id", "SELECT id"
    )
    return f"""
WITH {cte},
per AS (SELECT id, shingle, count(*) AS c FROM sh GROUP BY 1, 2)
SELECT id, CAST(sum(c) AS BIGINT) AS n_shingles,
       CAST(max(c) AS BIGINT) AS max_repeat,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS rep_ratio
FROM per GROUP BY id
"""


PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ssn_like": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}

# most-specific first: ssn is a sub-language of the phone pattern
PII_ORDER = ["ssn_like", "email", "phone"]


def pii_scan(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII pre-filter: per-document hit counts for email / phone /
    SSN-shaped patterns (regexp_count stays JVM-side). Output:
    (id, email_hits, phone_hits, ssn_like_hits, has_pii)."""
    cols = {
        f"{k}_hits": F.regexp_count(F.col(text_col), F.lit(p)).cast("int")
        for k, p in PII_PATTERNS.items()
    }
    out = df.select(F.col(id_col).alias("id"), *[v.alias(k) for k, v in cols.items()])
    total = None
    for k in cols:
        total = F.col(k) if total is None else total + F.col(k)
    return out.select("*", (total > 0).alias("has_pii"))


def pii_scan_oracle_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    hits = ", ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{p}')) AS INTEGER) AS {k}_hits"
        for k, p in PII_PATTERNS.items()
    )
    total = " + ".join(f"{k}_hits" for k in PII_PATTERNS)
    return f"""
WITH h AS (SELECT {id_col} AS id, {hits} FROM {table})
SELECT *, ({total}) > 0 AS has_pii FROM h
"""


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit content fingerprint of whitespace-normalized lowercase
    text (content-addressed identity — reference data_prep.py:298).
    Output: (id, fp)."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')"
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(h64_sql(norm, "spark")).alias("fp"),
    )


def fingerprint_oracle_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return f"SELECT {id_col} AS id, {h64_sql(norm, 'duckdb')} AS fp FROM {table}"


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Training-data chunking: split each document into token windows
    of ``size`` with ``overlap`` tokens of context carry-over (stride
    = size − overlap) — the LLM-pretraining document→sample fan-out.
    Chunk i covers tokens [i·stride, i·stride+size); every token is
    covered and the last chunk is never empty. One narrow projection
    + explode, no shuffle; the fan-out multiplies rows ~len/stride×,
    so at 100 TB chunk AFTER filtering/dedup, not before.

    Output: (doc_id, chunk_idx, chunk_text, n_tokens).
    """
    stride = size - overlap
    tk = F.expr(_toks_spark(text_col))
    n_chunks = F.ceil(
        F.greatest(F.size(tk) - overlap, F.lit(1)) / F.lit(float(stride))
    ).cast("int")
    base = df.select(
        F.col(id_col), tk.alias("tk"), n_chunks.alias("nc")
    )
    idx = base.select(
        id_col,
        "tk",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("ci"),
    )
    return idx.select(
        id_col,
        F.col("ci").cast("int").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("tk"), F.col("ci") * stride + 1, size), " "
        ).alias("chunk_text"),
        F.least(F.size("tk") - F.col("ci") * stride, F.lit(size))
        .cast("int")
        .alias("n_tokens"),
    )


def chunk_documents_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    overlap: int = 8,
) -> str:
    stride = size - overlap
    return f"""
WITH toks AS (
  SELECT {id_col}, {_toks_duckdb(text_col)} AS tk FROM {table}),
idx AS (
  SELECT {id_col}, tk, unnest(generate_series(0,
           CAST(ceil(greatest(len(tk) - {overlap}, 1) / {stride}.0) AS BIGINT) - 1))
         AS ci
  FROM toks)
SELECT {id_col}, CAST(ci AS INTEGER) AS chunk_idx,
       array_to_string(tk[ci*{stride}+1 : ci*{stride}+{size}], ' ') AS chunk_text,
       CAST(least(len(tk) - ci*{stride}, {size}) AS INTEGER) AS n_tokens
FROM idx
"""


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """Sequence packing: assign documents (in id order) to training
    sequences by running token count — sequence k holds the docs whose
    running total starts inside [k·budget, (k+1)·budget). Contiguous
    next-fit packing: deterministic, order-defined, and one pass; a
    doc may straddle its bin's end (soft budget), which pretraining
    tolerates (and exact bin-packing is NP-hard and order-unstable).

    The running total is a TWO-PHASE distributed cumsum over id-range
    buckets: bucket = floor((id - min_id) / width) is PURE ARITHMETIC
    (no repartitionByRange — the range partitioner runs a whole extra
    sampling job over its input), and the whole scheme is LAZY (no
    Spark job at plan-build time, guide §5 "the driver should do no
    data work"): the id bounds ride a one-row broadcast crossJoin and
    the per-bucket offsets are a broadcast triangular self-join over
    the ≤ num_partitions per-bucket sums — the global_rank pattern —
    replacing the former min/max ``.first()`` + per-bucket-sums
    ``.collect()`` that eagerly ran the full tokenize pass on every
    query BUILD. No single task ever sees the whole corpus, unlike a
    global Window.orderBy. Uniform or dense ids give even buckets; a
    pathologically clustered id space degrades bucket balance but
    never correctness.

    NULL ids are dropped (they cannot be placed in the id-ordered
    packing) — previously an all-NULL-id input degenerated to
    seq_id=0 rows while a mixed input dropped its NULL-id rows; the
    lazy scheme makes the drop uniform. No registered query feeds
    NULL ids.

    Output: (doc_id, n_tokens, seq_id, seq_offset).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # persist: the bounds, bucket-sum and final subtrees of the ONE
    # executed plan all read it — one tokenize materialization per run
    toks = df.select(
        F.col(id_col), F.size(F.expr(_toks_spark(text_col))).alias("n_tokens")
    ).persist()
    # one-row bounds frame: lo plus the bucket width
    # greatest(1, (hi - lo) div nparts + 1) — identical values to the
    # former python ints, so floor((id - lo) / width) is bit-identical
    bounds = toks.agg(
        F.min(id_col).alias("__lo"),
        F.expr(
            f"greatest(1L, (max({id_col}) - min({id_col})) div {nparts} + 1)"
        ).alias("__w"),
    )
    bkt = F.floor((F.col(id_col) - F.col("__lo")) / F.col("__w")).cast("int")
    nv = (
        toks.crossJoin(F.broadcast(bounds))
        .withColumn("__bkt", bkt)
        .drop("__lo", "__w")
    )
    # off(b) = tokens in buckets before b: the shared lazy exclusive
    # prefix sum over the ≤ nparts+1 per-bucket sums
    from tabsketchfm_spark.functions.ranking import triangular_offsets

    psums = nv.groupBy("__bkt").agg(F.sum("n_tokens").alias("s"))
    offs = triangular_offsets(psums, "__bkt", "s", "off")
    w = Window.partitionBy("__bkt").orderBy(id_col)
    cum = (
        nv.join(F.broadcast(offs), "__bkt")
        .withColumn("cum", F.sum("n_tokens").over(w) + F.col("off"))
        .withColumn("start", F.col("cum") - F.col("n_tokens"))
    )
    return cum.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.col("start") / budget).cast("int").alias("seq_id"),
        (F.col("start") % budget).cast("int").alias("seq_offset"),
    )


def pack_sequences_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, len({_toks_duckdb(text_col)}) AS n_tokens FROM {table}),
cum AS (
  SELECT {id_col}, n_tokens,
         sum(n_tokens) OVER (ORDER BY {id_col}
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start
  FROM toks)
SELECT {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(start / {budget}.0) AS INTEGER) AS seq_id,
       CAST(start % {budget} AS INTEGER) AS seq_offset
FROM cum
"""


def keywords_tfdf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction by tf·N/df — tf-idf with a
    LINEAR inverse-document-frequency instead of log(N/df), chosen
    deliberately: libm log() differs at the last ulp across engines,
    while tf·N/df is one exact integer product and one double
    division, bit-identical everywhere (same ranking order as tf-idf
    for fixed tf since both are monotone in 1/df). Shuffles: one on
    (doc, term) for tf, one on term for df, one broadcast of the
    corpus size. Output: (doc_id, rank, term, tf, df, score).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(F.expr(_toks_spark(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("tf") * F.col("n_docs") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", F.round("score", 9).alias("score"))
    )


def keywords_tfdf_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({_toks_duckdb(text_col)}) AS term FROM {table}),
tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM {table}),
scored AS (
  SELECT tf.{id_col}, tf.term, tf.tf, dfreq.df,
         tf.tf * n.n_docs / CAST(dfreq.df AS DOUBLE) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
SELECT {id_col}, CAST(row_number() OVER (PARTITION BY {id_col}
                      ORDER BY score DESC, term) AS INTEGER) AS rank,
       term, tf, df, round(score, 9) AS score
FROM scored
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)


def decontaminate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bench_mod: int = 17,
    ratio_threshold: float = 0.5,
) -> DataFrame:
    """Test-set decontamination: score every corpus document by its
    word-n-gram overlap with a benchmark/eval set, the standard
    pre-training hygiene pass (the n-gram analogue of the reference's
    content-snapshot table dedup, data_prep.py:319-337).

    The benchmark here is the deterministic subset ``id % bench_mod
    == 0`` (stands in for an external eval-set table; swap the filter
    for a real one). Output: (id, n_ngrams, n_matched, contamination,
    contaminated) per corpus doc with >= 1 shingle.

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (eval sets are MBs, corpora are TBs), so it is BROADCAST —
    corpus shingles stream through a map-side hash join and the only
    shuffle is the final (id)-keyed count aggregation, which AQE
    coalesces. The corpus is never self-joined.
    """
    from tabsketchfm_spark.operators.dedup import _shingles

    bench = df.where(F.col(id_col) % bench_mod == 0)
    corpus = df.where(F.col(id_col) % bench_mod != 0)
    bsh = _shingles(bench, id_col, text_col, n).select("shingle").distinct()
    csh = _shingles(corpus, id_col, text_col, n)
    joined = csh.join(
        F.broadcast(bsh.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    ratio = F.col("n_matched") / F.col("n_ngrams")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("_hit").alias("n_matched"),
        )
        .select(
            "id",
            "n_ngrams",
            "n_matched",
            ratio.alias("contamination"),
            (ratio >= ratio_threshold).cast("int").alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bench_mod: int = 17,
    ratio_threshold: float = 0.5,
) -> str:
    toks = _toks_duckdb(text_col)
    sh = f"array_to_string(tk[i:i+{n - 1}], ' ')"
    series = f"unnest(generate_series(1, len(tk) - {n} + 1)) t(i)"
    return f"""
WITH btoks AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}
               WHERE {id_col} % {bench_mod} = 0),
bsh AS (SELECT DISTINCT {sh} AS shingle FROM btoks, {series}),
ctoks AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}
          WHERE {id_col} % {bench_mod} <> 0),
csh AS (SELECT DISTINCT id, {sh} AS shingle FROM ctoks, {series})
SELECT id, count(*) AS n_ngrams, count(b.shingle) AS n_matched,
       count(b.shingle)::DOUBLE / count(*) AS contamination,
       (count(b.shingle)::DOUBLE / count(*) >= {ratio_threshold})::INTEGER
         AS contaminated
FROM csh c LEFT JOIN bsh b ON c.shingle = b.shingle
GROUP BY id
"""


# ---------------------------------------------------------------------------
# Arrow-path twin of token_stats (the vectorized-Python seam, oracle-exact)


def token_stats_arrow(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """token_stats computed in Arrow-batched Python (mapInPandas)
    instead of JVM expressions — the vectorized-Python escape hatch
    every custom operator that outgrows SQL lands on (same seam as
    ml/embed and multimodal). Integer/count outputs only, so the
    result is bit-identical to the SQL form and shares its DuckDB
    oracle: the test proves the Arrow plumbing (schema, batch shape,
    worker package shipping) end-to-end, not just the formula.

    Stays the slow path for THIS op — the JVM form wins (whole-stage
    codegen, no serialization); use this shape only when the per-row
    logic genuinely can't be expressed in built-ins.
    """
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    ws = _re.compile(r"\s+")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            toks = b[text_col].map(
                lambda t: [w for w in ws.split(t) if w != ""] if t is not None else []
            )
            yield pd.DataFrame(
                {
                    "id": b[id_col],
                    "n_tokens": toks.map(len).astype("int32"),
                    "n_uniq_tokens": toks.map(lambda ts: len(set(ts))).astype("int32"),
                    "n_bytes": toks.map(
                        lambda ts: sum(len(w.encode("utf-8")) for w in ts)
                    ).astype("int64"),
                }
            )

    return df.mapInPandas(
        stats, schema="id long, n_tokens int, n_uniq_tokens int, n_bytes long"
    )


def token_stats_arrow_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = _toks_duckdb(text_col)
    return f"""
SELECT {id_col} AS id,
       coalesce(len({toks}), 0)::INTEGER AS n_tokens,
       coalesce(len(list_distinct({toks})), 0)::INTEGER AS n_uniq_tokens,
       coalesce(list_sum(list_transform({toks}, t -> octet_length(t::BLOB))), 0)::BIGINT
         AS n_bytes
FROM {table}
"""


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    rolling-hash scheme): hash every word k-gram, slide a w-wide window
    over the hash sequence, keep each window's MINIMUM — the selected
    set is guaranteed to share a fingerprint with any document that
    shares a run of >= k+w-1 words, which is what makes it the
    partial-overlap dedup key (vs the whole-doc fingerprint that only
    catches exact matches).

    One narrow projection per document — the k-gram hashes and window
    minima are array expressions over the token list; only the distinct
    fingerprint rows leave the scan, so the shuffle carries O(tokens/w)
    longs per doc. Output: (id, fp) — one row per distinct selected
    fingerprint.
    """
    toks = _toks_spark(text_col)
    elems = " || ' ' || ".join(f"tk[i + {j}]" for j in range(k))
    # h32 of each k-gram, inline (md5-prefix — same family as h32_sql)
    gram_h = (
        f"transform(sequence(0, size(tk) - {k}), i -> "
        f"cast(conv(substring(md5({elems}), 1, 8), 16, 10) as bigint))"
    )
    fps = (
        f"array_distinct(transform(sequence(0, size(hs) - {w}), "
        f"i -> array_min(slice(hs, i + 1, {w}))))"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.expr(toks).alias("tk"))
        .where(F.expr(f"size(tk) >= {k + w - 1}"))
        .select("id", F.expr(gram_h).alias("hs"))
        .select("id", F.explode(F.expr(fps)).alias("fp"))
    )


def winnow_fingerprints_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> str:
    toks = _toks_duckdb(text_col)
    elems = " || ' ' || ".join(f"tk[i + {j}]" for j in range(k))
    return f"""
WITH t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
big AS (SELECT id, tk FROM t WHERE len(tk) >= {k + w - 1}),
hs AS (SELECT id,
              list_transform(generate_series(1, len(tk) - {k - 1}), i ->
                (('0x' || substring(md5({elems}), 1, 8))::BIGINT)) AS hs
       FROM big),
fp AS (SELECT id,
              list_distinct(list_transform(generate_series(1, len(hs) - {w - 1}), i ->
                list_min(hs[i:i + {w - 1}]))) AS fps
       FROM hs)
SELECT id, unnest(fps) AS fp FROM fp
"""


def winnow_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Partial-overlap near-dup pairs from winnowing fingerprints:
    documents sharing >= min_shared selected fingerprints. The
    candidate generator is the fingerprint equi-join (each fingerprint
    is a bucket key — the same linear bucketed shape as the shingle
    and LSH joins, never all-pairs), and the shared-count filter is
    the verify stage. Catches documents that share long runs (>= k+w-1
    words) even when their overall Jaccard is low — the
    plagiarism/quotation detection complement to whole-doc dedup.
    Output: (id_a, id_b, n_shared)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_near_dups_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
) -> str:
    base = winnow_fingerprints_oracle_sql(table, id_col, text_col, k, w)
    return f"""
WITH f AS ({base})
SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
FROM f a JOIN f b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


# Gopher gate thresholds — ONE source of truth: gopher_rules, its
# oracle, AND the quality classifier's seed labels (operators/
# classifier.py) all read these; tuning them here keeps every
# consumer (and every oracle twin) in lockstep.
GOPHER_LEN_MIN, GOPHER_LEN_MAX = 5, 100000
GOPHER_MEANLEN_MIN, GOPHER_MEANLEN_MAX = 2.0, 12.0
GOPHER_SHORT_MAX = 0.6
GOPHER_STOP_MIN = 1


def gopher_pass_condition(n, mean_len, short, n_stop) -> str:
    """Dialect-free conjunction template over the four gate metrics
    (callers pass dialect-specific sub-expressions or column names)."""
    return (
        f"{n} BETWEEN {GOPHER_LEN_MIN} AND {GOPHER_LEN_MAX} "
        f"AND {mean_len} BETWEEN {GOPHER_MEANLEN_MIN} AND {GOPHER_MEANLEN_MAX} "
        f"AND {short} <= {GOPHER_SHORT_MAX} AND {n_stop} >= {GOPHER_STOP_MIN}"
    )


def gopher_parts_spark(text_col: str) -> tuple[str, str, str, str]:
    """(n, mean_len, short_frac, n_stop) Spark SQL sub-expressions."""
    toks = _toks_spark(text_col)
    stop_list = ", ".join(f"'{w}'" for w in _ALL_STOP)
    n = f"size({toks})"
    tot_len = f"aggregate({toks}, cast(0.0 as double), (acc, t) -> acc + length(t))"
    mean_len = f"({tot_len} / greatest({n}, 1))"
    short = f"(size(filter({toks}, t -> length(t) <= 2)) / cast(greatest({n}, 1) as double))"
    n_stop = f"size(filter({toks}, t -> t in ({stop_list})))"
    return n, mean_len, short, n_stop


def gopher_parts_duckdb(tk: str = "tk") -> tuple[str, str, str, str]:
    """(n, mean_len, short_frac, n_stop) DuckDB sub-expressions over a
    token-list column."""
    stop_list = ", ".join(f"'{w}'" for w in _ALL_STOP)
    n = f"len({tk})"
    mean_len = (
        f"(list_sum(list_transform({tk}, t -> CAST(length(t) AS DOUBLE)))"
        f" / greatest(len({tk}), 1))"
    )
    short = (
        f"(len(list_filter({tk}, t -> length(t) <= 2))"
        f" / CAST(greatest(len({tk}), 1) AS DOUBLE))"
    )
    n_stop = f"len(list_filter({tk}, t -> t IN ({stop_list})))"
    return n, mean_len, short, n_stop


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style document quality gates (Rae et al. 2021, Table A1
    shape): hard bounds on token count and mean token length, a
    max share of very short tokens, and a stopword-presence floor —
    each emitted as its own flag plus the conjunction, so downstream
    filtering can audit WHICH gate fired (the operational requirement
    a single opaque score fails). All pure arithmetic over one token
    projection: one scan, no shuffle, bit-exact oracle.
    Output: (id, n_tokens, mean_tok_len, short_frac, n_stop,
    pass_len, pass_tok_len, pass_short, pass_stop, pass_all)."""
    n, mean_len, short, n_stop = gopher_parts_spark(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(n).alias("n_tokens"),
        F.round(F.expr(mean_len), 6).alias("mean_tok_len"),
        F.round(F.expr(short), 6).alias("short_frac"),
        F.expr(n_stop).cast("int").alias("n_stop"),
        F.expr(f"{n} BETWEEN {GOPHER_LEN_MIN} AND {GOPHER_LEN_MAX}").alias(
            "pass_len"
        ),
        F.expr(
            f"{mean_len} BETWEEN {GOPHER_MEANLEN_MIN} AND {GOPHER_MEANLEN_MAX}"
        ).alias("pass_tok_len"),
        F.expr(f"{short} <= {GOPHER_SHORT_MAX}").alias("pass_short"),
        F.expr(f"{n_stop} >= {GOPHER_STOP_MIN}").alias("pass_stop"),
        F.expr(gopher_pass_condition(n, mean_len, short, n_stop)).alias("pass_all"),
    )


def gopher_rules_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = _toks_duckdb(text_col)
    n, mean_len, short, n_stop = gopher_parts_duckdb()
    return f"""
WITH t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
m AS (SELECT id,
             CAST({n} AS INTEGER) AS n_tokens,
             {mean_len} AS mean_len,
             {short} AS short_frac,
             CAST({n_stop} AS INTEGER) AS n_stop
      FROM t)
SELECT id, n_tokens, round(mean_len, 6) AS mean_tok_len,
       round(short_frac, 6) AS short_frac, n_stop,
       n_tokens BETWEEN {GOPHER_LEN_MIN} AND {GOPHER_LEN_MAX} AS pass_len,
       mean_len BETWEEN {GOPHER_MEANLEN_MIN} AND {GOPHER_MEANLEN_MAX} AS pass_tok_len,
       short_frac <= {GOPHER_SHORT_MAX} AS pass_short,
       n_stop >= {GOPHER_STOP_MIN} AS pass_stop,
       ({gopher_pass_condition("n_tokens", "mean_len", "short_frac", "n_stop")}) AS pass_all
FROM m
"""


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval for a fixed term query (Robertson &
    Spärck Jones BM25; Lucene's non-negative idf form
    ln(1 + (N - df + 0.5)/(df + 0.5))) — the corpus-search face of the
    text stack: decontamination lookups, eval-set retrieval, boosted
    quality sampling.

    Scale shape = inverted index as relational algebra: the token
    explode is filtered to the query's terms BEFORE any shuffle (the
    posting lists), tf is one grouped count, df one more, and the
    global (N, avgdl) scalar attaches as a broadcast literal row.
    Nothing is O(corpus × query). Per-doc scores sum their per-term
    contributions via sorted left-to-right aggregate, so the float
    total is partition-order-free and the DuckDB twin (list_reduce
    over an ORDER BY list) lands bit-identically. Final top-k is a
    row_number over the MATCHED docs only (bounded by the posting
    lists, not the corpus). Output: (id, score, rank) — rank 1..k,
    ties broken by id.
    """
    toks = _toks_spark(text_col)
    terms = sorted(set(query_terms))
    tok_rows = df.select(
        F.col(id_col).alias("id"), F.explode(F.expr(toks)).alias("t")
    )
    # corpus scalars: exact int sums → deterministic doubles
    dl = df.select(
        F.col(id_col).alias("id"), F.expr(f"size({toks})").alias("dl")
    )
    scal = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("_tot")
    ).select(
        "n_docs", (F.col("_tot") / F.col("n_docs")).alias("avgdl")
    )
    post = tok_rows.where(F.col("t").isin(terms))
    tf = post.groupBy("id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "t")
        .join(dl, "id")
        .crossJoin(F.broadcast(scal))
        .select(
            "id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    from tabsketchfm_spark.functions.ranking import ranked_topk

    total = scored.groupBy("id").agg(
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(s)), cast(0.0 as double),"
                " (a, v) -> a + v)"
            ),
            6,
        ).alias("score")
    )
    # ranked_topk plans TakeOrderedAndProject (per-partition heaps), not
    # a single-partition window over every doc matching any query term
    return ranked_topk(total, [F.desc("score"), F.asc("id")], k).select(
        "id", "score", "rank"
    )


def bm25_topk_oracle_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    toks = _toks_duckdb(text_col)
    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
WITH dl AS (SELECT {id_col} AS id, len({toks}) AS dl FROM {table}),
scal AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
post AS (SELECT {id_col} AS id, t
         FROM (SELECT {id_col}, unnest({toks}) AS t FROM {table})
         WHERE t IN ({terms})),
tf AS (SELECT id, t, count(*) AS tf FROM post GROUP BY 1, 2),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
scored AS (SELECT id,
                  ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                  * (tf * ({k1} + 1))
                  / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)) AS s
           FROM tf JOIN dfreq USING (t) JOIN dl USING (id), scal),
total AS (SELECT id,
                 round(list_reduce(list(s ORDER BY s), (a, v) -> a + v), 6) AS score
          FROM scored GROUP BY id),
ranked AS (SELECT id, score,
                  CAST(row_number() OVER (ORDER BY score DESC, id) AS INTEGER) AS rank
           FROM total)
SELECT id, score, rank FROM ranked WHERE rank <= {k}
"""


def unigram_logppl(
    df: DataFrame,
    nll_threshold: float = 4.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model scoring — the cheap perplexity-style
    quality filter of LLM corpus pipelines (KenLM-shaped gate, one
    order): train add-one-smoothed unigram probabilities on the corpus
    itself, score each document by its mean negative log-likelihood
    (= log perplexity), and flag documents above the threshold
    (gibberish / far-out-of-domain text scores high).

    p(t) = (c(t) + 1) / (T + V) from exact integer corpus counts; a
    document's NLL sums tf·ln p(t) over its distinct terms via the
    sorted left-to-right aggregate, so the float total is
    partition-order-free and bit-equal to the DuckDB list_reduce twin.
    ln perplexity (not perplexity) is emitted deliberately: exp() is
    libm-dependent across engines, ln of a deterministic ratio is not.

    Scale: one token-count shuffle (map-side combined), one posting
    join on the term, one grouped sorted-sum per doc. Output:
    (id, n_tokens, avg_nll, pass_lm).
    """
    toks = _toks_spark(text_col)
    tok_rows = df.select(
        F.col(id_col).alias("id"), F.explode(F.expr(toks)).alias("t")
    )
    counts = tok_rows.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    scal = counts.agg(
        F.sum("c").alias("tot"), F.count(F.lit(1)).alias("vocab")
    )
    tf = tok_rows.groupBy("id", "t").agg(F.count(F.lit(1)).alias("tf"))
    terms = (
        tf.join(counts, "t")
        .crossJoin(F.broadcast(scal))
        .select(
            "id",
            "tf",
            (
                F.col("tf")
                * -F.log((F.col("c") + 1.0) / (F.col("tot") + F.col("vocab")))
            ).alias("nll_t"),
        )
    )
    return (
        terms.groupBy("id")
        .agg(
            F.sum("tf").cast("int").alias("n_tokens"),
            F.expr(
                "aggregate(array_sort(collect_list(nll_t)), cast(0.0 as double),"
                " (a, v) -> a + v)"
            ).alias("_nll"),
        )
        .select(
            "id",
            "n_tokens",
            F.round(F.col("_nll") / F.col("n_tokens"), 6).alias("avg_nll"),
            (F.round(F.col("_nll") / F.col("n_tokens"), 6) <= nll_threshold).alias(
                "pass_lm"
            ),
        )
    )


def unigram_logppl_oracle_sql(
    table: str,
    nll_threshold: float = 4.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    toks = _toks_duckdb(text_col)
    return f"""
WITH tok AS (SELECT {id_col} AS id, unnest({toks}) AS t FROM {table}),
counts AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
scal AS (SELECT sum(c) AS tot, count(*) AS vocab FROM counts),
tf AS (SELECT id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
terms AS (SELECT id, tf,
                 tf * -ln((c + 1.0) / (tot + vocab)) AS nll_t
          FROM tf JOIN counts USING (t), scal),
agg AS (SELECT id, CAST(sum(tf) AS INTEGER) AS n_tokens,
               list_reduce(list(nll_t ORDER BY nll_t), (a, v) -> a + v) AS nll
        FROM terms GROUP BY id)
SELECT id, n_tokens, round(nll / n_tokens, 6) AS avg_nll,
       round(nll / n_tokens, 6) <= {nll_threshold} AS pass_lm
FROM agg
"""


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction — the transform half of the pii_scan gate:
    each pattern family is replaced by its typed placeholder
    ([EMAIL]/[PHONE]/[SSN_LIKE]), applied in sorted family order so
    both engines compose the rewrites identically; n_redacted counts
    the pre-redaction hits for audit. Pure regexp_replace — JVM-side,
    one projection, no shuffle. Output: (id, text_redacted,
    n_redacted)."""
    # specificity order: the SSN shape is a sub-language of the phone
    # pattern, so it must rewrite FIRST or every SSN reads [PHONE];
    # hit counts run against the PROGRESSIVELY redacted text so one
    # span is never counted by two families
    red = F.col(text_col)
    total = None
    for k in PII_ORDER:
        p = PII_PATTERNS[k]
        hits = F.regexp_count(red, F.lit(p)).cast("int")
        total = hits if total is None else total + hits
        red = F.regexp_replace(red, p, f"[{k.upper()}]")
    return df.select(
        F.col(id_col).alias("id"),
        red.alias("text_redacted"),
        total.alias("n_redacted"),
    )


def pii_redact_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    red = text_col
    hit_terms = []
    for k in PII_ORDER:
        p = PII_PATTERNS[k]
        # hits measured on the text as redacted SO FAR (mirrors Spark)
        hit_terms.append(f"CAST(len(regexp_extract_all({red}, '{p}')) AS INTEGER)")
        # 'g': DuckDB replaces only the first match by default; Spark
        # regexp_replace is always global
        red = f"regexp_replace({red}, '{p}', '[{k.upper()}]', 'g')"
    total = " + ".join(hit_terms)
    return f"""
SELECT {id_col} AS id, {red} AS text_redacted, {total} AS n_redacted
FROM {table}
"""


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    c: int = 60,
) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
    2009): fuse the BM25 lexical ranking with the embedding cosine
    ranking for the same corpus (vec_id aligns with doc_id in the
    lake), score = Σ 1/(c + rank_i) with an absent ranker contributing
    0. The modern lexical+semantic search combiner, as a three-way
    relational plan: two top-``pool`` rankers (each already bounded
    and shuffle-light), one full-outer equi-join on the doc id, one
    window for the final top-k. The fused score is a sum of two exact
    rationals in fixed order — bit-stable, so the DuckDB twin composes
    the two ranker oracles and lands identically.
    Output: (id, r_lex, r_sem, rrf, rank)."""
    from tabsketchfm_spark.functions.ranking import ranked_topk
    from tabsketchfm_spark.operators.vector import cosine_topk

    lex = bm25_topk(docs, query_terms, k=pool).select(
        "id", F.col("rank").alias("r_lex")
    )
    sem = (
        cosine_topk(emb, query_vec_id + 1, k=pool)
        .where(F.col("q_id") == query_vec_id)
        .select(F.col("cand_id").alias("id"), F.col("rank").alias("r_sem"))
    )
    fused = (
        lex.join(sem, "id", "full_outer")
        .select(
            "id",
            "r_lex",
            "r_sem",
            F.round(
                F.coalesce(1.0 / (F.lit(c) + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(c) + F.col("r_sem")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    return ranked_topk(fused, [F.desc("rrf"), F.asc("id")], k).select(
        "id", "r_lex", "r_sem", "rrf", "rank"
    )


def hybrid_rrf_topk_oracle_sql(
    doc_table: str,
    emb_table: str,
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    c: int = 60,
) -> str:
    from tabsketchfm_spark.operators.vector import cosine_topk_oracle_sql

    bm25 = bm25_topk_oracle_sql(doc_table, query_terms, k=pool)
    cos = cosine_topk_oracle_sql(emb_table, query_vec_id + 1, k=pool)
    return f"""
WITH lex AS (SELECT id, rank AS r_lex FROM ({bm25}) b),
sem AS (SELECT cand_id AS id, rank AS r_sem FROM ({cos}) s
        WHERE q_id = {query_vec_id}),
fused AS (SELECT COALESCE(lex.id, sem.id) AS id, r_lex, r_sem,
                 round(COALESCE(1.0 / ({c} + r_lex), 0.0)
                       + COALESCE(1.0 / ({c} + r_sem), 0.0), 9) AS rrf
          FROM lex FULL OUTER JOIN sem ON lex.id = sem.id),
ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INTEGER) AS rank
           FROM fused)
SELECT id, r_lex, r_sem, rrf, rank FROM ranked WHERE rank <= {k}
"""


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    caches: list | None = None,
    keep_first: bool = False,
) -> DataFrame:
    """Exact-substring deduplication with span REMOVAL (the
    "Deduplicating Training Data Makes Language Models Better"
    primitive, token granularity): any ``k``-token gram occurring 2+
    times anywhere in the corpus is a duplicate; every token position
    covered by a duplicated gram is dropped, and the surviving tokens
    are re-joined into the cleaned document. duplicate_span_fraction
    MEASURES copying; this op performs the edit. ``caches`` (the
    profile_table/global_rank convention) collects the persisted
    intermediates so EAGER callers can unpersist after materializing.

    ``keep_first=True`` switches to the paper's KEEP-ONE-COPY edit:
    each duplicated gram's corpus-first occurrence (smallest (id, s))
    keeps its span; only the later occurrences are removed. One extra
    fp-partitioned window over the duplicated occurrences — still no
    pair enumeration, still linear.

    Shape (all linear in corpus tokens, no pair enumeration):
    one gram projection (unrolled element_at terms — slice() copies,
    per the shingle lesson), ONE grouped gram-frequency count (a gram
    shared by 10^6 boilerplate docs costs one count row), the covered
    positions exploded from duplicated starts only, one anti-join, one
    per-doc ordered reassembly. Output: (id, n_tokens, n_removed,
    cleaned_text); docs shorter than k tokens pass through untouched.
    """
    from tabsketchfm_spark.functions.hashing import h64_sql
    from tabsketchfm_spark.sources.tables import spread

    toks = _toks_spark(text_col)
    # spread() before the expression-heavy gram explode (single-row-
    # group lake lesson); gated, so it is a no-op on well-split inputs.
    # Project to (id, text) BEFORE the spread: the subtree is then
    # Repartition(Project(…)) — structurally pruned, and never a
    # substitution target for a full-width cached `Repartition(table)`
    # left by another operator (the round-6 cache-pollution bug).
    t = spread(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), F.expr(toks).alias("tk")
    ).persist()
    gram = "concat_ws(' ', " + ", ".join(
        f"element_at(tk, s + {i + 1})" for i in range(k)
    ) + ")"
    fps = (
        t.where(F.size("tk") >= k)
        .select(
            "id",
            "tk",
            F.explode(F.sequence(F.lit(0), F.size("tk") - k)).alias("s"),
        )
        .select("id", "s", F.expr(h64_sql(gram, "spark")).alias("fp"))
        .persist()
    )
    if caches is not None:
        caches += [t, fps]
    dup_fp = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("fp")
    )
    occ = fps.join(dup_fp, "fp")
    if keep_first:
        from pyspark.sql import Window

        wf = Window.partitionBy("fp").orderBy("id", "s")
        occ = occ.withColumn("rn", F.row_number().over(wf)).where(
            F.col("rn") > 1
        )
    covered = (
        occ.select(
            "id", F.explode(F.sequence(F.col("s"), F.col("s") + k - 1)).alias("pos")
        )
        .distinct()
        .persist()
    )
    # only TOUCHED docs pay the explode + ordered-reassembly shuffle;
    # the typical mostly-unique corpus passes through as a cheap
    # per-row projection (kept == all tokens in order == array_join).
    # covered feeds 2 subtrees and touched 3 — persist both (the
    # 2+-consumer rule) so the dup-detection shuffle runs once
    touched = covered.select("id").distinct().persist()
    if caches is not None:
        caches += [covered, touched]
    untouched = t.join(touched, "id", "left_anti").select(
        "id",
        F.size("tk").alias("n_tokens"),
        F.lit(0).alias("n_removed"),
        F.array_join("tk", " ").alias("cleaned_text"),
    )
    tokens = t.join(touched, "id", "left_semi").select(
        "id", F.size("tk").alias("n_tokens"), F.posexplode("tk").alias("pos", "token")
    )
    kept = tokens.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda x: x["token"],
            ),
            " ",
        ).alias("cleaned_text"),
    ).select(
        "id",
        "n_tokens",
        (F.col("n_tokens") - F.col("n_kept")).alias("n_removed"),
        "cleaned_text",
    ).persist()
    # rebuilt feeds the output union AND emptied's anti-join — persist
    # (2+-consumer rule) so the touched-docs explode runs once
    if caches is not None:
        caches.append(rebuilt)
    # a fully-covered doc drops out of kept entirely: restore it with
    # an empty cleaned text
    emptied = (
        t.join(touched, "id", "left_semi")
        .join(rebuilt.select("id"), "id", "left_anti")
        .select(
            "id",
            F.size("tk").alias("n_tokens"),
            F.size("tk").alias("n_removed"),
            F.lit("").alias("cleaned_text"),
        )
    )
    return untouched.unionByName(rebuilt).unionByName(emptied).select(
        "id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_removed").cast("int").alias("n_removed"),
        "cleaned_text",
    )


def exact_substring_dedup_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    keep_first: bool = False,
) -> str:
    from tabsketchfm_spark.functions.hashing import h64_sql

    toks = _toks_duckdb(text_col)
    h = h64_sql(f"array_to_string(tk[s+1:s+{k}], ' ')", "duckdb")
    occ = "SELECT id, s FROM fps JOIN dup USING (fp)"
    if keep_first:
        occ = (
            "SELECT id, s FROM (SELECT id, s, row_number() OVER ("
            "PARTITION BY fp ORDER BY id, s) AS rn "
            "FROM fps JOIN dup USING (fp)) o WHERE rn > 1"
        )
    return f"""
WITH t AS MATERIALIZED (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
fps AS MATERIALIZED (SELECT id, s, {h} AS fp
        FROM (SELECT id, tk, unnest(generate_series(0, len(tk) - {k})) AS s
              FROM t WHERE len(tk) >= {k}) q),
dup AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) >= 2),
covered AS (SELECT DISTINCT id, s + j AS pos
            FROM ({occ}) d,
                 (SELECT unnest(generate_series(0, {k - 1})) AS j) js),
tokens AS (SELECT id, s AS pos, tk[s+1] AS token
           FROM (SELECT id, tk, unnest(generate_series(0, len(tk) - 1)) AS s
                 FROM t WHERE len(tk) >= 1) q),
kept AS (SELECT * FROM tokens ANTI JOIN covered USING (id, pos)),
rebuilt AS (SELECT id, count(*) AS n_kept,
                   array_to_string(list(token ORDER BY pos), ' ') AS cleaned_text
            FROM kept GROUP BY id)
SELECT t.id, CAST(len(tk) AS INTEGER) AS n_tokens,
       CAST(len(tk) - coalesce(n_kept, 0) AS INTEGER) AS n_removed,
       coalesce(cleaned_text, '') AS cleaned_text
FROM t LEFT JOIN rebuilt ON t.id = rebuilt.id
"""


def exact_substring_dedup_chars(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    caches: list | None = None,
) -> DataFrame:
    """CHARACTER-granularity ExactSubstr (the suffix-array formulation
    in "Deduplicating Training Data Makes Language Models Better" works
    on byte sequences; exact_substring_dedup is the token-level edit):
    any ``k``-char substring occurring 2+ times anywhere in the corpus
    marks all characters it covers, which are removed at character
    offsets. Same linear count→cover→anti-join→rebuild shape as the
    token edit, with one structural improvement the char domain
    allows: the gram pass hashes ``substring(txt, s+1, k)`` directly —
    no materialized char array at all until the (touched-docs-only)
    rebuild. Output: (id, n_chars, n_removed, cleaned_text); docs
    shorter than k chars pass through untouched."""
    from tabsketchfm_spark.functions.hashing import h64_sql
    from tabsketchfm_spark.sources.tables import spread

    # project-before-spread: pruned scan by construction, immune to
    # full-width cache substitution (see exact_substring_dedup)
    t = spread(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    ).persist()
    fps = (
        t.where(F.length("txt") >= k)
        .select(
            "id",
            "txt",
            F.explode(F.sequence(F.lit(0), F.length("txt") - k)).alias("s"),
        )
        .select(
            "id",
            "s",
            F.expr(h64_sql(f"substring(txt, s + 1, {k})", "spark")).alias("fp"),
        )
        .persist()
    )
    if caches is not None:
        caches += [t, fps]
    dup_fp = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("fp")
    )
    covered = (
        fps.join(dup_fp, "fp")
        .select(
            "id", F.explode(F.sequence(F.col("s"), F.col("s") + k - 1)).alias("pos")
        )
        .distinct()
        .persist()
    )
    # covered feeds touched + the kept anti-join; touched feeds three
    # branches — persist both (the 2+-consumer rule)
    touched = covered.select("id").distinct().persist()
    if caches is not None:
        caches += [covered, touched]
    untouched = t.join(touched, "id", "left_anti").select(
        "id",
        F.length("txt").alias("n_chars"),
        F.lit(0).alias("n_removed"),
        F.col("txt").alias("cleaned_text"),
    )
    # only touched docs pay the per-char explode + ordered reassembly
    chars = t.join(touched, "id", "left_semi").select(
        "id",
        F.length("txt").alias("n_chars"),
        F.posexplode(F.split("txt", "")).alias("pos", "ch"),
    )
    kept = chars.join(covered, ["id", "pos"], "left_anti")
    rebuilt = (
        kept.groupBy("id")
        .agg(
            F.first("n_chars").alias("n_chars"),
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ch"))),
                    lambda x: x["ch"],
                ),
                "",
            ).alias("cleaned_text"),
        )
        .select(
            "id",
            "n_chars",
            (F.col("n_chars") - F.col("n_kept")).alias("n_removed"),
            "cleaned_text",
        )
        .persist()
    )
    # rebuilt feeds the output union AND emptied's anti-join — persist
    # (2+-consumer rule) so the per-char explode runs once
    if caches is not None:
        caches.append(rebuilt)
    # fully-covered docs drop out of kept: restore with empty text
    emptied = (
        t.join(touched, "id", "left_semi")
        .join(rebuilt.select("id"), "id", "left_anti")
        .select(
            "id",
            F.length("txt").alias("n_chars"),
            F.length("txt").alias("n_removed"),
            F.lit("").alias("cleaned_text"),
        )
    )
    return untouched.unionByName(rebuilt).unionByName(emptied).select(
        "id",
        F.col("n_chars").cast("int").alias("n_chars"),
        F.col("n_removed").cast("int").alias("n_removed"),
        "cleaned_text",
    )


def exact_substring_dedup_chars_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> str:
    from tabsketchfm_spark.functions.hashing import h64_sql

    h = h64_sql(f"substring(txt, CAST(s + 1 AS INTEGER), {k})", "duckdb")
    return f"""
WITH t AS MATERIALIZED (SELECT {id_col} AS id, {text_col} AS txt FROM {table}),
fps AS MATERIALIZED (SELECT id, s, {h} AS fp
        FROM (SELECT id, txt, unnest(generate_series(0, length(txt) - {k})) AS s
              FROM t WHERE length(txt) >= {k}) q),
dup AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) >= 2),
covered AS (SELECT DISTINCT id, s + j AS pos
            FROM (SELECT id, s FROM fps JOIN dup USING (fp)) d,
                 (SELECT unnest(generate_series(0, {k - 1})) AS j) js),
chars AS (SELECT id, s AS pos, substring(txt, CAST(s + 1 AS INTEGER), 1) AS ch
          FROM (SELECT id, txt, unnest(generate_series(0, length(txt) - 1)) AS s
                FROM t WHERE length(txt) >= 1) q),
kept AS (SELECT * FROM chars ANTI JOIN covered USING (id, pos)),
rebuilt AS (SELECT id, count(*) AS n_kept,
                   array_to_string(list(ch ORDER BY pos), '') AS cleaned_text
            FROM kept GROUP BY id)
SELECT t.id, CAST(length(txt) AS INTEGER) AS n_chars,
       CAST(length(txt) - coalesce(n_kept, 0) AS INTEGER) AS n_removed,
       coalesce(cleaned_text, '') AS cleaned_text
FROM t LEFT JOIN rebuilt ON t.id = rebuilt.id
"""


def duplicate_span_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Per-document duplicate-SPAN coverage — the curation metric
    behind "remove docs that are >X% copied": the fraction of a
    document's winnowing fingerprints that also appear in some OTHER
    document. Near-dup pair ops answer "which docs overlap"; this
    answers "how much of THIS doc is duplicated anywhere", the
    per-document quality signal (ExactSubstr-style coverage at
    fingerprint granularity).

    Shape: the fingerprint relation (linear in corpus tokens), one
    grouped fingerprint-frequency count, one semi-style join back —
    no pair enumeration at all, so a fingerprint shared by 10^6
    boilerplate docs costs one count row, not 10^12 pairs.
    Output: (id, n_fp, n_dup_fp, dup_frac)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w).persist()
    freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    flagged = fps.join(freq, "fp").select(
        "id", (F.col("n_docs") > 1).cast("int").alias("dup")
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_fp"),
            F.sum("dup").cast("int").alias("n_dup_fp"),
        )
        .select(
            "id",
            "n_fp",
            "n_dup_fp",
            F.round(F.col("n_dup_fp") / F.col("n_fp"), 6).alias("dup_frac"),
        )
    )


def duplicate_span_fraction_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> str:
    base = winnow_fingerprints_oracle_sql(table, id_col, text_col, k, w)
    return f"""
WITH f AS ({base}),
freq AS (SELECT fp, count(*) AS n_docs FROM f GROUP BY 1)
SELECT id, CAST(count(*) AS INTEGER) AS n_fp,
       CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_dup_fp,
       round(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
         AS dup_frac
FROM f JOIN freq USING (fp)
GROUP BY id
"""


def bigram_logppl(
    df: DataFrame,
    lam: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Order-2 language-model scoring with interpolation backoff —
    the sharper sibling of unigram_logppl (word-order damage that a
    bag-of-words model cannot see raises bigram NLL):
    p(t|prev) = λ·c(prev,t)/c(prev) + (1−λ)·(c(t)+1)/(T+V).

    Bigrams come from one array projection per doc (tk[i], tk[i+1] —
    indexing, not slice, per the shingle lesson); corpus bigram and
    unigram counts are two grouped counts; the doc score is the
    sorted left-to-right sum of tf·NLL over its distinct bigrams.
    All probability inputs are exact integer counts, so the doubles
    agree cross-engine. Output: (id, n_bigrams, avg_nll).
    """
    toks = _toks_spark(text_col)
    base = df.select(F.col(id_col).alias("id"), F.expr(toks).alias("tk")).where(
        F.expr("size(tk) >= 2")
    )
    bi = base.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 2),"
                " i -> struct(tk[i] as p, tk[i + 1] as t))"
            )
        ).alias("b"),
    ).select("id", "b.p", "b.t")
    uni = base.select("id", F.explode("tk").alias("t"))
    c1 = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    scal = c1.agg(F.sum("c1").alias("tot"), F.count(F.lit(1)).alias("vocab"))
    c2 = bi.groupBy("p", "t").agg(F.count(F.lit(1)).alias("c2"))
    tf = bi.groupBy("id", "p", "t").agg(F.count(F.lit(1)).alias("tf"))
    cp = c1.select(F.col("t").alias("p"), F.col("c1").alias("cp"))
    prob = (
        F.lit(lam) * (F.col("c2") / F.col("cp"))
        + F.lit(1.0 - lam) * ((F.col("c1") + 1.0) / (F.col("tot") + F.col("vocab")))
    )
    terms = (
        tf.join(c2, ["p", "t"])
        .join(cp, "p")
        .join(c1, "t")
        .crossJoin(F.broadcast(scal))
        .select("id", (F.col("tf") * -F.log(prob)).alias("nll_t"))
    )
    return (
        terms.groupBy("id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(nll_t)), cast(0.0 as double),"
                " (a, v) -> a + v)"
            ).alias("_nll")
        )
        .join(
            bi.groupBy("id").agg(F.count(F.lit(1)).cast("int").alias("n_bigrams")),
            "id",
        )
        .select(
            "id",
            "n_bigrams",
            F.round(F.col("_nll") / F.col("n_bigrams"), 6).alias("avg_nll"),
        )
    )


def bigram_logppl_oracle_sql(
    table: str,
    lam: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    toks = _toks_duckdb(text_col)
    return f"""
WITH base AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
big AS (SELECT id, tk FROM base WHERE len(tk) >= 2),
bi AS (SELECT id, tk[i] AS p, tk[i + 1] AS t
       FROM big, unnest(generate_series(1, len(tk) - 1)) u(i)),
uni AS (SELECT id, unnest(tk) AS t FROM big),
c1 AS (SELECT t, count(*) AS c1 FROM uni GROUP BY 1),
scal AS (SELECT sum(c1) AS tot, count(*) AS vocab FROM c1),
c2 AS (SELECT p, t, count(*) AS c2 FROM bi GROUP BY 1, 2),
tf AS (SELECT id, p, t, count(*) AS tf FROM bi GROUP BY 1, 2, 3),
terms AS (SELECT id,
                 tf * -ln({lam} * (c2 / CAST(cp.c1 AS DOUBLE))
                          + {1.0 - lam} * ((c1.c1 + 1.0) / (tot + vocab))) AS nll_t
          FROM tf
          JOIN c2 USING (p, t)
          JOIN c1 cp ON cp.t = tf.p
          JOIN c1 ON c1.t = tf.t, scal),
agg AS (SELECT id, list_reduce(list(nll_t ORDER BY nll_t), (a, v) -> a + v) AS nll
        FROM terms GROUP BY id),
nb AS (SELECT id, CAST(count(*) AS INTEGER) AS n_bigrams FROM bi GROUP BY id)
SELECT id, n_bigrams, round(nll / n_bigrams, 6) AS avg_nll
FROM agg JOIN nb USING (id)
"""


def curation_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float = 0.5,
    budget: int = 256,
) -> DataFrame:
    """END-TO-END corpus curation — the composition a training-data
    team actually runs, as ONE lazy plan: Gopher hard gates ∧ quality
    score ≥ τ ∧ exact-dedup keeper (keep-lowest-id), then sequence
    packing over the survivors. Each stage is an already-certified
    operator; composing them keeps everything inside one Catalyst plan
    (the filters collapse into the packing scan — no intermediate
    materialization), and the DuckDB twin composes the same stages as
    CTEs, so the full pipeline is bit-exact end to end.
    Output: pack_sequences' (doc_id, n_tokens, seq_id, seq_offset)
    over the curated survivors."""
    ids = curation_survivors(df, id_col, text_col, min_score)
    survivors = df.join(ids, df[id_col] == ids["id"], "left_semi")
    return pack_sequences(survivors, id_col, text_col, budget)


def curation_survivors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float = 0.5,
) -> DataFrame:
    """The curation pipeline's SURVIVOR-ID stage (one column: id) —
    shared by the packing flagship and the RAG-corpus composite
    (curate → embed → index → serve): Gopher hard gates ∧ quality
    score ≥ τ ∧ exact-dedup keeper (keep-lowest-id)."""
    g = gopher_rules(df, id_col, text_col).where(F.col("pass_all")).select("id")
    q = (
        quality_score(df, id_col, text_col)
        .where(F.col("score") >= min_score)
        .select("id")
    )
    content = F.nullif(F.col(text_col).cast("string"), F.lit(""))
    keyed = df.select(F.col(id_col).alias("id"), content.alias("content")).select(
        "id", F.expr(h64_sql("content", "spark")).alias("ck")
    ).persist()  # two consumers: the group-min and the keeper filter
    keep = keyed.join(
        keyed.groupBy("ck").agg(F.min("id").alias("keep_id")), "ck"
    ).where(F.col("id") == F.col("keep_id")).select("id")
    return g.join(q, "id").join(keep, "id")


def curation_survivor_ids_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float = 0.5,
) -> str:
    """DuckDB twin of curation_survivors: a self-contained subquery
    yielding the survivor ``id`` set (the same stage composition the
    packing oracle inlines)."""
    g = gopher_rules_oracle_sql(table, id_col, text_col)
    q = quality_score_oracle_sql(table, id_col, text_col)
    key = h64_sql("content", "duckdb")
    return f"""(
WITH gq AS (SELECT id FROM ({g}) gg WHERE pass_all),
qq AS (SELECT id FROM ({q}) qs WHERE score >= {min_score}),
keyed AS (SELECT {id_col} AS id, {key} AS ck
          FROM (SELECT {id_col}, nullif(CAST({text_col} AS VARCHAR), '') AS content
                FROM {table}) t),
keep AS (SELECT keyed.id FROM keyed
         JOIN (SELECT ck, min(id) AS keep_id FROM keyed GROUP BY 1) m USING (ck)
         WHERE keyed.id = m.keep_id)
SELECT gq.id FROM gq JOIN qq USING (id) JOIN keep USING (id))"""


def curation_pipeline_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float = 0.5,
    budget: int = 256,
) -> str:
    # ONE copy of the survivor SQL (curation_survivor_ids_sql) — a
    # drift between this twin and the RAG composite's would silently
    # split the curation contract
    ids = curation_survivor_ids_sql(table, id_col, text_col, min_score)
    survivors = (
        f"(SELECT d.* FROM {table} d JOIN {ids} s ON d.{id_col} = s.id)"
    )
    return pack_sequences_oracle_sql(survivors, id_col, text_col, budget)


def pmi_topk(
    df: DataFrame,
    k: int = 25,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-word associations by pointwise mutual
    information: pmi(a,b) = ln(N·c(a,b) / (c(a)·c(b))) over corpus
    bigrams with c(a,b) ≥ min_count — the collocation detector
    (multi-word entities, templated phrases) that informs tokenizer
    merges and boilerplate lists. Reuses the bigram/unigram count
    shape of the LM gates; PMI derives from exact integer counts so
    the doubles are engine-identical. Deterministic top-k with
    (pmi desc, a, b) ordering. Output: (a, b, n_ab, pmi, rank)."""
    toks = _toks_spark(text_col)
    base = df.select(F.expr(toks).alias("tk")).where(F.expr("size(tk) >= 2"))
    bi = base.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 2),"
                " i -> struct(tk[i] as a, tk[i + 1] as b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    uni = base.select(F.explode("tk").alias("t"))
    c1 = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.count(F.lit(1)).alias("nn"))
    c2 = (
        bi.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    scored = (
        c2.join(c1.select(F.col("t").alias("a"), F.col("c").alias("ca")), "a")
        .join(c1.select(F.col("t").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    F.col("nn")
                    * F.col("n_ab")
                    / (F.col("ca").cast("double") * F.col("cb"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    from tabsketchfm_spark.functions.ranking import ranked_topk

    # scored is corpus-scale (every bigram over min_count) — the
    # two-phase ranked_topk keeps the global sort off a single task
    top = ranked_topk(scored, [F.desc("pmi"), F.asc("a"), F.asc("b")], k)
    return top.select("a", "b", "n_ab", "pmi", "rank")


def pmi_topk_oracle_sql(
    table: str,
    k: int = 25,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    toks = _toks_duckdb(text_col)
    return f"""
WITH base AS (SELECT {toks} AS tk FROM {table}),
big AS (SELECT tk FROM base WHERE len(tk) >= 2),
bi AS (SELECT tk[i] AS a, tk[i + 1] AS b
       FROM big, unnest(generate_series(1, len(tk) - 1)) u(i)),
uni AS (SELECT unnest(tk) AS t FROM big),
c1 AS (SELECT t, count(*) AS c FROM uni GROUP BY 1),
tot AS (SELECT count(*) AS nn FROM uni),
c2 AS (SELECT a, b, count(*) AS n_ab FROM bi GROUP BY 1, 2
       HAVING count(*) >= {min_count}),
scored AS (SELECT a, b, n_ab,
                  round(ln(nn * n_ab / (CAST(ca.c AS DOUBLE) * cb.c)), 9) AS pmi
           FROM c2
           JOIN c1 ca ON ca.t = c2.a
           JOIN c1 cb ON cb.t = c2.b, tot),
ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, a, b) AS INTEGER) AS rank
           FROM scored)
SELECT a, b, n_ab, pmi, rank FROM ranked WHERE rank <= {k}
"""
