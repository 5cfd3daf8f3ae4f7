"""BPE merge learning — tokenizer TRAINING as a lake operator.

Learns the first ``n_merges`` byte-pair-encoding merges from the
documents corpus (Sennrich et al. 2016: repeatedly merge the most
frequent adjacent symbol pair, weighted by word frequency). This is
the training-side counterpart to the existing token-counting ops: a
corpus pipeline that ships its own subword vocabulary needs exactly
this loop, and at 100 TB the only data-sized work is ONE word-count
aggregation — every merge round runs over the (distinct-word, count)
frame, which is vocabulary-sized, not corpus-sized.

Cross-engine determinism engineering:
- a word's symbol sequence is a STRING with double spaces between
  symbols and single-space padding (' a  b  </w> ') — ``replace(seq,
  ' a  b ', ' ab ')`` then applies a merge left-to-right greedily and
  keeps the delimiter structure intact, with byte-identical semantics
  in Spark and DuckDB (both replace all non-overlapping occurrences
  scanning left, continuing after each replacement);
- pair counts are integer sums; the winning pair per round is
  (count DESC, s1, s2) — total order, no float anywhere;
- the Spark side learns merges with one tiny driver collect per round
  (a single row — the sequential dependency is inherent to BPE); the
  DuckDB oracle replays the SAME rounds as a chained-CTE program with
  scalar subqueries, so the gate checks the whole learning trajectory,
  not just the last state. MATERIALIZED on every multiply-referenced
  CTE — DuckDB inlines plain CTEs per reference site.

Output: one row per learned merge,
(round, left_sym, right_sym, merged, pair_count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Free a superseded localCheckpoint's blocks NOW. Dataset.unpersist
    is a silent no-op for checkpointed frames (their blocks hang off the
    internal RDD, not the CacheManager), so reach through the LogicalRDD
    to the RDD itself; best-effort — the ContextCleaner frees the blocks
    on GC if this private surface ever moves."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass

WORD_RE = "^[a-z]+$"
MAX_WORD_LEN = 16
END = "</w>"


def _base_seq():
    """The double-space symbol encoding (' a  b  </w> ') — the
    load-bearing cross-engine contract every oracle replays; ONE
    definition for learn / apply / sweep."""
    return F.concat(
        F.lit(" "),
        F.concat_ws("  ", F.split("w", "")),
        F.lit("  " + END + " "),
    )


def _apply_merges(col, merges):
    """Greedy left-to-right merge application: chained replace() over
    the double-space encoding (byte-identical semantics in Spark and
    DuckDB)."""
    for s1, s2 in merges:
        col = F.replace(col, F.lit(f" {s1}  {s2} "), F.lit(f" {s1}{s2} "))
    return col


def _clean_words(docs: DataFrame, max_word_len: int, keep_doc_id: bool = False) -> DataFrame:
    """ONE definition of "clean word" (lowercase-alpha, bounded length)
    shared by the learn and apply paths — its SQL twin is
    _words_sql(); keep them in lockstep."""
    cols = (["doc_id"] if keep_doc_id else []) + [
        F.explode(F.split("text", r"\s+")).alias("w")
    ]
    return (
        docs.select(*cols)
        .where(F.col("w").rlike(WORD_RE))
        .where(F.length("w").between(2, max_word_len))
    )


def _words_sql(max_word_len: int, keep_doc_id: bool = False) -> str:
    """DuckDB twin of _clean_words."""
    sel = ("doc_id, " if keep_doc_id else "") + "w"
    inner = ("doc_id, " if keep_doc_id else "") + (
        "unnest(string_split_regex(text, '\\s+')) AS w"
    )
    return (
        f"SELECT {sel} FROM (SELECT {inner} FROM documents) t\n"
        f"  WHERE regexp_full_match(w, '[a-z]+')\n"
        f"    AND length(w) BETWEEN 2 AND {max_word_len}"
    )


def _word_counts(docs: DataFrame, max_word_len: int) -> DataFrame:
    """(word, cnt) for clean words — the only corpus-sized pass;
    everything downstream is vocabulary-sized."""
    return (
        _clean_words(docs, max_word_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_learn(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = 8,
    max_word_len: int = MAX_WORD_LEN,
    recount_every: int = 8,
) -> DataFrame:
    """Exact greedy BPE with BOUNDED per-round cost: the segmentation
    is materialized (localCheckpoint — flat, vocabulary-sized) and
    re-materialized every ``recount_every`` merges, so each round's
    pair count chains at most ``recount_every`` replace() expressions
    over the checkpointed frame instead of the full merge history
    (O(n²) expression growth at vocabulary-sized n_merges). The
    trajectory is IDENTICAL for any recount_every — every round's
    counts are computed on the fully-current segmentation — which the
    batch-invariance property test pins."""
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # the ONLY corpus-sized job; everything after runs over this
    # vocabulary-sized frame
    seg = (
        _word_counts(docs, max_word_len)
        .select(_base_seq().alias("seq"), "cnt")
        .localCheckpoint()
    )

    merges: list[tuple[str, str, int]] = []
    batch: list[tuple[str, str]] = []
    for rnd in range(n_merges):
        if len(batch) >= recount_every:
            old = seg
            seg = seg.select(
                _apply_merges(F.col("seq"), batch).alias("seq"), "cnt"
            ).localCheckpoint()
            _release_checkpoint(old)
            batch = []
        a = F.split(F.trim(_apply_merges(F.col("seq"), batch)), "  ")
        pairs = (
            seg.select(a.alias("a"), "cnt")
            .where(F.size("a") >= 2)
            .select(
                F.explode(F.sequence(F.lit(0), F.size("a") - 2)).alias("j"),
                "a",
                "cnt",
            )
            .select(
                F.element_at("a", F.col("j") + 1).alias("s1"),
                F.element_at("a", F.col("j") + 2).alias("s2"),
                "cnt",
            )
        )
        top = (
            pairs.groupBy("s1", "s2")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("s1"), F.asc("s2"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append((r["s1"], r["s2"], r["c"]))
        batch.append((r["s1"], r["s2"]))
    _release_checkpoint(seg)
    return spark.createDataFrame(
        [
            (i + 1, s1, s2, s1 + s2, int(c))
            for i, (s1, s2, c) in enumerate(merges)
        ],
        "round int, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def _oracle_ctes(
    n_merges: int,
    max_word_len: int,
    final_round: bool = False,
    words_sql: str | None = None,
) -> list[str]:
    """The learning program's CTE chain (words carried through so a
    tokenize tail can join back). ``final_round`` also materializes
    r{n_merges} — the fully segmented vocabulary after ALL merges.
    ``words_sql`` swaps the corpus: any SELECT producing a ``w``
    column (default: clean words of ``documents``)."""
    ctes = [
        f"""wc AS MATERIALIZED (
  SELECT w, count(*) AS cnt FROM ({words_sql or _words_sql(max_word_len)}) cw
  GROUP BY 1)""",
        f"""r0 AS MATERIALIZED (
  SELECT w,
         ' ' || array_to_string(string_split(w, ''), '  ') || '  {END} ' AS seq,
         cnt
  FROM wc)""",
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        ctes.append(
            f"""p{k} AS (
  SELECT a[j] AS s1, a[j + 1] AS s2, cnt FROM (
    SELECT a, cnt, unnest(generate_series(1, array_length(a) - 1)) AS j
    FROM (SELECT string_split(trim(seq), '  ') AS a, cnt FROM r{p}) t0
    WHERE array_length(a) >= 2) t1)"""
        )
        ctes.append(
            f"""m{k} AS MATERIALIZED (
  SELECT s1, s2, CAST(sum(cnt) AS BIGINT) AS c FROM p{k}
  GROUP BY 1, 2 ORDER BY c DESC, s1, s2 LIMIT 1)"""
        )
        if k < n_merges or final_round:
            # coalesce to a never-matching sentinel: when the corpus
            # exhausts its merges before n_merges, m{k} is EMPTY and a
            # bare scalar subquery would turn replace() into
            # replace(seq, NULL, NULL) = NULL, poisoning every later
            # round (the Spark side just stops merging — same no-op)
            ctes.append(
                f"""r{k} AS MATERIALIZED (
  SELECT w, replace(seq,
                 coalesce((SELECT ' ' || s1 || '  ' || s2 || ' ' FROM m{k}), chr(1)),
                 coalesce((SELECT ' ' || s1 || s2 || ' ' FROM m{k}), chr(1))) AS seq,
         cnt
  FROM r{p})"""
            )
    return ctes


def bpe_learn_oracle_sql(
    n_merges: int = 8, max_word_len: int = MAX_WORD_LEN
) -> str:
    """The same learning loop as a static chained-CTE program — DuckDB
    derives each round's winning pair itself, so merge trajectories
    must agree bit-for-bit."""
    ctes = _oracle_ctes(n_merges, max_word_len)
    selects = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, s1 AS left_sym, s2 AS right_sym, "
        f"s1 || s2 AS merged, c AS pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def bpe_token_counts(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = 8,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """The learned tokenizer APPLIED: per-document subword-token counts
    under the corpus's own BPE merges — the token-budget accounting a
    pipeline runs after training its vocabulary.

    Learning happens once (driver-side merge list, as in bpe_learn);
    application is two vocabulary-sized steps + one corpus-sized join:
    segment every distinct word under the final merge set (word →
    n_subwords map, broadcast), then explode documents into clean
    words and sum the broadcast-joined subword counts per document.
    Output: (doc_id, n_words, n_subwords)."""
    from tabsketchfm_spark.sources.tables import load_table

    return bpe_tokenize_with(
        spark,
        sf_dir,
        merges=[
            (r["left_sym"], r["right_sym"])
            for r in bpe_learn(spark, sf_dir, n_merges, max_word_len).collect()
        ],
        max_word_len=max_word_len,
    )


def bpe_tokenize_with(
    spark: SparkSession,
    sf_dir: str,
    merges: list[tuple[str, str]],
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Apply a PRECOMPUTED merge list (skip re-learning — callers that
    already ran bpe_learn pass its pairs here)."""
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    counts = _word_counts(docs, max_word_len)
    seq = _apply_merges(_base_seq(), merges)
    vocab = counts.select(
        "w", F.size(F.split(F.trim(seq), "  ")).alias("n_sym")
    )
    dw = _clean_words(docs, max_word_len, keep_doc_id=True)
    return (
        dw.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_subwords"),
        )
    )


def bpe_vocab_curve(
    spark: SparkSession,
    sf_dir: str,
    sizes: tuple[int, ...] = (0, 2, 4, 8),
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Vocabulary-size sweep: corpus segmentation statistics at several
    merge counts — the curve a tokenizer-training pipeline reads to
    pick its vocab budget (subwords/word falls as merges grow; symbol
    types rise). Greedy BPE trajectories are PREFIX-STABLE (merge k
    depends only on merges 1..k-1), so the Spark side learns once at
    max(sizes) and slices prefixes; the oracle re-derives every chain
    independently and must land on the same numbers.
    Output: (n_merges, total_words, total_subwords, n_symbol_types,
    subwords_per_word)."""
    from tabsketchfm_spark.sources.tables import load_table

    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learn(spark, sf_dir, max(sizes), max_word_len).collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    counts = _word_counts(docs, max_word_len).persist()
    rows = []
    for n in sorted(sizes):
        seq = _apply_merges(_base_seq(), merges[:n])
        frame = counts.select(
            F.split(F.trim(seq), "  ").alias("a"), "cnt"
        )
        tot = frame.agg(
            F.sum("cnt").alias("tw"),
            F.sum(F.size("a") * F.col("cnt")).alias("ts"),
        )
        types = frame.select(F.explode("a").alias("s")).agg(
            F.countDistinct("s").alias("nt")
        )
        # tie-safe quantizer (floor(x*1e6+0.5)/1e6): round() ties split
        # across engines
        rows.append(
            tot.crossJoin(F.broadcast(types))
            .select(
                F.lit(n).alias("n_merges"),
                F.col("tw").cast("bigint").alias("total_words"),
                F.col("ts").cast("bigint").alias("total_subwords"),
                F.col("nt").cast("bigint").alias("n_symbol_types"),
                (
                    F.floor(
                        (F.col("ts").cast("double") / F.col("tw")) * 1e6 + 0.5
                    )
                    / 1e6
                ).alias("subwords_per_word"),
            )
            .collect()[0]
        )
    counts.unpersist()
    return spark.createDataFrame(
        rows,
        "n_merges int, total_words bigint, total_subwords bigint, "
        "n_symbol_types bigint, subwords_per_word double",
    )


def bpe_vocab_curve_oracle_sql(
    sizes: tuple[int, ...] = (0, 2, 4, 8), max_word_len: int = MAX_WORD_LEN
) -> str:
    parts = []
    for n in sorted(sizes):
        joined = ",\n".join(_oracle_ctes(n, max_word_len, final_round=True))
        parts.append(
            f"""(WITH {joined},
sym AS (SELECT string_split(trim(seq), '  ') AS a, cnt FROM r{n}),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tw,
               CAST(sum(array_length(a) * cnt) AS BIGINT) AS ts FROM sym),
typ AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS nt
        FROM (SELECT unnest(a) AS s FROM sym) u)
SELECT {n} AS n_merges, tw AS total_words, ts AS total_subwords,
       nt AS n_symbol_types,
       floor((CAST(ts AS DOUBLE) / tw) * 1e6 + 0.5) / 1e6
         AS subwords_per_word
FROM tot, typ)"""
        )
    return "\nUNION ALL\n".join(parts)


def bpe_token_counts_oracle_sql(
    n_merges: int = 8, max_word_len: int = MAX_WORD_LEN
) -> str:
    ctes = _oracle_ctes(n_merges, max_word_len, final_round=True)
    ctes.append(
        f"""vocab AS MATERIALIZED (
  SELECT w, array_length(string_split(trim(seq), '  ')) AS n_sym
  FROM r{n_merges})"""
    )
    ctes.append(f"dw AS ({_words_sql(max_word_len, keep_doc_id=True)})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_subwords
FROM dw JOIN vocab USING (w) GROUP BY 1
"""
    )


# --- schema-sized corpora: driver-side learning + DESCRIBE-based oracle ----


def learn_merges_py(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Greedy BPE over a driver-side (word, cnt) corpus — the same
    algorithm, double-space encoding, and (count DESC, s1, s2)
    tie-break as ``bpe_learn``, for corpora that are SCHEMA-sized
    rather than data-sized (the lake's column names: ≤ a few dozen
    words). A per-round Spark job there is pure overhead; driver-side
    is the right locality, exactly like schema inspection itself.
    Python ``str.replace`` shares the left-to-right non-overlapping
    continuation semantics of Spark/DuckDB ``replace()``, so the
    trajectory is bit-identical to the engine replay the DuckDB
    oracle derives independently (parity pinned in
    tests/test_hypothesis_props.py::test_learn_merges_py_matches_direct_fold)."""
    seqs = [
        [" " + "  ".join(w) + "  " + END + " ", int(c)] for w, c in word_counts
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, c in seqs:
            syms = s.strip().split("  ")
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (s1, s2), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((s1, s2, c))
        pat, rep = f" {s1}  {s2} ", f" {s1}{s2} "
        for rec in seqs:
            rec[0] = rec[0].replace(pat, rep)
    return merges


def lake_column_word_counts(spark: SparkSession, sf_dir: str) -> list[tuple[str, int]]:
    """The lake's column-name word corpus: every '_'-separated token of
    every column name across all lake tables, with multiplicity (the
    reference tokenizes column names with its pretrained wordpiece
    vocabulary, tabular_tokenizer.py:155-160; this engine learns the
    subword vocabulary from the lake's own schema). Schema-only — no
    data job."""
    from tabsketchfm_spark.sources.tables import TABLE_NAMES, load_table

    counts: dict[str, int] = {}
    for t in TABLE_NAMES:
        for name in load_table(spark, sf_dir, t).columns:
            for w in name.split("_"):
                if w:
                    counts[w] = counts.get(w, 0) + 1
    return sorted(counts.items())


def name_corpus_words_sql() -> str:
    """DuckDB twin of lake_column_word_counts' word stream: DESCRIBE
    each registered lake view, split names on '_'. Dynamic — no
    hardcoded schema on either side."""
    from tabsketchfm_spark.sources.tables import TABLE_NAMES

    names = "\nUNION ALL\n".join(
        f"    SELECT column_name FROM (DESCRIBE {t})" for t in TABLE_NAMES
    )
    return (
        "SELECT unnest(list_filter(string_split(column_name, '_'), "
        "t -> t <> '')) AS w\n  FROM (\n" + names + "\n  ) lake_names"
    )


def name_corpus_learning_ctes(n_merges: int) -> list[str]:
    """The full learning replay over the column-name corpus: the
    m1..m{n_merges} winning-pair CTEs any consumer can re-apply (e.g.
    the subword M9 oracle segments the profile's own words through
    them). Prepend to any oracle that consumes subword column-name
    tokens."""
    return _oracle_ctes(
        n_merges, MAX_WORD_LEN, final_round=False, words_sql=name_corpus_words_sql()
    )


# --- tokenizer artifact sink/scan -------------------------------------------


def merges_hash(merges: list[tuple[str, str]]) -> str:
    """ONE definition of a merge list's content hash — the tokenizer
    CHANGE SIGNAL: save_merges embeds it in the artifact, and
    dedup.sig_store_reshingle compares it against the signature
    store's recorded tokenizer_hash to decide whether stored
    signatures are stale. Order-sensitive by construction (BPE merges
    are an ordered program, not a set)."""
    import hashlib
    import json

    blob = json.dumps(
        [[s1, s2] for s1, s2 in merges],
        separators=(",", ":"),
        ensure_ascii=False,
    )
    return hashlib.md5(blob.encode()).hexdigest()


def save_merges(path: str, merges: list[tuple[str, str]]) -> dict:
    """Tokenizer artifact sink (the S13 checkpoint pattern for the
    BPE vocabulary): write the ORDERED merge list as JSON with an
    embedded content hash, closing the learn→save→serve loop — a
    pipeline trains its vocabulary once and every later tokenization
    job loads the identical merges. Returns the manifest."""
    import json

    payload = [[s1, s2] for s1, s2 in merges]
    manifest = {
        "n_merges": len(merges),
        "content_hash": merges_hash(merges),
        "merges": payload,
    }
    with open(path + ".json", "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, ensure_ascii=False)
    return manifest


def load_merges(path: str, verify: bool = True) -> list[tuple[str, str]]:
    """Scan the merges artifact; a tampered or truncated file fails
    loudly (hash mismatch), never silently mis-tokenizes."""
    import json

    with open(path + ".json", encoding="utf-8") as f:
        manifest = json.load(f)
    payload = manifest["merges"]
    if verify:
        got = merges_hash([(s1, s2) for s1, s2 in payload])
        if got != manifest["content_hash"]:
            raise IOError(
                f"merge artifact hash mismatch at {path}: "
                f"manifest {manifest['content_hash']}, content {got}"
            )
    return [(s1, s2) for s1, s2 in payload]
