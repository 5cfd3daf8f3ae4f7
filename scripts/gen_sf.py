"""Generate a LARGER scale factor of the synthetic lake for scale
evidence (VERDICT r8 item 2: scale_check stops at sf0.1; the 100-TB
claim needs at least one 10x-beyond-bench measurement).

The driver's testdata is read-only and its generator is not published,
so this reproduces the SHAPES that drive query cost — schemas, row
counts per sf, value ranges, category sets, the ~31-word document
vocabulary, near-unit 64-dim embeddings — rather than its exact bytes.
That is sufficient for scale ratios (the work per operator depends on
cardinalities and distributions, not on which seed produced them);
it is NOT a correctness corpus — oracle gates keep running on the
driver's sf0.01.

Usage: python scripts/gen_sf.py <sf> <out_dir> [--nanos] [--deepdocs]
       e.g. 1 /tmp/sf1

--deepdocs replaces the random documents table with a DEEP-COMPONENT
variant (round-9 verdict item 5: dedup_clusters is the only operator
near its linear bound at sf1, and the bench lake's near-dup graphs are
SHALLOW — a few rounds flatten them; the 100-TB claim needs evidence
on deep chains). Each doc is a 40-word sliding window (stride 4) over
a per-chain deterministic word stream: consecutive docs share 3-gram
Jaccard ~0.81 (>= the 0.8 dedup threshold), docs two steps apart
~0.65 (< threshold), so the pair graph is a disjoint union of PATHS of
length CHAIN_LEN — component diameter = CHAIN_LEN - 1, the worst case
for round-bounded CC. Chains are decorrelated by a per-chain stream
offset.
DuckDB generates and writes one parquet per table (row-group-split
files — unlike the driver's single-row-group files, so pre-shuffle
parallelism is realistic at this scale).

--nanos writes events.ts as parquet TIMESTAMP(NANOS) (via pyarrow;
DuckDB's COPY always downcasts to micros) — the driver testdata's
quirk, so the sources/tables.py nanosAsLong + micros-conversion path
gets exercised at scale too, not only at sf0.01. The nanos variant is
the HIGHER-fidelity one for events queries: after conversion it loads
as ``timestamp`` exactly like the driver's files, whereas the micros
default loads as ``timestamp_ntz`` (verified row-equal either way).
"""

from __future__ import annotations

import os
import sys

import duckdb

WORDS = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data a vector join index cache shard"
).split()  # 31 words, mirroring the sf0.1 vocabulary size

EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "MEDIUM", "STANDARD", "PROMO"]
LANGS = ["en", "en", "en", "en", "de", "fr", "zh"]  # en-heavy like sf0.1


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    nanos = "--nanos" in sys.argv[3:]
    deepdocs = "--deepdocs" in sys.argv[3:]
    os.makedirs(out, exist_ok=True)
    m = sf / 0.1  # multiplier vs the sf0.1 base counts
    n_li = int(600_000 * m)
    n_ord = int(150_000 * m)
    n_cust = int(15_000 * m)
    n_supp = int(1_000 * m)
    n_part = int(20_000 * m)
    n_ev = int(100_000 * m)
    n_doc = int(5_000 * m)
    n_emb = int(2_000 * m)
    n_users = int(1_500 * m)

    con = duckdb.connect()
    con.execute("SELECT setseed(0.42)")

    def write(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(name, "written", flush=True)

    wl = ", ".join(f"'{w}'" for w in WORDS)
    el = ", ".join(f"'{e}'" for e in EVENT_TYPES)
    sl = ", ".join(f"'{s}'" for s in SEGMENTS)
    pl = ", ".join(f"'{p}'" for p in PRIORITIES)
    tl = ", ".join(f"'{t}'" for t in PTYPES)
    ll = ", ".join(f"'{x}'" for x in LANGS)

    write(
        "SELECT CAST(i AS INTEGER) AS r_regionkey, 'region' || i AS r_name "
        "FROM (SELECT unnest(generate_series(0, 4)) i)",
        "region",
    )
    write(
        "SELECT CAST(i AS INTEGER) AS n_nationkey, 'nation' || i AS n_name, "
        "CAST(i % 5 AS INTEGER) AS n_regionkey "
        "FROM (SELECT unnest(generate_series(0, 24)) i)",
        "nation",
    )
    write(
        f"""SELECT i AS c_custkey, 'Customer#' || i AS c_name,
        CAST(floor(random() * 25) AS INTEGER) AS c_nationkey,
        round(random() * 10999.65 - 999.85, 2) AS c_acctbal,
        ([{sl}])[CAST(floor(random() * 5) + 1 AS INTEGER)] AS c_mktsegment
        FROM (SELECT unnest(generate_series(0, {n_cust - 1})) i)""",
        "customer",
    )
    write(
        f"""SELECT i AS s_suppkey, 'Supplier#' || i AS s_name,
        CAST(floor(random() * 25) AS INTEGER) AS s_nationkey,
        round(random() * 10999.65 - 999.85, 2) AS s_acctbal
        FROM (SELECT unnest(generate_series(0, {n_supp - 1})) i)""",
        "supplier",
    )
    write(
        f"""SELECT i AS p_partkey, 'part ' || i AS p_name,
        'Brand#' || CAST(floor(random() * 25) + 1 AS INTEGER) AS p_brand,
        ([{tl}])[CAST(floor(random() * 6) + 1 AS INTEGER)] AS p_type,
        CAST(floor(random() * 50) + 1 AS INTEGER) AS p_size,
        round(900 + random() * 1200, 2) AS p_retailprice
        FROM (SELECT unnest(generate_series(0, {n_part - 1})) i)""",
        "part",
    )
    write(
        f"""SELECT i AS o_orderkey,
        CAST(floor(random() * {n_cust}) AS BIGINT) AS o_custkey,
        (['O', 'F', 'P'])[CAST(floor(random() * 3) + 1 AS INTEGER)]
          AS o_orderstatus,
        round(1000 + random() * 499000, 2) AS o_totalprice,
        TIMESTAMP '1995-01-01' + INTERVAL (CAST(floor(random() * 2405) AS
          INTEGER)) DAY AS o_orderdate,
        ([{pl}])[CAST(floor(random() * 5) + 1 AS INTEGER)] AS o_orderpriority
        FROM (SELECT unnest(generate_series(0, {n_ord - 1})) i)""",
        "orders",
    )
    write(
        f"""SELECT CAST(floor(i / 4) AS BIGINT) AS l_orderkey,
        CAST(floor(random() * {n_part}) AS BIGINT) AS l_partkey,
        CAST(floor(random() * {n_supp}) AS BIGINT) AS l_suppkey,
        CAST(i % 4 + 1 AS INTEGER) AS l_linenumber,
        CAST(floor(random() * 50) + 1 AS DOUBLE) AS l_quantity,
        round(900 + random() * 104100, 2) AS l_extendedprice,
        round(floor(random() * 11) / 100, 2) AS l_discount,
        round(floor(random() * 9) / 100, 2) AS l_tax,
        (['A', 'N', 'R'])[CAST(floor(random() * 3) + 1 AS INTEGER)]
          AS l_returnflag,
        (['O', 'F'])[CAST(floor(random() * 2) + 1 AS INTEGER)] AS l_linestatus,
        TIMESTAMP '1995-01-02' + INTERVAL (CAST(floor(random() * 2498) AS
          INTEGER)) DAY AS l_shipdate
        FROM (SELECT unnest(generate_series(0, {n_li - 1})) i)""",
        "lineitem",
    )
    events_sql = f"""SELECT i AS event_id,
        TIMESTAMP '2024-01-01' + INTERVAL (CAST(floor(random() * 2591999)
          AS INTEGER)) SECOND AS ts,
        CAST(floor(random() * {n_users}) AS BIGINT) AS user_id,
        ([{el}])[CAST(floor(random() * 5) + 1 AS INTEGER)] AS event_type,
        round(random() * 560, 2) AS value,
        '{{"k": ' || CAST(floor(random() * 100) AS INTEGER) || '}}' AS props
        FROM (SELECT unnest(generate_series(0, {n_ev - 1})) i)"""
    if nanos:
        # driver-testdata fidelity: parquet TIMESTAMP(NANOS). DuckDB's
        # COPY downcasts TIMESTAMP_NS to micros, so route through arrow
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = con.execute(events_sql).fetch_arrow_table()
        fields = [
            pa.field("ts", pa.timestamp("ns")) if f.name == "ts" else f
            for f in tbl.schema
        ]
        pq.write_table(
            tbl.cast(pa.schema(fields)),
            f"{out}/events.parquet",
            version="2.6",
            coerce_timestamps=None,
            # match DuckDB COPY's row-group granularity: pyarrow's ~1Mi
            # default would emit ONE row group at sf1 — the unsplittable
            # single-task-scan pathology this generator exists to avoid
            row_group_size=122_880,
        )
        print("events written (TIMESTAMP_NS)", flush=True)
    else:
        write(events_sql, "events")
    if deepdocs:
        # deep-component variant (see module docstring): doc i =
        # words[start .. start+39], start = (i % CHAIN)*4 within chain
        # i // CHAIN; word at stream position p of chain c is
        # hash(c*1e6 + p) % len(WORDS) — deterministic, decorrelated
        # across chains (hash() is DuckDB's stable 64-bit hash)
        chain = 200
        write(
            f"""WITH base AS (
              SELECT i AS doc_id, i // {chain} AS c,
                     (i % {chain}) * 4 AS start
              FROM (SELECT unnest(generate_series(0, {n_doc - 1})) i)),
            txt AS (
              SELECT doc_id,
                list_aggregate(list_transform(generate_series(0, 39),
                  x -> ([{wl}])[CAST(hash(c * 1000000 + start + x)
                                % {len(WORDS)} + 1 AS INTEGER)]),
                  'string_agg', ' ') AS text
              FROM base)
            SELECT doc_id, text,
              ([{ll}])[CAST(floor(random() * 7) + 1 AS INTEGER)] AS lang,
              'src' || CAST(floor(random() * 20) AS INTEGER) AS source,
              CAST(length(text) AS BIGINT) AS n_chars
            FROM txt""",
            "documents",
        )
        # the remaining tables are shape-identical to the default path
    else:
        # documents: 8-110 words off the shared vocabulary (n_chars
        # matches the text — several operators derive media/features
        # from it)
        write(
            f"""WITH base AS (
              SELECT i AS doc_id,
                CAST(8 + floor(random() * 103) AS BIGINT) AS n_words
              FROM (SELECT unnest(generate_series(0, {n_doc - 1})) i)),
            txt AS (
              SELECT doc_id,
                list_aggregate(list_transform(generate_series(1, n_words),
                  x -> ([{wl}])[CAST(floor(random() * {len(WORDS)}) + 1
                                AS INTEGER)]), 'string_agg', ' ') AS text
              FROM base)
            SELECT doc_id, text,
              ([{ll}])[CAST(floor(random() * 7) + 1 AS INTEGER)] AS lang,
              'src' || CAST(floor(random() * 20) AS INTEGER) AS source,
              CAST(length(text) AS BIGINT) AS n_chars
            FROM txt""",
            "documents",
        )
    # embeddings: near-unit 64-dim float vectors (normalized gaussians)
    write(
        f"""WITH raw AS (
          SELECT i AS vec_id,
            list_transform(generate_series(1, 64),
              x -> CAST(random() * 2 - 1 AS DOUBLE)) AS g
          FROM (SELECT unnest(generate_series(0, {n_emb - 1})) i))
        SELECT vec_id,
          CAST(list_transform(g, x -> CAST(x / sqrt(list_dot_product(g, g))
               AS FLOAT)) AS FLOAT[]) AS embedding,
          CAST(floor(random() * 10) AS INTEGER) AS label
        FROM raw""",
        "embeddings",
    )
    print("done:", out, flush=True)


if __name__ == "__main__":
    main()
