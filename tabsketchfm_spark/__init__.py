"""tabsketchfm_spark — a PySpark-native data-discovery & data-pipeline engine.

A from-scratch re-design of the capabilities of IBM/tabsketchfm
(reference: /root/reference, arXiv:2407.01619) on Apache Spark:

- ``sources``   — table ingestion (CSV/parquet/metadata sidecars) and the
                  Parquet sketch store (SURVEY.md §2.1).
- ``operators`` — profiling aggregates, sketches (MinHash/SimHash/snapshot),
                  set-similarity (Jaccard/containment), top-k search,
                  column-vote ranking, dedup family, text analysis
                  (SURVEY.md §2.3-§2.8, §2.11 extensions).
- ``functions`` — reusable column-expression builders (hashing, minhash
                  permutations, cosine, z-score) shared by operators.
- ``plans``     — named query registry wired into ``__spark_entry__.py``
                  with DuckDB oracle SQL for every SQL-expressible op.
- ``streaming`` — Structured Streaming variants of the profiling core.

Design: DataFrame/SQL first; Catalyst is the optimizer; Python UDFs only
where built-ins cannot express the semantics (none so far — all sketches
are md5/bit-arithmetic column expressions that stay in whole-stage codegen).
"""

__version__ = "0.1.0"
