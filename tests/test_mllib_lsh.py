"""MLlib LSH variants: recall against the exact operators — the
meaningful contract for approximate indexes (their RNG hash families
are not oracle-reproducible)."""

from __future__ import annotations

from tabsketchfm_spark.operators.dedup import ngram_jaccard_pairs
from tabsketchfm_spark.operators.mllib_lsh import mllib_brp_ann, mllib_minhash_dedup
from tabsketchfm_spark.operators.vector import cosine_topk
from tabsketchfm_spark.sources.tables import load_table


def test_mllib_minhash_dedup_recall(spark, sf01):
    docs = load_table(spark, sf01, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in mllib_minhash_dedup(docs, threshold=0.5).collect()
    }
    assert exact, "fixture should contain near-dup documents"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))


def test_mllib_brp_ann_overlaps_exact_topk(spark, sf01):
    emb = load_table(spark, sf01, "embeddings")
    exact = {
        (r.q_id, r.cand_id)
        for r in cosine_topk(emb, 5, k=5).collect()
    }
    approx = {
        (r.q_id, r.cand_id)
        for r in mllib_brp_ann(emb, query_ids_max=5, k=5).collect()
    }
    # euclidean-vs-cosine metric mismatch bounds this below 1.0; require
    # substantial overlap to prove the index finds real neighbors
    overlap = len(exact & approx) / len(exact)
    assert overlap >= 0.4, (overlap, len(exact), len(approx))


def test_mllib_mlp_learns_length_class(spark, sf01):
    """The M4 MLlib twin must actually learn: test accuracy well above
    the ~0.5 balanced-class baseline (train acc near 1 on a separable
    count-vector task)."""
    from tabsketchfm_spark.plans import registry

    rows = {
        r["split"]: r
        for r in registry.queries()["m4m_mllib_mlp_length"](spark, sf01).collect()
    }
    assert set(rows) == {"train", "test"}
    assert rows["train"]["accuracy"] >= 0.9
    assert rows["test"]["accuracy"] >= 0.8
