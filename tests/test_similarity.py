"""Semantic tests for similarity search: ANN recall against the
brute-force baseline (both deterministic — fixed hyperplane seed)."""

from __future__ import annotations

from bfs_mapreduce_spark.operators.similarity_queries import (
    q_similarity_ann_lsh,
    q_similarity_topk,
)


def test_ann_recall_vs_brute_force(spark, sf_oracle_dir):
    exact = {
        (r["query_id"], r["vec_id"]) for r in q_similarity_topk(spark, sf_oracle_dir).collect()
    }
    ann = {
        (r["query_id"], r["vec_id"])
        for r in q_similarity_ann_lsh(spark, sf_oracle_dir).collect()
    }
    assert exact, "brute-force top-k must be non-empty"
    recall = len(exact & ann) / len(exact)
    # deterministic given the fixed seed; 0.4 is a conservative floor for
    # 16 tables x 6 bits on this corpus (measured ~0.6-0.8)
    assert recall >= 0.4, f"ANN recall collapsed: {recall:.3f}"


def test_ann_results_are_true_neighbors(spark, sf_oracle_dir):
    """Every ANN hit must carry the exact cosine (re-rank step is exact),
    so any pair also present in brute-force must agree on the score."""
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in q_similarity_topk(spark, sf_oracle_dir).collect()
    }
    for r in q_similarity_ann_lsh(spark, sf_oracle_dir).collect():
        key = (r["query_id"], r["vec_id"])
        if key in exact:
            assert abs(exact[key] - r["cosine"]) < 1e-9


def test_ivf_search_recall(spark, sf_oracle_dir):
    from bfs_mapreduce_spark.operators.similarity_queries import q_similarity_ivf_search

    exact = {
        (r["query_id"], r["vec_id"]) for r in q_similarity_topk(spark, sf_oracle_dir).collect()
    }
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in q_similarity_ivf_search(spark, sf_oracle_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    # 10 label-cells, 3 probed -> ~30% of the corpus scored; random-ish
    # embeddings give weak cells, so the floor is modest but must hold
    assert recall >= 0.25, f"IVF recall collapsed: {recall:.3f}"
