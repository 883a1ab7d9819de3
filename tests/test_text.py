"""Text-tier semantics the oracle can't cover: stratified sampling
fractions (seeded Bernoulli is engine-specific)."""

from __future__ import annotations

from bfs_mapreduce_spark.operators.text_queries import q_sample_stratified
from bfs_mapreduce_spark.sources.readers import load_table


def test_stratified_fractions(spark, sf_oracle_dir):
    sample = q_sample_stratified(spark, sf_oracle_dir)
    got = {r["lang"]: r["n"] for r in sample.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_oracle_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    want = {"en": 0.2, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5}
    for lang, frac in want.items():
        observed = got.get(lang, 0) / totals[lang]
        # Bernoulli at these stratum sizes (64-218 docs): generous band
        assert abs(observed - frac) < 0.2, (lang, observed, frac)


def test_stratified_deterministic(spark, sf_oracle_dir):
    a = {r["doc_id"] for r in q_sample_stratified(spark, sf_oracle_dir).collect()}
    b = {r["doc_id"] for r in q_sample_stratified(spark, sf_oracle_dir).collect()}
    assert a == b  # fixed seed => same sample
