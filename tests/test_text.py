"""Text-tier sampling semantics: the catalog's deterministic
hash-threshold stratified sample hits its per-stratum fractions, and
the engine-native seeded-Bernoulli variant (sampleBy, kept as API
surface) does too within its wider variance band."""

from __future__ import annotations

from bfs_mapreduce_spark.operators.text_queries import (
    q_sample_stratified,
    stratified_sample_by,
)
from bfs_mapreduce_spark.sources.readers import load_table

_WANT = {"en": 0.2, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5}


def _fractions(spark, sf_oracle_dir, sample):
    got = {
        r["lang"]: r["n"]
        for r in sample.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_oracle_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    return {lang: got.get(lang, 0) / totals[lang] for lang in totals}


def test_stratified_fractions(spark, sf_oracle_dir):
    observed = _fractions(spark, sf_oracle_dir, q_sample_stratified(spark, sf_oracle_dir))
    for lang, frac in _WANT.items():
        # md5-threshold at stratum sizes 64-218: generous band
        assert abs(observed[lang] - frac) < 0.2, (lang, observed[lang], frac)


def test_stratified_sample_by_fractions(spark, sf_oracle_dir):
    observed = _fractions(
        spark, sf_oracle_dir, stratified_sample_by(spark, sf_oracle_dir)
    )
    for lang, frac in _WANT.items():
        # Bernoulli at these stratum sizes: generous band
        assert abs(observed[lang] - frac) < 0.2, (lang, observed[lang], frac)


def test_stratified_deterministic(spark, sf_oracle_dir):
    a = {r["doc_id"] for r in q_sample_stratified(spark, sf_oracle_dir).collect()}
    b = {r["doc_id"] for r in q_sample_stratified(spark, sf_oracle_dir).collect()}
    assert a == b  # pure function of doc_id => same sample
