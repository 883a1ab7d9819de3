"""UDF surface tests: the scalar pandas UDF against a pure-Python
reference (the part the DuckDB oracle can't check)."""

from __future__ import annotations

import math

from bfs_mapreduce_spark.functions.udfs import entropy_reference, q_udf_char_entropy
from bfs_mapreduce_spark.sources.readers import load_table


def test_char_entropy_matches_reference(spark, sf_smoke_dir):
    got = {
        r["doc_id"]: r["char_entropy"]
        for r in q_udf_char_entropy(spark, sf_smoke_dir).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_smoke_dir, "documents").select("doc_id", "text").collect()
    }
    assert got.keys() == texts.keys()
    for doc_id, text in texts.items():
        assert math.isclose(got[doc_id], round(entropy_reference(text), 6), abs_tol=1e-6)
        # sanity: entropy bounded by log2 of alphabet size
        assert 0.0 <= got[doc_id] <= math.log2(max(len(set(text)), 2))


def test_udtf_analyze_polymorphic_schema(spark, sf_smoke_dir):
    """The analyze() UDTF's schema follows the n literal, and a
    non-constant n is rejected at analysis time (the schema is part
    of the plan, so it cannot depend on row data)."""
    import pytest
    from pyspark.sql.functions import udtf

    from bfs_mapreduce_spark.functions.udfs import NGramsUdtf
    from bfs_mapreduce_spark.sources.readers import load_table

    spark.udtf.register("ngrams_t", udtf(NGramsUdtf))
    load_table(spark, sf_smoke_dir, "documents").createOrReplaceTempView(
        "docs_t"
    )
    two = spark.sql(
        "SELECT t.* FROM docs_t d, LATERAL ngrams_t(d.text, 2) t LIMIT 1"
    )
    assert two.columns == ["pos", "w1", "w2"]
    four = spark.sql(
        "SELECT t.* FROM docs_t d, LATERAL ngrams_t(d.text, 4) t LIMIT 1"
    )
    assert four.columns == ["pos", "w1", "w2", "w3", "w4"]
    with pytest.raises(Exception, match="positive integer literal"):
        spark.sql(
            "SELECT t.* FROM docs_t d, "
            "LATERAL ngrams_t(d.text, CAST(d.doc_id AS INT)) t"
        ).collect()
