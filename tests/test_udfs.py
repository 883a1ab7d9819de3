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
