"""User-extensibility surface: scalar pandas UDF, grouped-agg pandas
UDF (UDAF), and a Python UDTF (SURVEY.md §2.7 — the reference has
none; §2.10 row "UDF/UDAF/UDTF").

Placement rules the engine enforces by example:

- UDFs are the SLOW PATH. Everything expressible with built-ins stays
  JVM-side (see text_queries: tokenize/tf-idf/fingerprint are all
  built-ins). Python touches data only when the logic genuinely needs
  a library (numpy here), and then ONLY through Arrow-vectorized
  pandas UDFs — never row-at-a-time ``F.udf``.
- Grouped-agg pandas UDFs ride the normal partial-agg shuffle shape:
  state per group, executor-side.
- UDTFs are for row→many-rows expansion with per-row Python logic
  (here: chunking documents into training windows). The lateral join
  keeps the expansion streaming — no driver materialization.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from bfs_mapreduce_spark.registry import register
from bfs_mapreduce_spark.sources.readers import load_table

_CHUNK_WORDS = 32


# ---------------------------------------------------------------- scalar pandas UDF


def char_entropy_fn(texts: pd.Series) -> pd.Series:
    """Shannon entropy (bits) of each text's CHARACTER (codepoint)
    distribution — a cheap quality/diversity signal; numpy-vectorized
    per Arrow batch. utf-32-le encoding turns the string into one
    uint32 per codepoint, so the unique/count stays a numpy op for any
    script (a byte-level view would skew multi-byte scripts)."""
    out = np.empty(len(texts))
    for i, t in enumerate(texts):
        if not t:
            out[i] = 0.0
            continue
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        _, counts = np.unique(cps, return_counts=True)
        p = counts / counts.sum()
        out[i] = float(-(p * np.log2(p)).sum())
    return pd.Series(out)


def char_entropy(col: str) -> F.Column:
    return pandas_udf(char_entropy_fn, "double")(col)


@register(
    "q_udf_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
    SELECT doc_id, ROUND(entropy(c), 6) AS char_entropy
    FROM chars GROUP BY doc_id
    """,
    doc="Scalar pandas UDF: per-document character (codepoint) entropy "
    "(Arrow-batched, numpy-vectorized over a utf-32 view). Oracle: "
    "DuckDB's native entropy() aggregate over exploded characters — "
    "both engines compute -sum(p log2 p) over the same codepoint "
    "counts; rounding to 6 absorbs summation-order float noise. Also "
    "validated against a pure-Python reference in tests/test_udfs.py.",
)
def q_udf_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(char_entropy("text"), 6).alias("char_entropy"))


# ---------------------------------------------------------------- grouped-agg pandas UDF


def geo_mean_fn(v: pd.Series) -> float:
    return float(np.exp(np.log(v.to_numpy()).mean()))


def _count_fn(v: pd.Series) -> int:
    return len(v)


@register(
    "q_udaf_geomean",
    oracle="""
    SELECT event_type,
           ROUND(EXP(AVG(LN(value))), 6) AS geo_mean_value,
           COUNT(*) AS n
    FROM events WHERE value > 0 GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDF (UDAF): geometric mean of event "
    "value per type, over the POSITIVE support (the geometric mean is "
    "undefined at <= 0; round-8 scale-latent fix — sf0.1 contains "
    "value=0 rows that sf0.01 does not, so the unfiltered form passed "
    "the small-scale gate while DuckDB errored on LN(0) and numpy "
    "silently produced exp(-inf)=0 at bench scale: exactly the "
    "wrong-answer-only-at-scale class the sf0.1 sweep exists to "
    "catch). The oracle's EXP(AVG(LN(x))) identity proves the UDAF "
    "exact. Rides the standard agg shuffle — state per group, "
    "executor-side.",
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    # Series -> scalar type hints mark these as grouped-aggregate UDFs
    # (the non-deprecated spelling; PandasUDFType is on its way out)
    geo = pandas_udf(geo_mean_fn, "double")
    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg,
    # so the row count is a (trivial) pandas aggregate too
    cnt = pandas_udf(_count_fn, "long")
    return ev.groupBy("event_type").agg(
        F.round(geo("value"), 6).alias("geo_mean_value"),
        cnt("value").alias("n"),
    )


# ---------------------------------------------------------------- Python UDTF


@udtf(returnType="chunk_idx int, chunk_text string, n_words int")
class ChunkDocument:
    """Split a document into fixed-size word windows — the standard
    training-sample chunking step, as a table function."""

    def eval(self, text: str, chunk: int):  # noqa: D102
        words = text.split(" ")
        for i in range(0, len(words), chunk):
            piece = words[i : i + chunk]
            yield i // chunk, " ".join(piece), len(piece)


@register(
    "q_udtf_chunk_documents",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    idx AS (SELECT doc_id, words,
                   unnest(range((len(words) + {_CHUNK_WORDS} - 1) // {_CHUNK_WORDS})) AS chunk_idx
            FROM w)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(
             words[(chunk_idx * {_CHUNK_WORDS} + 1):((chunk_idx + 1) * {_CHUNK_WORDS})],
             ' ') AS chunk_text,
           CAST(LEAST({_CHUNK_WORDS}, len(words) - chunk_idx * {_CHUNK_WORDS}) AS INT) AS n_words
    FROM idx
    """,
    doc="Python UDTF via lateral join: one document row → N training "
    "chunks of <=32 words. The SQL oracle reproduces the chunking with "
    "list slicing, proving the UDTF exact. Expansion streams through "
    "the lateral join — nothing materializes on the driver.",
)
def q_udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_for_chunking")
    spark.udtf.register("chunk_document", ChunkDocument)
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_words
        FROM documents_for_chunking d,
             LATERAL chunk_document(d.text, {_CHUNK_WORDS}) c
        """
    )


def entropy_reference(text: str) -> float:
    """Pure-Python oracle for char_entropy (tests): codepoint-level,
    matching the UDF's utf-32 view."""
    if not text:
        return 0.0
    counts: dict[str, int] = {}
    for ch in text:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(text)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


# ------------------------------------------------- UDTF with analyze()


class NGramsUdtf:
    """Polymorphic n-gram table function (Spark 4 UDTF ``analyze``):
    the OUTPUT SCHEMA is computed at plan time from the ``n``
    argument — ``ngrams(text, 3)`` yields (pos, w1, w2, w3),
    ``ngrams(text, 2)`` yields (pos, w1, w2) — the dynamic-schema
    table-function surface a fixed ``returnType`` (ChunkDocument
    above) cannot express. ``n`` must be a constant expression: the
    schema is part of the plan, so it cannot depend on row data."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        if (
            not n.isConstantExpression
            or not isinstance(n.value, int)
            or n.value < 1
        ):
            raise ValueError("ngrams(text, n): n must be a positive "
                             "integer literal (the schema depends on it)")
        fields = [StructField("pos", IntegerType())] + [
            StructField(f"w{i + 1}", StringType()) for i in range(n.value)
        ]
        from pyspark.sql.udtf import AnalyzeResult

        return AnalyzeResult(schema=StructType(fields))

    def eval(self, text, n):  # noqa: D102
        words = (text or "").split(" ")
        for i in range(len(words) - n + 1):
            yield (i, *words[i : i + n])


@register(
    "q_udtf_ngrams_analyze",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE doc_id % 10 = 0),
    p AS (SELECT doc_id, ws, unnest(range(len(ws) - 2)) AS pos
          FROM w WHERE len(ws) >= 3)
    SELECT doc_id, CAST(pos AS INT) AS pos,
           ws[pos + 1] AS w1, ws[pos + 2] AS w2, ws[pos + 3] AS w3
    FROM p
    """,
    doc="Python UDTF with analyze() — the POLYMORPHIC table-function "
    "surface (Spark 4): the output schema is computed at plan time "
    "from the n argument (here trigrams -> pos, w1..w3; a test pins "
    "that n=2 yields a two-word schema from the same class, and that "
    "a non-constant n is rejected at analysis). Invoked through the "
    "SQL LATERAL form over the documents table; the oracle "
    "reconstructs every trigram by position. Rows are bounded by the "
    "doc sample; at scale the UDTF runs Arrow-batched per partition "
    "like every Python table function.",
)
def q_udtf_ngrams_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("ngrams", _udtf(NGramsUdtf))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, t.* FROM documents d, LATERAL ngrams(d.text, 3) t "
        "WHERE d.doc_id % 10 = 0"
    )
