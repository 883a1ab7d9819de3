"""Incremental LSH must reproduce batch LSH exactly: pairs found while
ingesting the corpus in two batches == full-corpus pairs (restricted
to pairs the respective batch could introduce)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bfs_mapreduce_spark.operators.dedup_incremental import ingest_batch, init_store
from bfs_mapreduce_spark.operators.dedup_queries import q_dedup_minhash_lsh
from bfs_mapreduce_spark.sources.readers import load_table


def test_incremental_matches_batch(spark, sf_oracle_dir, tmp_path):
    store = str(tmp_path / "sigstore")
    docs = load_table(spark, sf_oracle_dir, "documents")
    first = docs.filter(F.col("doc_id") < 400)
    second = docs.filter(F.col("doc_id") >= 400)

    init_store(spark, first, store)
    # pairs introduced by the second batch (vs store + within batch)
    inc_pairs = {
        (r["doc_a"], r["doc_b"]) for r in ingest_batch(spark, second, store).collect()
    }

    full = {
        (r["doc_a"], r["doc_b"]) for r in q_dedup_minhash_lsh(spark, sf_oracle_dir).collect()
    }
    want = {(a, b) for a, b in full if a >= 400 or b >= 400}
    assert inc_pairs == want

    # pairs wholly inside the first batch were NOT reported by ingest
    assert all(a >= 400 or b >= 400 for a, b in inc_pairs)


def test_ingest_is_cumulative(spark, sf_oracle_dir, tmp_path):
    """After ingesting batch 2, re-ingesting a copy of a batch-1 doc
    must find its duplicate in the store."""
    store = str(tmp_path / "sigstore2")
    docs = load_table(spark, sf_oracle_dir, "documents")
    init_store(spark, docs, store)
    # resubmit doc 0's text under a new id — exact dup => jaccard 1.0
    clone = docs.filter(F.col("doc_id") == 0).select(
        F.lit(999_999).cast("bigint").alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ingest_batch(spark, clone, store, append=False).collect()
    }
    assert pairs.get((0, 999_999)) == 1.0


def test_reingest_is_idempotent(spark, sf_oracle_dir, tmp_path):
    """Replaying an already-ingested batch must be a no-op: no pairs
    reported, no duplicate store rows (at-least-once upstream safety)."""
    store = str(tmp_path / "sigstore3")
    docs = load_table(spark, sf_oracle_dir, "documents")
    first = docs.filter(F.col("doc_id") < 400)
    second = docs.filter(F.col("doc_id") >= 400)

    init_store(spark, first, store)
    ingest_batch(spark, second, store)
    rows_before = spark.read.parquet(f"{store}/shingles").count()

    replay = ingest_batch(spark, second, store)  # same batch again
    assert replay.count() == 0
    rows_after = spark.read.parquet(f"{store}/shingles").count()
    assert rows_after == rows_before


def _sem_pairs(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.collect()}


def test_semantic_incremental_matches_batch(spark, sf_oracle_dir, tmp_path):
    """Ingesting the embedding corpus in two batches against a frozen
    quantizer must find exactly the full-corpus within-cell pairs,
    split by which batch could introduce them."""
    from bfs_mapreduce_spark.operators.dedup_incremental import (
        ingest_semantic_batch,
        init_semantic_store,
        semantic_pairs,
    )

    store = str(tmp_path / "semstore")
    emb = load_table(spark, sf_oracle_dir, "embeddings")
    first = emb.filter(F.col("vec_id") < 400)
    second = emb.filter(F.col("vec_id") >= 400)

    init_semantic_store(spark, first, store)
    inc = _sem_pairs(ingest_semantic_batch(spark, second, store))

    cent = spark.read.parquet(f"{store}/centroids")
    full = _sem_pairs(semantic_pairs(emb, cent))
    want = {(a, b) for a, b in full if a >= 400 or b >= 400}
    assert inc == want
    assert all(a >= 400 or b >= 400 for a, b in inc)

    # replay safety: re-ingesting the same batch reports nothing new
    # and leaves the store row count unchanged
    n_rows = spark.read.parquet(f"{store}/vectors").count()
    again = _sem_pairs(ingest_semantic_batch(spark, second, store))
    assert again == set()
    assert spark.read.parquet(f"{store}/vectors").count() == n_rows


def test_incremental_matches_batch_under_skew(spark, tmp_path):
    """The skew case the batch path guards: a >max_bucket_rows hot
    cluster split across two batches. Incremental ingestion must
    reproduce the batch output — star links on the bucket canonical
    (linear, never the quadratic within-bucket pair set), with the
    star marker and below-threshold star exemption intact — restricted
    to pairs involving a batch-2 document."""
    boiler = "the quick brown fox jumps over the lazy dog again and again today"
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = (
        [(d, boiler) for d in range(300)]
        + [(1000, base + " nu"), (1001, base + " xi")]
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, text string").withColumns(
        {"lang": F.lit("en"), "source": F.lit("t"), "n_chars": F.length("text")}
    )
    first = docs.filter((F.col("doc_id") < 150) | (F.col("doc_id") == 1000))
    second = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 1000) | (F.col("doc_id") == 1001))

    from bfs_mapreduce_spark.operators.dedup_queries import minhash_lsh_pairs

    full = {
        (r["doc_a"], r["doc_b"]): (r["jaccard"], r["star"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    new_ids = {r.doc_id for r in second.select("doc_id").collect()}
    want = {p: v for p, v in full.items() if p[0] in new_ids or p[1] in new_ids}

    store = str(tmp_path / "skewstore")
    init_store(spark, first, store)
    got = {
        (r["doc_a"], r["doc_b"]): (r["jaccard"], r["star"])
        for r in ingest_batch(spark, second, store).collect()
    }
    assert got == want
    # the hot cluster contributed star links on the canonical only —
    # candidates stayed linear in the batch's bucket membership
    hot_pairs = [p for p in got if p[1] < 1000]
    assert all(a == 0 for a, _ in hot_pairs)


def test_compaction_recanonicalizes_and_is_idempotent(spark, tmp_path):
    """compact_store (round 8): after batches where the bucket MINIMUM
    arrives late (doc_id 5 joins a hot cluster canonicalized at 100),
    compaction recomputes the star set from current full membership —
    every link targets the new true minimum, the set equals the
    single-shot batch run's star links, and re-running compaction
    returns the identical frame."""
    from bfs_mapreduce_spark.operators.dedup_incremental import compact_store
    from bfs_mapreduce_spark.operators.dedup_queries import minhash_lsh_pairs

    boiler = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(d, boiler) for d in range(100, 400)] + [(5, boiler)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string").withColumns(
        {"lang": F.lit("en"), "source": F.lit("t"), "n_chars": F.length("text")}
    )
    store = str(tmp_path / "cstore")
    init_store(spark, docs.filter(F.col("doc_id") >= 100), store)
    ingest_batch(spark, docs.filter(F.col("doc_id") == 5), store)

    links = {(r.doc_a, r.doc_b) for r in compact_store(spark, store).collect()}
    # every exact copy shares every bucket; the cluster is hot in all
    # of them and 5 is the new minimum everywhere
    assert links == {(5, d) for d in range(100, 400)}
    want = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs).filter(F.col("star")).collect()
    }
    assert links == want
    again = {(r.doc_a, r.doc_b) for r in compact_store(spark, store).collect()}
    assert again == links
    # the compacted starlinks parquet is the store's consumable artifact
    stored = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(f"{store}/starlinks").collect()
    }
    assert stored == links
