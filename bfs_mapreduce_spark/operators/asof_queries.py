"""As-of and range joins over the ``events`` (and ``orders``) tables —
SURVEY.md §2.10 "As-of / interval join" (NEW; the reference has no
analogue).

Spark has no ASOF JOIN operator, so the engine expresses it as the
**union-tagged ordered carry-forward**: union the build side (tag 0)
and probe side (tag 1) into one stream keyed by (key, time, tag), then
one window pass carries the most recent build row forward to each
probe row (``last(..., ignorenulls=True)``).

Why this shape at 100 TB: it is ONE shuffle on the join key and one
ordered pass per partition — exactly what a sort-merge as-of costs.
The naive alternatives either explode (inequality theta-join → per-key
cross product) or double-shuffle (windowed max-per-bucket + join).
Skewed keys split fine under AQE because the window partitions by the
same key the exchange hashed on.

Range (interval) joins use the other standard trick: bucket time into
interval-width buckets, explode the probe row into the (two) buckets
its window overlaps, equi-join on (key, bucket), then filter the exact
predicate — a bounded 2× fan-out instead of an unbounded inequality
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bfs_mapreduce_spark.registry import register
from bfs_mapreduce_spark.sources.readers import load_table

_HOUR_US = 3_600_000_000


def _us(col: str) -> F.Column:
    """TIMESTAMP_NTZ → epoch micros (session tz pinned UTC = DuckDB EPOCH_US)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


@register(
    "q_asof_join",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate),
    od AS (SELECT o.*, ord.o_totalprice
           FROM o JOIN orders ord USING (o_orderkey))
    SELECT e.event_id, e.user_id, e.ts, od.o_orderkey, od.o_totalprice
    FROM events e ASOF LEFT JOIN od
      ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts
    """,
    doc="As-of join events→orders: for each event, the user's most "
    "recent order at event time. Orders deduped per (custkey, date) by "
    "max orderkey so the match is deterministic. Union-tagged ordered "
    "carry-forward: one shuffle on user_id, one window pass.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    # deterministic build side: one order per (custkey, orderdate)
    wo = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    od = (
        orders.withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    build = od.select(
        F.col("o_custkey").alias("user_id"),
        _us("o_orderdate").alias("t_us"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "o_orderkey",
        "o_totalprice",
    )
    probe = ev.select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(1).alias("tag"),
        "event_id",
        "ts",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    # tag 0 sorts before tag 1 at equal time → an order dated exactly at
    # the event timestamp IS visible to it (ASOF's <= semantics).
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "tag", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        build.unionByName(probe)
        .withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("asof_totalprice", F.last("o_totalprice", ignorenulls=True).over(w))
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_orderkey").alias("o_orderkey"),
        F.col("asof_totalprice").alias("o_totalprice"),
    )


@register(
    "q_asof_join_forward",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate),
    od AS (SELECT o.*, ord.o_totalprice
           FROM o JOIN orders ord USING (o_orderkey))
    SELECT e.event_id, e.user_id, e.ts,
           od.o_orderkey AS next_orderkey, od.o_totalprice AS next_totalprice
    FROM events e ASOF LEFT JOIN od
      ON e.user_id = od.o_custkey AND od.o_orderdate >= e.ts
    """,
    doc="Forward as-of (the mirror direction): for each event, the "
    "user's NEXT order at or after event time — conversion-lead "
    "analysis. Same union-tagged plan as q_asof_join but the window "
    "carries BACKWARD (first following build row, probe sorted before "
    "build at equal time so an order dated exactly at the event "
    "matches). Still one shuffle + one ordered pass.",
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    od = (
        orders.withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    build = od.select(
        F.col("o_custkey").alias("user_id"),
        _us("o_orderdate").alias("t_us"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "o_orderkey",
        "o_totalprice",
    )
    probe = ev.select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(0).alias("tag"),
        "event_id",
        "ts",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    # probe (tag 0) sorts before build (tag 1) at equal time → an order
    # dated exactly at the event timestamp IS visible (>= semantics);
    # o_orderkey ascending makes first() deterministic under date ties.
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "tag", "o_orderkey")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = (
        build.unionByName(probe)
        .withColumn("next_orderkey", F.first("o_orderkey", ignorenulls=True).over(w))
        .withColumn("next_totalprice", F.first("o_totalprice", ignorenulls=True).over(w))
    )
    return carried.filter(F.col("tag") == 0).select(
        "event_id", "user_id", "ts", "next_orderkey", "next_totalprice"
    )


@register(
    "q_asof_join_nearest",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, MAX(event_id) AS p_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    b AS (
      SELECT c.event_id, c.user_id, c.ts, p.p_event_id AS bk, p.ts AS bd
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND p.ts <= c.ts),
    f AS (
      SELECT c.event_id, p.p_event_id AS fk, p.ts AS fd
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND p.ts >= c.ts),
    d AS (
      SELECT b.event_id, b.user_id, b.ts, bk, bd, fk, fd,
             CASE WHEN bk IS NULL AND fk IS NULL THEN NULL
                  WHEN fk IS NULL THEN 'backward'
                  WHEN bk IS NULL THEN 'forward'
                  WHEN date_diff('microsecond', bd, b.ts)
                       <= date_diff('microsecond', b.ts, fd) THEN 'backward'
                  ELSE 'forward' END AS direction
      FROM b JOIN f USING (event_id))
    SELECT event_id, user_id, ts,
           CASE direction WHEN 'backward' THEN bk WHEN 'forward' THEN fk END
             AS p_event_id,
           CASE direction WHEN 'backward' THEN bd WHEN 'forward' THEN fd END
             AS p_ts,
           direction
    FROM d
    """,
    doc="Nearest as-of: each click matched to the same user's CLOSEST "
    "purchase in either direction, ties to the earlier (backward) "
    "one — attribution when sessions interleave. Both direction "
    "carries run as two window frames over the SAME union-tagged "
    "sorted stream: still one shuffle on user_id, one sort. The "
    "equal-time edge is absorbed by the tie rule: a purchase at "
    "exactly the click's timestamp is the backward match at delta 0, "
    "which always wins, so the forward frame's equal-time blindness "
    "(build sorts before probe) cannot change the answer.",
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    build = purch.select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        F.struct(
            _us("ts").alias("p_us"),
            F.col("p_event_id"),
            F.col("ts").cast("timestamp_ntz").alias("p_ts"),
        ).alias("p"),
    )
    probe = clicks.select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(1).alias("tag"),
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.lit(None)
        .cast("struct<p_us:bigint,p_event_id:bigint,p_ts:timestamp_ntz>")
        .alias("p"),
    )
    order_cols = [F.col("t_us"), F.col("tag"), F.col("p.p_event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order_cols)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = (
        build.unionByName(probe)
        .withColumn("b", F.last("p", ignorenulls=True).over(wb))
        .withColumn("f", F.first("p", ignorenulls=True).over(wf))
        .filter(F.col("tag") == 1)
    )
    bdelta = F.col("t_us") - F.col("b.p_us")
    fdelta = F.col("f.p_us") - F.col("t_us")
    direction = (
        F.when(F.col("b").isNull() & F.col("f").isNull(), F.lit(None).cast("string"))
        .when(F.col("f").isNull(), F.lit("backward"))
        .when(F.col("b").isNull(), F.lit("forward"))
        .when(bdelta <= fdelta, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    pick = lambda field: (
        F.when(F.col("direction") == "backward", F.col(f"b.{field}"))
        .when(F.col("direction") == "forward", F.col(f"f.{field}"))
        .otherwise(F.lit(None))
    )
    return (
        carried.withColumn("direction", direction)
        .select(
            "event_id",
            "user_id",
            "ts",
            pick("p_event_id").alias("p_event_id"),
            pick("p_ts").alias("p_ts"),
            "direction",
        )
    )


@register(
    "q_asof_event_pairs",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    errors AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'error')
    SELECT e.event_id, e.user_id, e.ts,
           c.click_id AS last_click_id, c.ts AS last_click_ts
    FROM errors e ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts <= e.ts
    """,
    doc="Same-table as-of: for each error event, the user's most recent "
    "click at or before it (interleaved timestamps — the general as-of "
    "case). Same union-tagged carry-forward plan.",
)
def q_asof_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    build = clicks.select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "click_id",
        F.col("ts").alias("click_ts"),
    )
    probe = errors.select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(1).alias("tag"),
        "event_id",
        "ts",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "tag", "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        build.unionByName(probe)
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id", "user_id", "ts", "last_click_id", "last_click_ts"
    )


@register(
    "q_range_join_window",
    oracle=f"""
    WITH p AS (SELECT event_id, user_id, ts, EPOCH_US(ts) AS us
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, EPOCH_US(ts) AS us
          FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, p.ts,
           COUNT(v.us) AS n_views_prev_hour
    FROM p LEFT JOIN v
      ON p.user_id = v.user_id
     AND v.us >= p.us - {_HOUR_US} AND v.us < p.us
    GROUP BY p.event_id, p.user_id, p.ts
    """,
    doc="Interval join: views within the hour before each purchase, "
    "same user. Spark plan buckets time by the interval width and "
    "explodes each purchase into the two buckets its window overlaps — "
    "bounded 2x fan-out equi-join + exact filter, instead of an "
    "unbounded inequality join.",
)
def q_range_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", _us("ts").alias("us")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", _us("ts").alias("v_us"), (_us("ts") / _HOUR_US).cast("bigint").alias("bucket")
    )
    # purchase window [us - 1h, us) overlaps exactly buckets b-1 and b
    pb = p.select(
        "event_id",
        "user_id",
        "ts",
        "us",
        F.explode(
            F.array((F.col("us") / _HOUR_US).cast("bigint") - 1, (F.col("us") / _HOUR_US).cast("bigint"))
        ).alias("bucket"),
    )
    hits = (
        pb.join(v, ["user_id", "bucket"])
        .filter((F.col("v_us") >= F.col("us") - _HOUR_US) & (F.col("v_us") < F.col("us")))
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_views_prev_hour"))
    )
    return (
        p.join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce("n_views_prev_hour", F.lit(0)).alias("n_views_prev_hour"),
        )
    )


@register(
    "q_events_gapfill",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) * 1000000 + 0.5) / 1000000.0 AS hv
      FROM events WHERE user_id % 50 = 0
      GROUP BY user_id, date_trunc('hour', ts)),
    span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY user_id),
    grid AS (
      SELECT span.user_id, g.h
      FROM span, LATERAL (SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h) g),
    j AS (SELECT grid.user_id, grid.h, obs.hv FROM grid LEFT JOIN obs USING (user_id, h)),
    f AS (
      SELECT user_id, h, hv,
        LAST_VALUE(hv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN hv IS NOT NULL THEN h END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        FIRST_VALUE(hv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN hv IS NOT NULL THEN h END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM j)
    SELECT user_id, h,
      CASE WHEN hv IS NOT NULL THEN hv
           ELSE FLOOR((pv + (nv - pv) *
                (CAST(CAST(epoch(h) AS BIGINT) - CAST(epoch(ph) AS BIGINT) AS DOUBLE) /
                 CAST(CAST(epoch(nh) AS BIGINT) - CAST(epoch(ph) AS BIGINT) AS DOUBLE)))
                * 1000000 + 0.5) / 1000000.0
      END AS v,
      (hv IS NULL) AS is_interp
    FROM f
    """,
    doc="Time-series REGULARIZATION (gap fill + linear interpolation) "
    "— the resample step every sensor/metrics pipeline runs before "
    "modeling: per user, the event 'value' series is bucketed to "
    "hours (decimal-exact hourly mean), the missing hours of each "
    "user's [first, last] observed span are generated in-plan "
    "(sequence + explode — executor-side, no driver loop), and every "
    "gap is filled by linear interpolation between its surrounding "
    "observations via ONE ordered window pass (last/first "
    "ignorenulls carry both endpoints to every gap row; the span "
    "ends are observed by construction, so interpolation always has "
    "both anchors). Emits the full regularized series — every "
    "interpolated value sits in the oracle hash. Scale: one shuffle "
    "on user_id; grid size = users x span-hours, bounded here by the "
    "user sample and in production by the resample granularity; the "
    "window is per-user ordered, exactly the sort the exchange "
    "already paid for. The interpolation arithmetic is written "
    "identically in both engines (IEEE doubles, same op order, "
    "round-6 snap) so the hash certifies values, not just shape.",
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    obs = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h")).agg(
        (
            F.floor(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("hv")
    )
    span = obs.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    j = grid.join(obs, ["user_id", "h"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("hv").isNotNull(), F.col("h"))
    f = j.select(
        "user_id",
        "h",
        "hv",
        F.last("hv", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("hv", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wn).alias("nh"),
    )
    frac = (F.unix_timestamp("h") - F.unix_timestamp("ph")).cast("double") / (
        F.unix_timestamp("nh") - F.unix_timestamp("ph")
    ).cast("double")
    return f.select(
        "user_id",
        "h",
        F.when(F.col("hv").isNotNull(), F.col("hv"))
        .otherwise(
            F.floor(
                (F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        )
        .alias("v"),
        F.col("hv").isNull().alias("is_interp"),
    )
