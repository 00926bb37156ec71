"""Approximate-algorithm demos, hash-checkable via bounds oracles.

Sketch estimates (HyperLogLog++, Greenwald-Khanna) are engine-specific by
construction — Spark's HLL++ and DuckDB's HLL give different estimates for
the same data — so the raw estimate can never hash-match an oracle. The
hash-checkable contract instead: emit the ORACLE-EXACT side (exact distinct
counts; the discrete exact quantile element at rank ``ceil(q·n)``, pure
integer rank arithmetic so it is bit-identical across engines) plus a
BOOLEAN verdict that the sketch estimate is within its documented error
bound. The oracle recomputes the exact side and asserts ``TRUE`` for the
verdict; both estimates are deterministic for fixed data, so the boolean is
deterministic and the driver's value hash verifies the sketch really was
within bounds. Error-bound tightness is additionally pinned against exact
values in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table

_RSD = 0.02  # approx_count_distinct relative standard deviation


@demo(
    "q_approx_distinct",
    sql="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_3rsd
    FROM events
    GROUP BY event_type
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for
    cardinality over columns too wide to exact-count — constant memory per
    group vs a full distinct shuffle. ``within_3rsd`` asserts the HLL++
    estimate landed within 3 standard deviations (rsd=0.02) of the exact
    count; the oracle checks the exact count and the verdict."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=_RSD).alias("approx_users"),
    )
    bound = F.lit(3.0 * _RSD) * F.col("exact_users").cast("double")
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users")).cast("double")
            <= bound
        ).alias("within_3rsd"),
    )


@demo(
    "q_approx_quantiles",
    sql="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_returnflag ORDER BY l_extendedprice
               ) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    spec AS (
        SELECT * FROM (VALUES
            ('0.25', 1, 4), ('0.50', 1, 2), ('0.90', 9, 10), ('0.99', 99, 100)
        ) AS t(quantile, num, den)
    )
    SELECT r.l_returnflag,
           s.quantile,
           CAST(r.n AS BIGINT) AS n_rows,
           r.l_extendedprice AS exact_price,
           TRUE AS within_5pct
    FROM ranked r
    JOIN spec s
      ON r.rn = greatest(1, (r.n * s.num + s.den - 1) // s.den)
    """,
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch): streaming-friendly
    quantiles with bounded state — the 100 TB alternative to exact sorts.

    One scalar row per (returnflag, quantile). ``exact_price`` is the
    discrete exact quantile — the element at 1-indexed rank ``ceil(q·n)``
    ordered by value, computed with pure integer arithmetic
    (``(n·num + den − 1) div den``) so Spark and DuckDB agree bit-for-bit
    on which parquet double is selected. ``within_5pct`` asserts the GK
    estimate (accuracy=10000 → rank error ≤ n/10000, far inside 5% in
    value space here) landed within 5% of the exact element; the sketch is
    deterministic for fixed data, so the verdict is hash-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.9, 0.99]
    ap = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", qs, 10000).alias("qa"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag", "n_rows", F.posexplode("qa").alias("qi", "approx_price")
        )
    )
    spec = spark.createDataFrame(
        [(0, "0.25", 1, 4), (1, "0.50", 1, 2), (2, "0.90", 9, 10), (3, "0.99", 99, 100)],
        "qi INT, quantile STRING, num LONG, den LONG",
    )
    tgt = ap.join(F.broadcast(spec), "qi").withColumn(
        "target_rn",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr("(n_rows * num + den - 1) div den"),
        ),
    )
    ranked = li.select(
        F.col("l_returnflag").alias("rf"),
        "l_extendedprice",
        F.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy("l_extendedprice"))
        .alias("rn"),
    )
    joined = ranked.join(
        F.broadcast(tgt),
        (ranked.rf == tgt.l_returnflag) & (ranked.rn == tgt.target_rn),
    )
    within = (
        F.abs(F.col("approx_price") - F.col("l_extendedprice"))
        <= F.lit(0.05) * F.col("l_extendedprice")
    )
    return joined.select(
        "l_returnflag",
        "quantile",
        "n_rows",
        F.col("l_extendedprice").alias("exact_price"),
        within.alias("within_5pct"),
    )


@demo(
    "q_approx_topk_cms",
    sql="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    tokens AS (SELECT t FROM tok WHERE t <> ''),
    top8 AS (
        SELECT t, count(*) AS exact_n
        FROM tokens GROUP BY t
        ORDER BY exact_n DESC, t ASC LIMIT 8
    ),
    probes AS (
        SELECT t, r,
               CAST('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || t), 1, 8)
                    AS BIGINT) % 512 AS pos
        FROM tokens CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r)
    ),
    counters AS (
        SELECT r, pos, count(*) AS cnt FROM probes GROUP BY r, pos
    ),
    est AS (
        SELECT p.t, min(c.cnt) AS cms_est
        FROM (
            SELECT t, r,
                   CAST('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || t), 1, 8)
                        AS BIGINT) % 512 AS pos
            FROM top8 CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r)
        ) p
        JOIN counters c ON p.r = c.r AND p.pos = c.pos
        GROUP BY p.t
    )
    SELECT top8.t AS token,
           top8.exact_n,
           CAST(est.cms_est AS BIGINT) AS cms_est
    FROM top8 JOIN est ON top8.t = est.t
    """,
)
def q_approx_topk_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: token frequencies folded into a
    fixed d=3 × w=512 counter grid — the shuffle moves at most d·w = 1536
    groups regardless of corpus size (vs a full per-token distinct-count
    shuffle), which is the sketch's 100 TB selling point. Estimates are
    min over the d hashed counters, so ``cms_est >= exact_n`` always and
    the overestimate is bounded by collisions (~2N/w per row w.h.p.).

    Unlike HLL/GK (engine-specific internals), this CMS is built from
    md5 arithmetic both engines evaluate identically, so the ORACLE
    RECOMPUTES THE WHOLE SKETCH — the driver hash verifies the estimate
    itself, not just a bounds boolean. Probe set = exact top-8 tokens
    (deterministic count-desc, token-asc tie-break)."""
    d_rows = 3
    w = 512
    docs = load_table(spark, sf_dir, "documents")
    tokens = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
        .where(F.col("t") != "")
    )

    def pos(r):
        hx = F.md5(F.concat(F.lit(f"cms{r}|"), F.col("t")))
        return (
            F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % w
        ).alias("pos")

    probes = tokens.select(
        "t",
        F.explode(
            F.array(*[F.struct(F.lit(r).alias("r"), pos(r)) for r in range(d_rows)])
        ).alias("rp"),
    ).select("t", F.col("rp.r").alias("r"), F.col("rp.pos").alias("pos"))
    counters = probes.groupBy("r", "pos").agg(F.count(F.lit(1)).alias("cnt"))
    top8 = (
        tokens.groupBy("t")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("t").asc())
        .limit(8)
    )
    top8_probes = top8.select(
        "t",
        "exact_n",
        F.explode(
            F.array(*[F.struct(F.lit(r).alias("r"), pos(r)) for r in range(d_rows)])
        ).alias("rp"),
    ).select("t", "exact_n", F.col("rp.r").alias("r"), F.col("rp.pos").alias("pos"))
    return (
        F.broadcast(top8_probes)
        .join(counters, ["r", "pos"])
        .groupBy(F.col("t").alias("token"), "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
    )


@demo(
    "q_approx_sketch_union",
    sql="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS du
        FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
               AS monthly_exact,
           CAST((SELECT sum(du) FROM daily) AS BIGINT) AS sum_daily_exact,
           TRUE AS monthly_within_5pct
    """,
)
def q_approx_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL, new
    in Spark 4: ``hll_sketch_agg`` / ``hll_union_agg`` /
    ``hll_sketch_estimate``) — the pattern that makes 100 TB rollups
    incremental: each day materializes a fixed-size sketch COLUMN
    alongside its aggregates, and any period's distinct count comes from
    unioning stored sketches — no rescan of history, unlike exact
    distinct counts, which don't merge (``sum_daily_exact`` >
    ``monthly_exact`` whenever users span days: the double-counting this
    sketch exists to avoid). Register-max merging is commutative and
    associative, so the unioned estimate is deterministic under any
    partitioning or merge order. Oracle contract per the sketch
    convention (``q_approx_distinct``): exact sides recomputed by
    DuckDB, the estimate pinned by a within-5%-of-exact verdict
    (default lgConfigK=12 → ~1.6% rsd)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("du"),
    )
    rollup = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("du").alias("sum_daily_exact"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = e.agg(F.countDistinct("user_id").alias("monthly_exact"))
    return rollup.crossJoin(F.broadcast(exact)).select(
        "n_days",
        "monthly_exact",
        "sum_daily_exact",
        (
            F.abs(F.col("est") - F.col("monthly_exact")).cast("double")
            <= F.lit(0.05) * F.col("monthly_exact").cast("double")
        ).alias("monthly_within_5pct"),
    )


@demo(
    "q_approx_top_k",
    sql="""
    SELECT event_type AS item, count(*) AS est_count
    FROM events
    GROUP BY event_type
    """,
)
def q_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``approx_top_k`` (Spark 4.1's frequent-items sketch
    aggregate — the built-in counterpart to q_approx_topk_cms's
    hand-rolled count-min top-k): one pass, mergeable sketch state,
    array-of-(item,count) out, exploded back to rows here. With
    maxItemsTracked (10k) >= the actual vocabulary (5 event types) the
    sketch degenerates to EXACT counts — which is what makes the demo
    oracle-checkable by plain GROUP BY, the same every-bucket-tracked
    regime q_approx_topk_cms pins. At real vocabulary scale the sketch
    answers from fixed memory where GROUP BY + rank would shuffle the
    full key set."""
    e = load_table(spark, sf_dir, "events")
    topk = e.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
    return topk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("item"),
        F.col("s.count").alias("est_count"),
    )
