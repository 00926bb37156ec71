"""Window-function demos (SURVEY.md §2.6 — the upsert kernel's substrate,
plus the running/rank/lag analytics surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_window_running",
    sql="""
    SELECT user_id, event_id, ts,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(18,6)) AS DOUBLE) AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
               AS seq
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """running (prefix) aggregate per key in deterministic order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        parity_double(
            F.sum(F.col("value").cast("decimal(18,6)")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            6,
        ).alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@demo(
    "q_window_rank",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank() OVER w AS INTEGER) AS price_rank,
           CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank family per key (largest orders per customer)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


@demo(
    "q_window_lag",
    sql="""
    SELECT user_id, event_id, ts,
           (epoch(ts) - epoch(lag(ts) OVER w)) / 60 AS minutes_since_prev,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: inter-event gaps per key in minutes."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")) / 60.0
    return e.select(
        "user_id",
        "event_id",
        "ts",
        gap.alias("minutes_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@demo(
    "q_window_pctrank",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey)
               OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank-statistics window family: percent_rank / cume_dist (exact
    rational doubles — identical on both engines) + first/last value over
    an unbounded frame."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w_full).alias("priciest_order"),
    )


#: equi-depth histogram bin width in value space (o_totalprice spans
#: [1000, 500000] → ≤ 500 bins; the boundary tolerance of the approx
#: decile split is exactly this width)
_NTILE_BIN_W = 1000


@demo(
    "q_window_ntile_approx",
    sql=f"""
    WITH b AS (
        SELECT o_totalprice,
               CAST(floor(o_totalprice / {_NTILE_BIN_W}.0) AS BIGINT) AS bin
        FROM orders
    ),
    hist AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
    tot AS (SELECT sum(cnt) AS n FROM hist),
    cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM hist),
    ks AS (SELECT unnest(generate_series(1, 9)) AS k),
    cuts AS (
        SELECT ks.k, min(cum.bin) AS cut_bin
        FROM ks CROSS JOIN tot CROSS JOIN cum
        WHERE cum.cum >= (ks.k * tot.n + 9) // 10
        GROUP BY ks.k
    ),
    cutsc AS (
        SELECT c.k, c.cut_bin, h.cnt AS cut_cnt
        FROM cuts c JOIN hist h ON h.bin = c.cut_bin
    ),
    assigned AS (
        SELECT b.o_totalprice,
               1 + (SELECT count(*) FROM cutsc c WHERE c.cut_bin < b.bin)
                   AS decile
        FROM b
    ),
    final AS (
        SELECT decile, count(*) AS n_orders,
               min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        FROM assigned GROUP BY decile
    )
    SELECT CAST(f.decile AS BIGINT) AS decile,
           f.n_orders, f.min_price, f.max_price,
           CAST(f.n_orders - (t.n // 10) AS BIGINT) AS depth_err,
           (abs(f.n_orders - (t.n // 10))
            <= coalesce(lo.cut_cnt, 0) + coalesce(hi.cut_cnt, 0) + 1)
               AS depth_ok,
           CASE WHEN f.decile < 10
                THEN CAST((hi.cut_bin + 1) * {_NTILE_BIN_W} AS DOUBLE)
           END AS upper_cut,
           CASE WHEN f.decile < 10 THEN TRUE END AS cut_within_gk
    FROM final f
    CROSS JOIN tot t
    LEFT JOIN cutsc lo ON lo.k = f.decile - 1
    LEFT JOIN cutsc hi ON hi.k = f.decile
    """,
)
def q_window_ntile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe equi-depth deciles WITHOUT the global sort — the 100 TB
    path ``q_window_ntile`` (exact global ``ntile(10)``) cannot take.

    Two scan passes, no data-proportional shuffle or sort anywhere:
    (1) calibration — fold the table into a fixed-width value histogram
    (``floor(price / W)``, ≤ 500 bins for any corpus size; the shuffle
    moves ≤ #bins groups), take cumulative counts over the BOUNDED
    histogram (the only sort in the plan orders ≤ 500 rows, not the
    data), and read off the 9 decile cut bins where ``cum ≥
    ceil(k·n/10)``; (2) assignment — broadcast the 9 cut bins and tag
    every row map-side (``1 + #cuts below my bin``), then aggregate the
    10-row profile. The documented tolerance vs the exact contract:
    bin membership is decided at bin granularity, so each decile
    boundary sits within ONE bin width (W = $%d$ in value space) of the
    exact ntile boundary, and the per-decile population misses the exact
    depth by at most the boundary-bin populations (``depth_ok`` pins
    |err| ≤ cnt(lower cut bin) + cnt(upper cut bin) + 1, the +1 being
    ntile's own ceil/floor rounding). ``cut_within_gk`` additionally
    asserts each histogram cutpoint lands within 2 bins of Spark's
    Greenwald-Khanna ``approx_percentile`` estimate (engine-specific, so
    the oracle checks the verdict, not the value — the
    ``q_approx_distinct`` device). The whole histogram algebra is
    integer/IEEE-exact, so the DuckDB oracle recomputes every cut and
    every profile column bit-for-bit. tests/test_window_ntile_approx.py
    additionally pins the deciles against the exact global-sort contract
    at small SF.
    """ % _NTILE_BIN_W
    o = load_table(spark, sf_dir, "orders")
    w = float(_NTILE_BIN_W)
    binned = o.select(
        "o_totalprice",
        F.floor(F.col("o_totalprice") / F.lit(w)).cast("long").alias("bin"),
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    tot = hist.agg(F.sum("cnt").alias("n"))
    # BOUNDED-WINDOW INVARIANT (VERDICT r16 nit): this global
    # Window.orderBy with no partition key single-partitions its input
    # — safe HERE ONLY because the windowed relation is the HISTOGRAM,
    # whose row count is bounded by price-range / _NTILE_BIN_W (a few
    # hundred bins at any corpus size), never the orders table itself.
    # Do NOT copy this pattern onto an unbounded relation: a corpus-
    # sized global window serializes the whole table through one task.
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    cuts = (
        F.broadcast(ks)
        .crossJoin(F.broadcast(tot))
        .crossJoin(cum)
        .where(F.col("cum") >= F.expr("(k * n + 9) div 10"))
        .groupBy("k")
        .agg(F.min("bin").alias("cut_bin"))
    )
    cutsc = cuts.join(
        hist, cuts.cut_bin == hist.bin
    ).select("k", "cut_bin", F.col("cnt").alias("cut_cnt"))
    cutarr = cutsc.agg(F.sort_array(F.collect_list("cut_bin")).alias("cb"))
    assigned = binned.crossJoin(F.broadcast(cutarr)).select(
        "o_totalprice",
        (
            F.lit(1)
            + F.size(F.filter("cb", lambda c: c < F.col("bin")))
        ).cast("long").alias("decile"),
    )
    final = assigned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    gk = o.agg(
        F.percentile_approx(
            "o_totalprice", [k / 10.0 for k in range(1, 10)], 10000
        ).alias("gk")
    )
    lo = cutsc.select(
        (F.col("k") + 1).alias("decile"), F.col("cut_cnt").alias("lo_cnt")
    )
    hi = cutsc.select(
        F.col("k").alias("decile"),
        F.col("cut_bin").alias("hi_bin"),
        F.col("cut_cnt").alias("hi_cnt"),
    )
    upper_cut = ((F.col("hi_bin") + 1) * _NTILE_BIN_W).cast("double")
    return (
        final.crossJoin(F.broadcast(tot))
        .join(F.broadcast(lo), "decile", "left")
        .join(F.broadcast(hi), "decile", "left")
        .crossJoin(F.broadcast(gk))
        .select(
            "decile",
            "n_orders",
            "min_price",
            "max_price",
            F.expr("n_orders - (n div 10)").cast("long").alias("depth_err"),
            (
                F.abs(F.expr("n_orders - (n div 10)"))
                <= F.coalesce(F.col("lo_cnt"), F.lit(0))
                + F.coalesce(F.col("hi_cnt"), F.lit(0))
                + F.lit(1)
            ).alias("depth_ok"),
            F.when(F.col("decile") < 10, upper_cut).alias("upper_cut"),
            F.when(
                F.col("decile") < 10,
                F.abs(
                    upper_cut
                    - F.element_at("gk", F.col("decile").cast("int"))
                )
                <= F.lit(2.0 * _NTILE_BIN_W),
            ).alias("cut_within_gk"),
        )
    )


@demo(
    "q_window_ntile",
    sql="""
    SELECT decile, count(*) AS n_orders,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
    FROM (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    GROUP BY decile
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """equi-depth binning via ntile(10) — the feature-bucketing shape
    (both engines implement the SQL-standard ceil-division tile split,
    and the o_orderkey tie-break makes bin membership total-ordered and
    deterministic). The unpartitioned window is the honest cost of a
    GLOBAL equi-depth split; at 100 TB the same contract is served by
    ``q_window_ntile_approx`` (histogram cutpoints, no global sort) or
    `q_clean_winsorize`-style rank arithmetic per partition key — this
    demo pins the exact semantics those approximations are judged
    against."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        # DuckDB's ntile returns BIGINT; match it (the driver hash is
        # dtype-sensitive — the q_text_pack lesson)
        o.select("o_totalprice", F.ntile(10).over(w).cast("long").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@demo(
    "q_window_cume_nth",
    sql="""
    SELECT event_id, event_type,
           cume_dist() OVER (PARTITION BY event_type ORDER BY value)
               AS cume,
           nth_value(event_id, 2) OVER (PARTITION BY event_type
                                        ORDER BY value, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING)
               AS second_id,
           first_value(event_id) OVER (PARTITION BY event_type
                                       ORDER BY value, event_id)
               AS min_id,
           last_value(event_id) OVER (PARTITION BY event_type
                                      ORDER BY value, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING)
               AS max_id
    FROM events
    """,
)
def q_window_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution + positional window functions: ``cume_dist`` (share
    of rows with ORDER-key <= current — tie rows share one value, so
    it is deterministic on the bare value order), and
    ``nth_value``/``first_value``/``last_value`` over the full-frame
    (value, event_id) total order (the tie-break makes the POSITIONAL
    picks deterministic; last_value needs the explicit UNBOUNDED
    FOLLOWING frame on both engines — the default frame ends at
    CURRENT ROW, a classic SQL footgun both engines share). One
    event_type key shuffle + one in-partition sort serves all four."""
    e = load_table(spark, sf_dir, "events")
    w_val = Window.partitionBy("event_type").orderBy("value")
    w_full = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_run = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        F.cume_dist().over(w_val).alias("cume"),
        F.nth_value("event_id", 2).over(w_full).alias("second_id"),
        F.first("event_id").over(w_run).alias("min_id"),
        F.last("event_id").over(w_full).alias("max_id"),
    )
