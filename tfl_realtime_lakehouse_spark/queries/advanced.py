"""Advanced relational coverage: sessionization, regex battery,
from_json/to_json, window-frame battery, per-group discrete quantiles,
full-outer/cross joins, correlated subqueries, manual pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.queries.registry import load_views, register, table

SESSION_GAP_S = 1800  # 30 min


@register(
    "events_sessionization",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flags AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                      OR EPOCH_US(ts) - EPOCH_US(prev_ts) > {SESSION_GAP_S} * 1000000
                     THEN 1 ELSE 0 END AS is_new
      FROM gaps
    ), sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flags
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           (EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) / 1000000.0 AS duration_s
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min inactivity): lag → new-session "
    "flag → running-sum session ids → per-session rollup. One shuffle on "
    "user_id reused across both windows and the aggregation.",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("prev_ts")
                    > SESSION_GAP_S * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(wsum))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1000000.0)
        ).alias("duration_s"),
    )


@register(
    "scalar_regex",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_name, '([a-z]+) ([a-z]+)', 1) AS first_word,
           REGEXP_EXTRACT(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           REGEXP_MATCHES(p_name, '^(red|small)') AS starts_special,
           CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
           SPLIT_PART(p_name, ' ', 2) AS word2
    FROM part
    """,
    doc="Regex battery: group extraction, global replace, match "
    "predicate, match counting, split_part.",
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike(r"^(red|small)").alias("starts_special"),
        F.regexp_count("p_name", F.lit(r"[aeiou]")).alias("n_vowels"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("word2"),
    )


@register(
    "scalar_json_struct",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS INTEGER) AS k_typed,
           TO_JSON(STRUCT_PACK(event_id := event_id, event_type := event_type))::VARCHAR AS packed
    FROM events
    """,
    doc="Structured JSON round-trip (SURVEY F9/F10): from_json with a "
    "declared schema, to_json(struct(...)) serialization.",
)
def scalar_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_typed"),
        F.to_json(F.struct("event_id", "event_type")).alias("packed"),
    )


@register(
    "window_frames_battery",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w_full AS first_price,
           LAST_VALUE(o_totalprice)  OVER w_full AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w_full AS second_price,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS n_last_7d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Window-frame battery: value navigation over full-partition "
    "frames, ntile/percent_rank/cume_dist ranking, and a time-RANGE "
    "frame (trailing 7 days).",
)
def window_frames_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_totalprice) OVER w_full AS first_price,
               LAST_VALUE(o_totalprice)  OVER w_full AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER w_full AS second_price,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                              RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS n_last_7d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """
    )


@register(
    "agg_quantile_per_group",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           (LIST_SORT(LIST(l_quantity)))[CAST(CEIL(0.5 * COUNT(*)) AS INTEGER)] AS p50_qty,
           (LIST_SORT(LIST(l_quantity)))[CAST(CEIL(0.9 * COUNT(*)) AS INTEGER)] AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Discrete (type-1) per-group quantiles — the reference's DuckDB "
    "`quantile` semantics (SURVEY A3/A4). Scale-safe plan (r4): a "
    "value-histogram cumulative-count select replaces the former "
    "per-group collect_list (which materialized an O(n/group) array "
    "in one aggregation buffer — executor OOM by construction at "
    "100×). Pass 1 is a map-side-combined count per (group, value) — "
    "the shuffle carries only |groups|×|distinct values| rows (150 "
    "for TPC-H l_quantity). Pass 2 is a cumulative sum over that "
    "tiny histogram; the type-1 quantile at index i = ceil(q·n) is "
    "the unique value v whose cumulative range covers i. Per-row "
    "aggregation state is O(1) everywhere; worst case (all values "
    "distinct) degrades to an external-sorted window, never an "
    "in-memory array. Same discrete semantics, same oracle.",
)
def agg_quantile_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_o = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    w_c = Window.partitionBy("l_returnflag")
    cum = (
        hist.withColumn("cum_hi", F.sum("cnt").over(w_o))
        .withColumn("cum_lo", F.col("cum_hi") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(w_c))
    )
    i50 = F.ceil(F.lit(0.5) * F.col("n")).cast("bigint")
    i90 = F.ceil(F.lit(0.9) * F.col("n")).cast("bigint")
    in_range = lambda i: (i > F.col("cum_lo")) & (i <= F.col("cum_hi"))  # noqa: E731
    return cum.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        F.min(F.when(in_range(i50), F.col("l_quantity"))).alias("p50_qty"),
        F.min(F.when(in_range(i90), F.col("l_quantity"))).alias("p90_qty"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           MAX(c_name) AS name,
           COUNT(o_orderkey) AS n_orders
    FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY COALESCE(c_custkey, o_custkey)
    """,
    doc="Full outer equi-join preserving both unmatched sides.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .groupBy(F.coalesce("c_custkey", "o_custkey").alias("custkey"))
        .agg(F.max("c_name").alias("name"), F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_cross_dims",
    oracle="""
    SELECT r_name, s.o_orderstatus, COUNT(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r_name, s.o_orderstatus
    """,
    doc="Cross join of tiny dimensions (Cartesian product op).",
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").select("r_name")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "subquery_correlated_count",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) >= 15
    """,
    doc="Correlated scalar subquery — Catalyst decorrelates to an "
    "aggregate + join (SURVEY §4 join-reordering/decorrelation row).",
)
def subquery_correlated_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) >= 15
        """
    )


@register(
    "agg_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot via conditional aggregation (the shuffle-free pivot "
    "pattern; Spark's pivot() compiles to the same shape).",
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


@register(
    "sessions_active_per_hour",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flags AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                      OR EPOCH_US(ts) - EPOCH_US(prev_ts) > {SESSION_GAP_S} * 1000000
                     THEN 1 ELSE 0 END AS is_new
      FROM gaps
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flags
    ), intervals AS (
      SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
      FROM sess GROUP BY user_id, session_id
    )
    SELECT h.hour, CAST(COUNT(*) AS BIGINT) AS n_active_sessions,
           CAST(COUNT(DISTINCT i.user_id) AS BIGINT) AS n_active_users
    FROM intervals i,
         UNNEST(RANGE(DATE_TRUNC('hour', i.s), DATE_TRUNC('hour', i.e)
                      + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS h(hour)
    GROUP BY h.hour
    """,
    doc="Interval stabbing / occupancy: how many sessions (and distinct "
    "users) were active during each hour. Sessions come from the same "
    "gap-sessionization; each [start, end] interval EXPLODES to its "
    "covering hour grid (F.sequence — bounded by session length, no "
    "range join, no self-join) and one groupBy counts the stabs. The "
    "scalable form of the classic 'concurrent sessions over time' "
    "query: work is O(total session-hours), never O(sessions²).",
)
def sessions_active_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("prev_ts")
                    > SESSION_GAP_S * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    hours = sess.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s"),
                F.date_trunc("hour", "e"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    )
    return hours.groupBy("hour").agg(
        F.count(F.lit(1)).alias("n_active_sessions"),
        F.count_distinct("user_id").alias("n_active_users"),
    )


@register(
    "events_value_histogram",
    oracle="""
    WITH rng AS (
      SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(LEAST(19, FLOOR((e.value - r.lo) / (r.hi - r.lo) * 20)) AS INTEGER)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events e JOIN rng r USING (event_type)
    GROUP BY e.event_type, bucket
    """,
    doc="Equi-width histogram per segment (20 buckets over each "
    "segment's [min, max]): one tiny range aggregate broadcast back, "
    "then a single count shuffle keyed (segment, bucket). The bucket "
    "formula is written identically on both engines (same IEEE double "
    "ops in the same order), so edge rows bucket identically — no "
    "width_bucket dialect drift.",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bucket = F.least(
        F.lit(19),
        F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 20),
    ).cast("int")
    return (
        ev.join(F.broadcast(rng), "event_type")
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_weighted_median_per_group",
    oracle="""
    WITH hist AS (
      SELECT l_returnflag, l_quantity,
             SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, l_quantity, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                          ROWS UNBOUNDED PRECEDING) AS cum_hi,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                          ROWS UNBOUNDED PRECEDING) - w AS cum_lo,
             SUM(w) OVER (PARTITION BY l_returnflag) AS wtot
      FROM hist
    )
    SELECT l_returnflag,
           CAST(CAST(MAX(wtot) AS DOUBLE) AS DOUBLE) AS total_weight,
           MIN(CASE WHEN cum_lo < 0.5 * wtot AND 0.5 * wtot <= cum_hi
                    THEN l_quantity END) AS weighted_median_qty
    FROM cum GROUP BY l_returnflag
    """,
    doc="Weighted per-group median (revenue-weighted quantity): the "
    "smallest value whose cumulative WEIGHT reaches half the group "
    "total — same scale-safe value-histogram cumulative select as "
    "agg_quantile_per_group, but the cumulative axis is an exact "
    "decimal weight sum instead of a row count (the comparison "
    "0.5·W ≤ cum runs on exact decimals, so the boundary pick is "
    "order-free in both engines; only the reported total converts "
    "to double). Weighted quantiles are the curation primitive for "
    "\"median document quality weighted by token count\"-style "
    "questions where long documents must count proportionally.",
)
def agg_weighted_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).alias("w"))
    )
    w_o = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    w_c = Window.partitionBy("l_returnflag")
    cum = (
        hist.withColumn("cum_hi", F.sum("w").over(w_o))
        .withColumn("cum_lo", F.col("cum_hi") - F.col("w"))
        .withColumn("wtot", F.sum("w").over(w_c))
    )
    # Boundary decision in EXACT decimal: cum < 0.5·W ⟺ 2·cum < W when
    # both sides are decimals (the oracle's 0.5 literal is decimal, so
    # its compare is exact; a double 0.5·W here would diverge once the
    # ulp of 0.5·W exceeds the 0.005 grid, W ≳ 5e12 cents).
    two = F.lit(2).cast("decimal(2,0)")
    return cum.groupBy("l_returnflag").agg(
        F.max("wtot").cast("double").alias("total_weight"),
        F.min(
            F.when(
                (two * F.col("cum_lo") < F.col("wtot"))
                & (F.col("wtot") <= two * F.col("cum_hi")),
                F.col("l_quantity"),
            )
        ).alias("weighted_median_qty"),
    )
