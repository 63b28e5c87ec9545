"""TPC-H query shapes, wave 3: the remaining classic plan shapes.

Completes the TPC-H shape coverage started in
:mod:`~tfl_realtime_lakehouse_spark.queries.tpch_extra` (Q1/3/4/5/6/7/
10/14/15/18/22 already registered). This module adds the shapes whose
decorrelation / join patterns are still missing, adapted to this
corpus's schema (no ``partsupp`` table, no ``l_shipmode`` /
``l_commitdate`` / ``l_receiptdate`` columns — each query's docstring
says what stands in):

- Q2  → correlated MIN subquery over a derived supply relation
- Q8  → conditional market-share ratio over an 8-table join
- Q9  → LIKE-filtered profit rollup per (nation, year)
- Q11 → HAVING against a global scalar-subquery threshold
- Q12 → two CASE-sum classifications after a fact-fact join
- Q13 → left-outer join with a filtered ON clause + count distribution
- Q16 → NOT IN anti-join + COUNT(DISTINCT) per part attribute
- Q17 → correlated scalar AVG threshold per part
- Q19 → disjunction of conjunctive predicate blocks (OR pushdown)
- Q20 → nested IN subqueries (semi join over a HAVING aggregate)
- Q21 → EXISTS + NOT EXISTS self-joins on the fact table

Determinism follows the registry contract (registry.py docstring):
money sums in DECIMAL with the exact q7 cast recipe, integer sums cast
BIGINT on both engines, ratios rounded after exact-decimal division
inputs, LIMIT only under a total ORDER BY.

Scale posture: every dim join below broadcasts (region/nation/supplier/
part are the small side at any SF); fact-fact joins (q12, q21's
self-joins) shuffle on the join key, which is the natural partitioning;
the q21 semi/anti joins hash on ``l_orderkey`` with the inequality as a
residual filter, so no nested-loop appears at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.queries.registry import register, table

# The exact-decimal revenue recipe shared with q7/q14 (verified
# inter-engine identical in round 1): price and discount are cast to
# fixed decimals BEFORE multiply/sum so no float reassociation occurs.
_REV_SQL = (
    "CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,2))"
    " * CAST(1.0 - l_discount AS DECIMAL(9,6))) AS DECIMAL(27,6)) AS DOUBLE)"
)


def _rev_expr():
    return F.col("l_extendedprice").cast("decimal(18,2)").cast("decimal(28,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(9,6)")


def _rev_sum(colname: str):
    return F.sum(_rev_expr()).cast("decimal(27,6)").cast("double").alias(colname)


@register(
    "q2_min_supply_price",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(MIN(l_extendedprice) AS DOUBLE) AS price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), rsupp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_name, n_name, p_partkey, s_acctbal, price
    FROM part
    JOIN supply ON partkey = p_partkey
    JOIN rsupp ON s_suppkey = suppkey
    WHERE p_size <= 15 AND p_type = 'SMALL'
      AND price = (
        SELECT MIN(s2.price)
        FROM supply s2 JOIN rsupp r2 ON r2.s_suppkey = s2.suppkey
        WHERE s2.partkey = supply.partkey)
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (no partsupp: supply price := MIN l_extendedprice "
    "per (part, supplier) from lineitem): correlated MIN subquery over "
    "a region-restricted supply relation, decorrelated to a per-part "
    "min aggregate + equality join. MIN of raw doubles is order-exact, "
    "so the equality compare is engine-stable.",
)
def q2_min_supply_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("l_extendedprice").cast("double").alias("price"))
    rsupp = (
        supplier.join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = supply.join(F.broadcast(rsupp), F.col("s_suppkey") == F.col("suppkey"))
    # Decorrelated correlated-MIN: per-part minimum over the regional
    # supply relation, joined back on (partkey, price).
    minp = regional.groupBy("partkey").agg(F.min("price").alias("_minp"))
    wanted = part.filter((F.col("p_size") <= 15) & (F.col("p_type") == "SMALL"))
    return (
        regional.join(minp, "partkey")
        .filter(F.col("price") == F.col("_minp"))
        .join(F.broadcast(wanted), F.col("p_partkey") == F.col("partkey"))
        .select("s_name", "n_name", "p_partkey", "s_acctbal", "price")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(ROUND(COALESCE(CAST(nation_rev AS DOUBLE), 0.0)
                      / CAST(total_rev AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                           THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,2))
                                * CAST(1.0 - l_discount AS DECIMAL(9,6)) END)
                  AS DECIMAL(27,6)) AS nation_rev,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,2))
                      * CAST(1.0 - l_discount AS DECIMAL(9,6)))
                  AS DECIMAL(27,6)) AS total_rev
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      GROUP BY EXTRACT(YEAR FROM o_orderdate)
    ) shares
    """,
    doc="TPC-H Q8 shape: market share of NATION_1 suppliers within "
    "ASIA-customer ECONOMY-part revenue per order year — a conditional "
    "ratio over an 8-table join (both nation roles joined separately). "
    "Both sums stay in exact DECIMAL until one final double division, "
    "rounded to 6 digits.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_expr()
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("c_nk") == F.col("c_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("c_rk"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("s_nk") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev))
            .cast("decimal(27,6)")
            .alias("nation_rev"),
            F.sum(rev).cast("decimal(27,6)").alias("total_rev"),
        )
        .select(
            "o_year",
            F.round(
                F.coalesce(F.col("nation_rev").cast("double"), F.lit(0.0))
                / F.col("total_rev").cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           {_REV_SQL} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
    doc="TPC-H Q9 shape (no partsupp: profit = discounted revenue): "
    "substring LIKE filter on the part dim, supplier-nation rollup per "
    "year. The LIKE prunes the broadcast part side before the fact join.",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").contains("red"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_rev_sum("profit"))
    )


@register(
    "q11_top_value_parts",
    oracle="""
    WITH nsupply AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val_dec
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_1'
      GROUP BY l_partkey
    )
    SELECT partkey, CAST(val_dec AS DOUBLE) AS value
    FROM nsupply
    WHERE CAST(val_dec AS DOUBLE) >
          (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM nsupply) * 0.001
    """,
    doc="TPC-H Q11 shape (no partsupp: value = extended price shipped "
    "by NATION_1 suppliers): per-part aggregate filtered by HAVING "
    "against a global scalar subquery — the same relation aggregated "
    "at two granularities, with the scalar side broadcast. Sums stay "
    "DECIMAL-exact; only the final compare is double.",
)
def q11_top_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    base = (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val_dec"))
    )
    total = base.agg(F.sum("val_dec").alias("_total"))
    return (
        base.join(F.broadcast(total))
        .filter(
            F.col("val_dec").cast("double") > F.col("_total").cast("double") * 0.001
        )
        .select("partkey", F.col("val_dec").cast("double").alias("value"))
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (no l_shipmode: classify by l_linestatus; no "
    "commit/receipt dates: ship-date year filter): fact-fact equi-join "
    "then two complementary CASE-sum counters per group — the classic "
    "shuffle-on-orderkey plan with map-side partial aggregation.",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) per_cust
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (o_comment NOT LIKE → o_orderpriority filter "
    "inside the ON clause): left-outer join that must preserve "
    "zero-order customers, then a distribution-of-counts second "
    "aggregate. The ON-clause filter (not WHERE) is the semantic "
    "point — filtering after the join would drop the zero bucket.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("bigint").alias("custdist"))


@register(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (no partsupp: part-supplier pairs come from "
    "lineitem; 'complaint' suppliers := negative account balance): "
    "NOT-IN anti join against a dim subquery, then COUNT(DISTINCT) per "
    "part attribute triple. The anti join broadcasts the excluded-key "
    "list; the distinct count is a two-phase hash aggregate.",
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    wanted = part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(F.broadcast(wanted), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      / 7.0, 4) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated scalar AVG threshold per part, "
    "decorrelated to a per-part aggregate joined back to the fact. "
    "AVG(l_quantity) is exact (integer-valued doubles sum exactly), so "
    "the threshold compare is engine-stable; the revenue sum stays "
    "DECIMAL until one final rounded division.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    thresholds = li.groupBy(F.col("l_partkey").alias("tk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_thr")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#2")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(thresholds, F.col("tk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_REV_SQL} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: OR of three conjunctive predicate blocks "
    "spanning both join sides. Catalyst extracts the common join key "
    "and pushes the part-only disjuncts below the join (the classic "
    "Q19 optimization); the residual mixed predicate filters post-join.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(_rev_sum("revenue"))
    )


@register(
    "q20_qualified_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 100)
    """,
    doc="TPC-H Q20 shape (no partsupp: availability := shipped volume "
    "of LIKE-matched parts): nested IN subqueries — a semi join whose "
    "inner side is itself a semi join feeding a HAVING aggregate. Both "
    "IN lists decorrelate to left-semi hash joins.",
)
def q20_qualified_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    small_parts = part.filter(F.col("p_name").startswith("small")).select("p_partkey")
    heavy = (
        li.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .join(F.broadcast(small_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_2")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (no receipt/commit dates: 'late' := this "
    "supplier has the strictly latest ship date in a multi-supplier "
    "order): EXISTS + NOT EXISTS self-joins on the fact table, "
    "expressed as left-semi and left-anti hash joins on l_orderkey "
    "with the supplier/date inequalities as residual conditions — no "
    "nested loop, shuffle stays on the natural orderkey partitioning.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    return (
        li.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey"))
            & (F.col("d3") > F.col("l_shipdate")),
            "left_anti",
        )
        .join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )
