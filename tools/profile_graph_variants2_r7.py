"""Round-7 probe #3: end-to-end (construction + action) timing for the
pagerank restructure candidate. Variants:

  current — operators/graph.py as shipped (e = e0 ⋈ outdeg materialized
            as a third full edge-relation checkpoint; per-edge division)
  noemat  — no e materialization: per round the rank/outdeg RATIO is a
            node-keyed join (pr ⋈ outdeg), then ONE e0 ⋈ ratio join;
            the decimal cast still happens per edge row on the same
            double value, so results are bit-identical

    python tools/profile_graph_variants2_r7.py .scaledata/sf5 3
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.queries.registry import table
from tfl_realtime_lakehouse_spark.session import get_spark

_CKPT = StorageLevel.MEMORY_AND_DISK


def edges_df(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("src"),
        (F.lit(1000000000) + F.col("l_suppkey")).alias("dst"),
    )


def pagerank_current(spark, sf_dir, iters=3, damping=0.85):
    from tfl_realtime_lakehouse_spark.operators.graph import pagerank

    return pagerank(edges_df(spark, sf_dir), iters=iters, damping=damping)


def pagerank_noemat(spark, sf_dir, iters=3, damping=0.85):
    e0 = edges_df(spark, sf_dir).distinct().localCheckpoint(storageLevel=_CKPT)
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(storageLevel=_CKPT)
    )
    n = nodes.count()
    outdeg = e0.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint(storageLevel=_CKPT)
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr")).localCheckpoint(storageLevel=_CKPT)
    base = (1 - damping) / n
    for _ in range(iters):
        ratio = pr.join(outdeg, pr["node"] == outdeg["src"]).select(
            outdeg["src"].alias("rsrc"), (F.col("pr") / F.col("outdeg")).alias("r")
        )
        sums = (
            e0.join(ratio, e0["src"] == ratio["rsrc"])
            .select(
                F.col("dst").alias("node"),
                F.col("r").cast("decimal(27,12)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(storageLevel=_CKPT)
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


def run(fn, spark, sf_dir):
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf5"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="graph-variants2-r7")
    spark.sparkContext.setLogLevel("ERROR")
    _ = edges_df(spark, sf_dir).count()  # warm scans once
    out = {"sf": sf_dir, "load_before": list(os.getloadavg())}
    for name, fn in (("current", pagerank_current), ("noemat", pagerank_noemat)):
        out[name] = [run(fn, spark, sf_dir) for _ in range(trials)]
    h = {}
    for name, fn in (("current", pagerank_current), ("noemat", pagerank_noemat)):
        h[name] = (
            fn(spark, sf_dir)
            .agg(F.sum(F.hash("node", "pagerank").cast("bigint")).alias("h"))
            .collect()[0]["h"]
        )
    out["result_hashes"] = h
    out["load_after"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
