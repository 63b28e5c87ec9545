"""Round-7 probe (r6 verdict ask #4): where does the sf5 graph
iteration family spend its time — the per-round lineage-cut
materialization (localCheckpoint write) or the join+agg itself?

Instruments pagerank's phases with the SAME code path as
operators/graph.py (copied loop with timers — probe only, not product)
and times LPA/BFS end-to-end for context. Run on an uncontended box:

    python tools/profile_graph_r7.py /root/repo/.scaledata/sf5
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

_CKPT_LEVEL = StorageLevel.MEMORY_AND_DISK


def edges_df(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("src"),
        (F.lit(1000000000) + F.col("l_suppkey")).alias("dst"),
    )


def profile_pagerank(spark, sf_dir, iters=3, damping=0.85):
    t = {}
    t0 = time.monotonic()
    e0 = edges_df(spark, sf_dir).distinct().localCheckpoint(storageLevel=_CKPT_LEVEL)
    t["e0_distinct_ckpt"] = time.monotonic() - t0

    t0 = time.monotonic()
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(storageLevel=_CKPT_LEVEL)
    )
    n = nodes.count()
    t["nodes_ckpt_count"] = time.monotonic() - t0

    t0 = time.monotonic()
    outdeg = e0.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = e0.join(outdeg, "src").localCheckpoint(storageLevel=_CKPT_LEVEL)
    t["e_outdeg_ckpt"] = time.monotonic() - t0

    t0 = time.monotonic()
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr")).localCheckpoint(
        storageLevel=_CKPT_LEVEL
    )
    t["pr0_ckpt"] = time.monotonic() - t0

    base = (1 - damping) / n
    for i in range(iters):
        t0 = time.monotonic()
        sums = (
            e.join(pr, e["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("outdeg")).cast("decimal(27,12)").alias("c"),
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
            .localCheckpoint(storageLevel=_CKPT_LEVEL)
        )
        t[f"iter{i}_join_agg_ckpt"] = time.monotonic() - t0
    t0 = time.monotonic()
    pr.select("node", F.round("pr", 6).alias("pagerank")).write.format(
        "noop"
    ).mode("overwrite").save()
    t["final_noop"] = time.monotonic() - t0
    t["n_nodes"] = n
    return t


def time_query(spark, sf_dir, name):
    from tfl_realtime_lakehouse_spark.queries import REGISTRY

    t0 = time.monotonic()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf5"
    spark = get_spark(app_name="graph-profile-r7")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf": sf_dir, "load_before": list(os.getloadavg())}
    # warm the scan cache once
    _ = edges_df(spark, sf_dir).count()
    out["pagerank_phases"] = {
        k: (round(v, 2) if isinstance(v, float) else v)
        for k, v in profile_pagerank(spark, sf_dir).items()
    }
    for q in ("graph_pagerank", "graph_label_propagation", "graph_bfs_khop"):
        out[q] = round(time_query(spark, sf_dir, q), 2)
    out["load_after"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
