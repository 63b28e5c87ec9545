"""Round-7 probe #2: checkpoint-cadence variants for the fixed-3-round
graph family at sf5. Variants (same arithmetic, same results — only the
lineage-cut policy changes):

  A eager-per-round   (current code: eager localCheckpoint each round)
  B lazy-per-round    (localCheckpoint(eager=False) each round)
  C fused             (NO per-round cuts; base relations stay cut)

Each variant runs `trials` times warm; prints per-variant times and a
result hash so equality is visible in the artifact.

    python tools/profile_graph_variants_r7.py .scaledata/sf5 2
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


def pagerank_variant(spark, sf_dir, cut: str, iters=3, damping=0.85):
    e0 = edges_df(spark, sf_dir).distinct().localCheckpoint(storageLevel=_CKPT)
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(storageLevel=_CKPT)
    )
    n = nodes.count()
    outdeg = e0.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = e0.join(outdeg, "src").localCheckpoint(storageLevel=_CKPT)
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    if cut == "eager":
        pr = pr.localCheckpoint(storageLevel=_CKPT)
    base = (1 - damping) / n
    for i in range(iters):
        sums = (
            e.join(pr, e["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("outdeg")).cast("decimal(27,12)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("pr"),
        )
        if cut == "eager":
            pr = pr.localCheckpoint(storageLevel=_CKPT)
        elif cut == "lazy":
            pr = pr.localCheckpoint(eager=False, storageLevel=_CKPT)
        # cut == "fused": no per-round cut
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


def run(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf5"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="graph-variants-r7")
    spark.sparkContext.setLogLevel("ERROR")
    _ = edges_df(spark, sf_dir).count()  # warm scans
    out = {"sf": sf_dir, "load_before": list(os.getloadavg())}
    hashes = {}
    for cut in ("eager", "lazy", "fused"):
        times = []
        for _ in range(trials):
            times.append(run(pagerank_variant(spark, sf_dir, cut)))
        out[f"pagerank_{cut}"] = times
        df = pagerank_variant(spark, sf_dir, cut)
        hashes[cut] = df.agg(
            F.sum(F.hash("node", "pagerank").cast("bigint")).alias("h")
        ).collect()[0]["h"]
    out["result_hashes"] = hashes
    out["load_after"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
