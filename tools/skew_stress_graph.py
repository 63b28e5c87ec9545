"""Adversarial skew stress for the graph family (r3 verdict ask #7).

Builds a hub-heavy graph — the shape where a naive neighbor-list
self-join explodes — and measures `operators.graph.triangle_count`'s
degree-ordered orientation (the Suri-Vassilvitskii O(sqrt m) wedge cap)
against the SAME algorithm with the guard disabled (id-ordered
orientation, hubs given the lowest ids so their full adjacency goes
through the wedge join). Both variants must return identical triangle
totals; only the plan differs. Prints ONE JSON line; the committed
numbers live in SCALE.md ("Round-4: the skew-stress measurement").

Corpus (deterministic, hash-seeded, no RNG state):
  - 50_000 nodes; 3 hub nodes with ids 0,1,2
  - each hub connects to ~10_000 spoke nodes (celebrity shape)
  - 150_000 hash-random background edges (avg degree ~6)
  - hubs interconnected (hub-hub triangles exist)

Usage: python tools/skew_stress_graph.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.operators.graph import triangle_count
from tfl_realtime_lakehouse_spark.session import get_spark

N_NODES = 50_000
HUBS = 3
HUB_DEG = 10_000
BG_EDGES = 150_000


def build_corpus(spark) -> DataFrame:
    # hub h -> spokes xxhash-derived, distinct mod-classes per hub
    spokes = (
        spark.range(HUBS * HUB_DEG)
        .select(
            (F.col("id") % HUBS).alias("src"),
            (
                F.abs(F.xxhash64(F.col("id"), F.lit("spoke"))) % (N_NODES - HUBS)
                + HUBS
            ).alias("dst"),
        )
    )
    hub_hub = spark.createDataFrame(
        [(a, b) for a in range(HUBS) for b in range(a + 1, HUBS)], "src long, dst long"
    )
    bg = (
        spark.range(BG_EDGES)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit("u"))) % N_NODES).alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit("v"))) % N_NODES).alias("dst"),
        )
    )
    return spokes.unionAll(hub_hub).unionAll(bg).where(F.col("src") != F.col("dst"))


def triangle_count_unguarded(edges: DataFrame) -> DataFrame:
    """The SAME wedge algorithm with the degree cap removed: orient by
    id only (lo id -> hi id). On a hub with low id and degree k, the
    wedge self-join enumerates C(k, 2) pairs — the blowup the
    degree-ordering guard exists to prevent. Measurement harness only;
    never exported."""
    e = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    o1 = e.select(F.col("a").alias("u"), F.col("b").alias("x"))
    o2 = e.select(F.col("a").alias("u"), F.col("b").alias("y"))
    wedges = o1.join(o2, "u").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"]
    )
    tri = (
        closed.select(F.col("u").alias("node"))
        .unionAll(closed.select(F.col("x").alias("node")))
        .unionAll(closed.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    return tri


def oriented_wedge_total(edges: DataFrame, by_degree: bool) -> int:
    """Σ C(outdeg, 2) under the chosen orientation — the wedge-join row
    count each plan must materialize."""
    e = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if by_degree:
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        da = deg.select(F.col("n").alias("a"), F.col("deg").alias("dega"))
        db = deg.select(F.col("n").alias("b"), F.col("deg").alias("degb"))
        ed = e.join(da, "a").join(db, "b")
        lo_first = (F.col("dega") < F.col("degb")) | (
            (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
        )
        out = ed.select(F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"))
    else:
        out = e.select(F.col("a").alias("u"))
    row = (
        out.groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]
    )
    return int(row["w"])


def main() -> int:
    spark = get_spark()
    edges = build_corpus(spark).localCheckpoint()
    n_edges = edges.count()

    t0 = time.time()
    guarded = triangle_count(edges)
    total_guarded = guarded.agg(F.sum("triangles")).collect()[0][0]
    t_guarded = time.time() - t0

    t0 = time.time()
    unguarded = triangle_count_unguarded(edges)
    total_unguarded = unguarded.agg(F.sum("triangles")).collect()[0][0]
    t_unguarded = time.time() - t0

    assert total_guarded == total_unguarded, (
        f"correctness: {total_guarded} != {total_unguarded}"
    )
    out = {
        "corpus": {
            "nodes": N_NODES,
            "edges": n_edges,
            "hubs": HUBS,
            "hub_degree": HUB_DEG,
        },
        "triangle_total_x3": int(total_guarded),
        "degree_ordered_s": round(t_guarded, 2),
        "id_ordered_s": round(t_unguarded, 2),
        "speedup": round(t_unguarded / t_guarded, 1),
        "wedges_degree_ordered": oriented_wedge_total(edges, by_degree=True),
        "wedges_id_ordered": oriented_wedge_total(edges, by_degree=False),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
