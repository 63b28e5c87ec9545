"""Grid-bucketed spatial operators: ε-neighborhood self-join in 2D.

The all-pairs distance join is O(n²); the standard distributed fix
(the grid / cell partitioning of DBSCAN-MR and every spatial engine)
buckets points into ε-sized cells and equi-joins each point's 3×3
cell neighborhood — any pair within ε straddles at most one cell
boundary per axis, so the neighborhood join finds every qualifying
pair exactly once and the shuffle is keyed by cell id, not by a
cross product.

Scale shape: one side replicates ×9 (map-side, before the exchange);
the join is a plain equi-join on (cell_x, cell_y) so AQE's skew
splitting applies to dense cells; output size is bounded by the true
neighbor count, never by n². Cost is data-density-, not
corpus-size-, quadratic: a cell holding k points contributes O(k·k̄)
candidate work, the same guarantee the LSH/pigeonhole families give
elsewhere in the engine.

Determinism: cell ids are FLOOR(x/ε) over doubles (identical IEEE in
both engines, but invisible in the output anyway); emitted distances
are a fixed double expression tree (widen-then-subtract) rounded at
6 dp, so a brute-force cross-join oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_eps_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
) -> DataFrame:
    """All pairs (a, b) with a.id < b.id and euclidean distance ≤ ε,
    via ε-grid cell bucketing + 3×3 neighbor equi-join. Returns
    (id_a, id_b, dist) with dist rounded to 6 dp."""
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
        F.floor(F.col(x_col).cast("double") / eps).alias("cx"),
        F.floor(F.col(y_col).cast("double") / eps).alias("cy"),
    )
    # left side replicated to its 9-cell neighborhood (map-side explode
    # BEFORE the exchange — the only blow-up is the fixed ×9)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("pid").alias("id_a"),
        F.col("px").alias("xa"),
        F.col("py").alias("ya"),
        F.explode(offsets).alias("o"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = pts.select(
        F.col("pid").alias("id_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        left.join(right, ["jx", "jy"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(d2 <= F.lit(eps) * F.lit(eps))
        .select("id_a", "id_b", F.round(F.sqrt(d2), 6).alias("dist"))
    )
