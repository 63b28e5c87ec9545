"""Model-based document classification for corpus curation: multinomial
Naive Bayes over hashed bag-of-words features.

The quality-filter stage of large pretraining pipelines (CCNet-style
"does this look like the reference corpus?") needs a classifier that
trains in one pass over 100 TB and scores with a bounded model. NB is
the closed-form answer:

- **Training is ONE aggregation**: per-bucket class-conditional counts
  (conditional sums in the same groupBy) + class totals → per-bucket
  log-odds weights. No iterations, no driver-side optimization loop.
- **The model is bounded**: O(buckets) weights regardless of corpus
  size (hashed features — no vocabulary anywhere), so it broadcasts.
- **Scoring is decimal-exact**: per-token log-odds are pure scalars
  (identical on any engine); the per-doc sum is taken in
  DECIMAL(27,12), so scores — and therefore predictions — are
  evaluation-order deterministic and oracle-checkable, unlike any
  float-SUM formulation.

Unseen buckets matter: a bucket absent from training still carries
nonzero evidence under Laplace smoothing (ln((n0_tot+B)/(n1_tot+B))),
applied via coalesce after the weight join — dropping it would bias
held-out scores toward the majority class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.operators.sampling import hash_bucket


def _hashed_tokens(
    docs: DataFrame, text_col: str, id_col: str, buckets: int, extra: list[str]
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        *extra,
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select(id_col, *extra, hash_bucket(F.col("tok"), buckets).alias("b"))


def nb_train(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    weight: Column | str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB: returns (weights, stats).

    weights: (b, w) — per-bucket log-odds ln P(b|1) − ln P(b|0),
    Laplace-smoothed over ``buckets`` cells.
    stats: one row (n1_tot, n0_tot, d1, d0) — token totals per class and
    document counts per class (for the prior and the unseen-bucket
    default). Both are O(buckets)/O(1) — broadcast by construction.

    ``weight`` (optional): integer row multiplicity for CONTRACTED
    training input — one row per distinct (content, label) weighted by
    its copy count. Counts are exact integers either way, so weighted
    training on the contracted corpus equals unweighted training on
    the raw corpus bit-for-bit (pinned by a pytest equivalence).
    """
    w = F.lit(1) if weight is None else F.col(weight) if isinstance(weight, str) else weight
    extra = ["_y", "_m"]
    keyed = docs.withColumn("_y", label).withColumn("_m", w)
    toks = _hashed_tokens(keyed, text_col, id_col, buckets, extra)
    counts = toks.groupBy("b").agg(
        F.sum(F.when(F.col("_y"), F.col("_m")).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("_y"), F.col("_m")).otherwise(0)).alias("n0"),
    )
    stats = counts.agg(
        F.sum("n1").alias("n1_tot"), F.sum("n0").alias("n0_tot")
    ).join(
        keyed.agg(
            F.sum(F.when(F.col("_y"), F.col("_m")).otherwise(0)).alias("d1"),
            F.sum(F.when(~F.col("_y"), F.col("_m")).otherwise(0)).alias("d0"),
        )
    )
    bts = float(buckets)
    weights = counts.join(F.broadcast(stats)).select(
        "b",
        (
            F.log((F.col("n1") + 1.0) / (F.col("n1_tot") + bts))
            - F.log((F.col("n0") + 1.0) / (F.col("n0_tot") + bts))
        ).alias("w"),
    )
    return weights, stats


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """Score documents: (id, score) with score = prior log-odds +
    Σ_token log-odds(bucket). Positive score ⇒ class 1. The token sum is
    DECIMAL-exact; unseen buckets get the smoothed default, not zero."""
    bts = float(buckets)
    toks = _hashed_tokens(docs, text_col, id_col, buckets, [])
    default_w = F.log((F.col("n0_tot") + bts) / (F.col("n1_tot") + bts))
    prior = F.log(F.col("d1").cast("double") / F.col("d0").cast("double"))
    scored = (
        toks.join(F.broadcast(weights), "b", "left")
        .join(F.broadcast(stats))
        .select(
            id_col,
            F.coalesce(F.col("w"), default_w).cast("decimal(27,12)").alias("_w"),
            prior.alias("_prior"),
        )
        .groupBy(id_col)
        .agg(
            (F.first("_prior") + F.sum("_w").cast("double")).alias("score")
        )
    )
    # docs with no tokens at all score prior-only
    return docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("score"), F.lit(None).cast("double")).alias("score"),
    )


def nb_confusion(
    scores: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
) -> DataFrame:
    """(actual, predicted, n) confusion counts; predicted = score > 0."""
    return (
        scores.join(truth, id_col)
        .groupBy(
            F.col(label_col).cast("int").alias("actual"),
            (F.col("score") > 0).cast("int").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
