"""t4 — pairwise-F1 evaluation against gold clusters (SURVEY.md §5.2).

Reference analog: strong-annotation-match micro-P/R/F1 in ``metrics.py``
[R/P]. The north_rule's re-expression: pairwise F1 over labeled pairs at
the SHARED blocking key — predicted-same = same engine cluster_id,
gold-same = same gold entity, evaluated only on pairs the frozen blocking
key generates (the metric is conditioned on the key by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def labeled_pairs_from_gold(
    pairs: DataFrame, gold_mentions: DataFrame
) -> DataFrame:
    """pairs(mention_a, mention_b, block_key) × gold(mention_id,
    entity_gold) -> LABELED_PAIRS with same_entity."""
    ga = gold_mentions.select(
        F.col("mention_id").alias("mention_a"),
        F.col("entity_gold").alias("_ea"),
    )
    gb = gold_mentions.select(
        F.col("mention_id").alias("mention_b"),
        F.col("entity_gold").alias("_eb"),
    )
    return (
        pairs.join(ga, "mention_a")
        .join(gb, "mention_b")
        .withColumn("same_entity", F.col("_ea") == F.col("_eb"))
        .select("mention_a", "mention_b", "block_key", "same_entity")
    )


def _confusion(labeled: DataFrame, clusters: DataFrame) -> DataFrame:
    """labeled pairs x cluster assignments -> per-pair pred_same flags."""
    ca = clusters.select(
        F.col("mention_id").alias("mention_a"), F.col("cluster_id").alias("_ca")
    )
    cb = clusters.select(
        F.col("mention_id").alias("mention_b"), F.col("cluster_id").alias("_cb")
    )
    return (
        labeled.join(ca, "mention_a")
        .join(cb, "mention_b")
        .withColumn("pred_same", F.col("_ca") == F.col("_cb"))
    )


def pairwise_f1_df(labeled: DataFrame, clusters: DataFrame) -> DataFrame:
    """Single-row benchmark-score DataFrame (tp, fp, fn, n_pairs,
    pair_precision, pair_recall, pair_f1) — the EP3 eval surface as a
    relational plan (oracle-expressible; see benchmark_conll_eval).
    Ratios use floor-half-up rounding to 6 digits so the value hash is
    engine-portable."""
    j = _confusion(labeled, clusters)
    agg = j.agg(
        F.sum(F.when(F.col("pred_same") & F.col("same_entity"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("pred_same") & ~F.col("same_entity"), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~F.col("pred_same") & F.col("same_entity"), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.count("*").alias("n_pairs"),
    )
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(1.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fp"))
    )
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(1.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fn"))
    )
    f1 = F.when(prec + rec == 0, F.lit(0.0)).otherwise(
        2 * prec * rec / (prec + rec)
    )
    rnd = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        "tp",
        "fp",
        "fn",
        "n_pairs",
        rnd(prec).alias("pair_precision"),
        rnd(rec).alias("pair_recall"),
        rnd(f1).alias("pair_f1"),
    )


def pairwise_f1(labeled: DataFrame, clusters: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of cluster assignments on labeled pairs."""
    j = _confusion(labeled, clusters)
    agg = j.agg(
        F.sum(F.when(F.col("pred_same") & F.col("same_entity"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred_same") & ~F.col("same_entity"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred_same") & F.col("same_entity"), 1).otherwise(0)).alias("fn"),
        F.count("*").alias("n_pairs"),
    ).collect()[0]
    tp, fp, fn = int(agg["tp"]), int(agg["fp"]), int(agg["fn"])
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_pairs": int(agg["n_pairs"]),
    }
