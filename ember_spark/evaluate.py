"""Evaluation: positive-class pairwise precision / recall / F1.

Reproduces the reference's judge metric (`src/models/matcher.py:14-24`:
torchmetrics F1/P/R with ignore_index=0, i.e. computed on the
label-1 "matched" class only) as a single aggregation, plus the
scenario-grid evaluation loop (`scripts/test_ali.py:41-55`: score every
labeled test split with a frozen model, one metrics row per split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def featurize_pairs(labeled_pairs: DataFrame, embedding_dim: int = 64) -> DataFrame:
    """Ember-shaped labeled pair table (url/text/lang _left/_right +
    label) -> the matcher's feature columns. The same featurization
    `ERPipeline.fit_matcher` trains on — evaluation through this path
    sees the training feature distribution exactly."""
    from ember_spark.functions.hashing import make_hash_embedding_udf
    from ember_spark.functions.tokenize import tokenize_auto
    from ember_spark.operators.scoring import pair_features

    emb = make_hash_embedding_udf(embedding_dim)
    sides = (
        labeled_pairs.select(
            F.col("text_left").alias("text_l"),
            F.col("text_right").alias("text_r"),
            F.col("lang_left").alias("lang_l"),
            F.col("lang_right").alias("lang_r"),
            "label",
        )
        .withColumn("tokens_l", tokenize_auto(F.col("text_l"), F.col("lang_l")))
        .withColumn("tokens_r", tokenize_auto(F.col("text_r"), F.col("lang_r")))
        .withColumn("emb_l", emb(F.col("tokens_l")))
        .withColumn("emb_r", emb(F.col("tokens_r")))
    )
    return pair_features(sides)


def evaluate_splits(
    matcher,
    splits: dict[str, DataFrame],
    embedding_dim: int = 64,
) -> dict[str, dict]:
    """The reference's test grid (`test_ali.py`): score every labeled
    split with ONE frozen matcher and return per-split positive-class
    metrics — {split: {precision, recall, f1, tp, fp, fn}}. Feed it
    `build_benchmark_suite(...)`'s output to reproduce the reference's
    full evaluation table (train/val/test, RL/CFM/OM, imbalanced)."""
    return {
        name: pairwise_prf(matcher.predict(featurize_pairs(df, embedding_dim)))
        for name, df in splits.items()
    }


def pairwise_prf(pred_pairs: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> dict:
    """P/R/F1 of the positive class over a scored labeled pair table.

    A NULL prediction (null text -> null features -> null score) counts
    as not-matched: a label-1 pair with a null prediction is a FALSE
    NEGATIVE. The raw `pred == 0` predicate evaluated null on such
    rows, silently dropping them from every bucket and overstating
    recall/F1 with no warning."""
    pred = F.coalesce(F.col(pred_col), F.lit(0))
    row = pred_pairs.select(
        F.sum(((pred == 1) & (F.col(label_col) == 1)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (F.col(label_col) == 0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (F.col(label_col) == 1)).cast("long")).alias("fn"),
    ).first()
    tp, fp, fn = int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


def cluster_pairwise_prf(
    entities: DataFrame,
    labeled_pairs: DataFrame,
    id_col: str = "id",
    entity_col: str = "component",
    left_col: str = "id_l",
    right_col: str = "id_r",
    label_col: str = "label",
) -> dict:
    """Judge a clustering against labeled pairs: a pair is predicted
    matched iff both ids landed in the same predicted entity.

    Ids absent from `entities` (singletons the pipeline never paired)
    count as their own entity — an unmatched prediction.
    """
    e_l = entities.select(
        F.col(id_col).alias(left_col), F.col(entity_col).alias("ent_l")
    )
    e_r = entities.select(
        F.col(id_col).alias(right_col), F.col(entity_col).alias("ent_r")
    )
    joined = (
        labeled_pairs.join(e_l, left_col, "left")
        .join(e_r, right_col, "left")
        .withColumn(
            "prediction",
            (
                F.col("ent_l").isNotNull()
                & F.col("ent_r").isNotNull()
                & (F.col("ent_l") == F.col("ent_r"))
            ).cast("int"),
        )
    )
    return pairwise_prf(joined, label_col=label_col)
