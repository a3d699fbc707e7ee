"""Dup-pair recall evaluator C3 (SURVEY §2.6).

recall = |pred_dup_pairs ∩ truth_dup_pairs| / |truth_dup_pairs|, where a
clustering's dup-pairs are all unordered within-cluster pairs. Computed
distributed: pairs materialize via a self-join on cluster_id (safe because
cluster sizes are bounded in practice; the evaluator is a test/report tool,
not a hot-path stage), misses via left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["repo", "path", "commit"]


def cluster_pairs(clusters: DataFrame, cluster_col: str = "cluster_id",
                  id_col: str = "file_id") -> DataFrame:
    """Within-cluster unordered pairs DF[a, b] with a < b."""
    left = clusters.select(F.col(cluster_col).alias("c"),
                           F.col(id_col).alias("a"))
    right = clusters.select(F.col(cluster_col).alias("c"),
                            F.col(id_col).alias("b"))
    return (left.join(right, on="c")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct())


def dup_pair_recall(pred: DataFrame, truth: DataFrame,
                    cluster_col: str = "cluster_id",
                    id_col: str = "file_id") -> dict:
    """Both inputs: DF[id_col, cluster_col] over the same id universe.
    Returns {'recall', 'n_truth_pairs', 'n_hit_pairs', 'n_pred_pairs'}."""
    tp = cluster_pairs(truth, cluster_col, id_col)
    pp = cluster_pairs(pred, cluster_col, id_col)
    n_truth = tp.count()
    n_pred = pp.count()
    n_miss = tp.join(pp, on=["a", "b"], how="left_anti").count()
    hit = n_truth - n_miss
    return {
        "recall": (hit / n_truth) if n_truth else 1.0,
        "n_truth_pairs": n_truth,
        "n_hit_pairs": hit,
        "n_pred_pairs": n_pred,
    }
